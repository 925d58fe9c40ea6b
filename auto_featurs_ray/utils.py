"""Shared helpers: naming, deduplication, timedelta parsing/formatting."""

from __future__ import annotations

import re
from datetime import timedelta
from typing import Iterable, Optional, Sequence, TypeVar

SECONDS_IN_MINUTE = 60
SECONDS_IN_HOUR = 3600
SECONDS_IN_DAY = 86400
SECONDS_IN_MONTH = 30 * SECONDS_IN_DAY
SECONDS_IN_YEAR = 365 * SECONDS_IN_DAY

INFINITY = float('inf')

T = TypeVar('T')


def order_preserving_unique(iterable: Iterable[T]) -> list:
    seen = set()
    out = []
    for item in iterable:
        if item not in seen:
            seen.add(item)
            out.append(item)
    return out


def get_valid_param_options(options: Sequence) -> tuple:
    """Split a param grid into its truthy options; report whether all were truthy.

    A falsy entry (``None``, ``[]``) in e.g. ``time_windows=[None, '2d']`` means
    "also generate the un-wrapped variant" (reference utils.py:49-52).
    """
    valid = [o for o in options if o]
    return valid, len(valid) == len(options)


def format_timedelta(td: timedelta) -> str:
    """Render a timedelta as a polars-style duration string, e.g. ``2d1h``.

    Matches reference utils.py:55-79 (calendar-free: 30-day months, 365-day years).
    """
    total = int(td.total_seconds())
    parts = []
    for label, size in (('y', SECONDS_IN_YEAR), ('mo', SECONDS_IN_MONTH), ('d', SECONDS_IN_DAY),
                        ('h', SECONDS_IN_HOUR), ('m', SECONDS_IN_MINUTE), ('s', 1)):
        amount, total = divmod(total, size)
        if amount:
            parts.append(f'{amount}{label}')
    return ''.join(parts) or '0s'


_DURATION_TOKEN = re.compile(r'(\d+)(mo|us|ms|ns|y|w|d|h|m|s)')

_DURATION_US = {
    'y': SECONDS_IN_YEAR * 1_000_000,
    'mo': SECONDS_IN_MONTH * 1_000_000,
    'w': 7 * SECONDS_IN_DAY * 1_000_000,
    'd': SECONDS_IN_DAY * 1_000_000,
    'h': SECONDS_IN_HOUR * 1_000_000,
    'm': SECONDS_IN_MINUTE * 1_000_000,
    's': 1_000_000,
    'ms': 1_000,
    'us': 1,
    'ns': 0,  # sub-microsecond: truncated (engine time resolution is us)
}


def parse_duration_us(window: 'str | timedelta') -> int:
    """Parse a polars-style duration string (``'2d1h'``) or timedelta to microseconds."""
    if isinstance(window, timedelta):
        return int(window.total_seconds() * 1_000_000)
    consumed = 0
    total_us = 0
    for match in _DURATION_TOKEN.finditer(window):
        if match.start() != consumed:
            raise ValueError(f'Cannot parse duration string: {window!r}')
        consumed = match.end()
        total_us += int(match.group(1)) * _DURATION_US[match.group(2)]
    if consumed != len(window) or consumed == 0:
        raise ValueError(f'Cannot parse duration string: {window!r}')
    return total_us


def window_to_string(window: 'str | timedelta') -> str:
    return format_timedelta(window) if isinstance(window, timedelta) else window
