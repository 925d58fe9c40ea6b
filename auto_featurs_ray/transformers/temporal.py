"""Temporal feature transformers beyond the reference catalog.

The north rule (BASELINE.json) names sessionization gaps and backfill as
first-class features.  The reference has no literal counterpart; these derive
from its catalog (SURVEY.md §2.7): sessionize = gap flag (time diff vs lag) +
running cum-sum per entity; fill = ordered per-partition forward/backward fill
— both run as segmented kernels on the same sorted-partition runtime, so the
per-entity variants are leakage-free by construction (forward fill and session
ids only look backward; backward fill intentionally looks forward and is
documented as a training-time-only imputation).
"""

from __future__ import annotations

from datetime import timedelta
from enum import Enum
from typing import Optional, Union

import numpy as np
import pandas as pd

from auto_featurs_ray.base.column_specification import (
    ColumnNameOrSpec,
    ColumnSpecification,
    ColumnType,
    ColumnTypeSelector,
    parse_column_name,
)
from auto_featurs_ray.engine.aggframe import AggFrame
from auto_featurs_ray.transformers.aggregating import _codes_or_zeros, _gshift
from auto_featurs_ray.transformers.base import AggregatingTransformer
from auto_featurs_ray.utils import parse_duration_us, window_to_string


class SessionIdTransformer(AggregatingTransformer):
    """Ordinal session id per ordered group: a new session starts when the gap
    since the previous row exceeds ``gap`` (strict >; first row starts session 1).
    """

    def __init__(self, column: ColumnSpecification, gap: Union[str, timedelta]) -> None:
        if column.column_type != ColumnType.DATETIME:
            raise ValueError(f'Sessionization requires a DATETIME column, got {column.column_type} for {column.name}.')
        self._column = column
        self._gap = gap
        self._gap_us = parse_duration_us(gap)

    def input_type(self) -> ColumnTypeSelector:
        return ColumnType.DATETIME.as_selector()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column.name}_session_id_gap_{window_to_string(self._gap)}'

    def compute(self, frame: AggFrame, codes: Optional[np.ndarray]):
        n = frame.num_rows
        codes = _codes_or_zeros(codes, n)
        ts = frame.timestamps_us(self._column.name)
        prev = _gshift(pd.Series(ts), codes, 1).to_numpy()
        gap = ts - prev
        new_session = np.isnan(gap) | (gap > self._gap_us)
        return pd.Series(new_session.astype(np.int64)).groupby(codes).cumsum()


class TimeSinceLastTransformer(AggregatingTransformer):
    """Seconds elapsed since the previous row of the ordered group (null at start)."""

    def __init__(self, column: ColumnSpecification) -> None:
        if column.column_type != ColumnType.DATETIME:
            raise ValueError(f'TimeSinceLast requires a DATETIME column, got {column.column_type} for {column.name}.')
        self._column = column

    def input_type(self) -> ColumnTypeSelector:
        return ColumnType.DATETIME.as_selector()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column.name}_seconds_since_last'

    def compute(self, frame: AggFrame, codes: Optional[np.ndarray]):
        n = frame.num_rows
        codes = _codes_or_zeros(codes, n)
        ts = frame.timestamps_us(self._column.name)
        prev = _gshift(pd.Series(ts), codes, 1).to_numpy()
        return (ts - prev) / 1_000_000.0


class TimeToNextTransformer(AggregatingTransformer):
    """Seconds until the NEXT row of the ordered group (null at the group
    end) — the forward-recency / inactivity-label counterpart of
    TimeSinceLast (engine extension; reads one future row, offline-only)."""

    def __init__(self, column: ColumnSpecification) -> None:
        if column.column_type != ColumnType.DATETIME:
            raise ValueError(f'TimeToNext requires a DATETIME column, got {column.column_type} for {column.name}.')
        self._column = column

    def input_type(self) -> ColumnTypeSelector:
        return ColumnType.DATETIME.as_selector()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column.name}_seconds_to_next'

    def compute(self, frame: AggFrame, codes: Optional[np.ndarray]):
        n = frame.num_rows
        codes = _codes_or_zeros(codes, n)
        ts = frame.timestamps_us(self._column.name)
        nxt = _gshift(pd.Series(ts), codes, -1).to_numpy()
        return (nxt - ts) / 1_000_000.0


class FillStrategy(Enum):
    FORWARD = 'forward'
    BACKWARD = 'backward'
    MEAN = 'mean'
    MEDIAN = 'median'


class FillTransformer(AggregatingTransformer):
    """Forward/backward fill of nulls within the ordered group, or
    group-statistic imputation (MEAN / MEDIAN of the group's valid values —
    engine extension; both read the whole group, so like backward fill they
    are offline-only).

    Forward fill is point-in-time safe (only past values propagate); backward
    fill reads future rows — use it only for offline imputation.
    """

    def __init__(self, column: ColumnSpecification, strategy: FillStrategy = FillStrategy.FORWARD) -> None:
        self._column = column
        self._strategy = strategy

    def input_type(self) -> ColumnTypeSelector:
        if self._strategy in (FillStrategy.MEAN, FillStrategy.MEDIAN):
            return ColumnType.NUMERIC.as_selector()
        return ColumnTypeSelector.any()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        if self._strategy in (FillStrategy.MEAN, FillStrategy.MEDIAN):
            return ColumnType.NUMERIC
        return self._column.column_type

    def _output_name(self) -> str:
        return f'{self._column.name}_{self._strategy.value}_filled'

    def compute(self, frame: AggFrame, codes: Optional[np.ndarray]):
        codes = _codes_or_zeros(codes, frame.num_rows)
        series = frame.series(self._column.name)
        grouped = series.groupby(codes)
        if self._strategy == FillStrategy.FORWARD:
            return grouped.ffill()
        if self._strategy == FillStrategy.BACKWARD:
            return grouped.bfill()
        stat = grouped.transform('mean' if self._strategy == FillStrategy.MEAN
                                 else 'median')
        return series.fillna(stat)
