"""AggFrame: a sorted partition exposed to segmented aggregation kernels.

One ``AggFrame`` wraps the zero-copy Arrow table of a single hash partition
after the runtime has sorted it by ``(partition_keys, order_by)``.  Kernels
pull cached pandas/NumPy views of just the columns they touch; heavy payload
columns (e.g. ``tokens: list<int32>``) are never converted — they ride along
in the Arrow table untouched, which is what guarantees byte-equality of token
arrays through the engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.expressions import Expr


class AggFrame:
    def __init__(self, table: pa.Table) -> None:
        self.table = table
        self._series_cache: dict = {}
        self._cond_cache: dict = {}
        self._codes_cache: dict = {}
        self._ts_cache: dict = {}
        self._numeric_cache: dict = {}

    @property
    def num_rows(self) -> int:
        return self.table.num_rows

    def series(self, name: str) -> pd.Series:
        """Cached pandas view of one column (ints with nulls become float64)."""
        cached = self._series_cache.get(name)
        if cached is None:
            cached = self.table.column(name).to_pandas()
            cached.reset_index(drop=True, inplace=True)
            self._series_cache[name] = cached
        return cached

    def numeric(self, name: str) -> np.ndarray:
        """Float64 view with nulls as NaN (bool -> 0/1)."""
        cached = self._numeric_cache.get(name)
        if cached is None:
            arr = self.table.column(name)
            if pa.types.is_boolean(arr.type) or not pa.types.is_floating(arr.type):
                arr = arr.cast(pa.float64())
            cached = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            self._numeric_cache[name] = cached
        return cached

    def timestamps_us(self, name: str) -> np.ndarray:
        """Int64 microseconds view of a timestamp column."""
        cached = self._ts_cache.get(name)
        if cached is None:
            arr = self.table.column(name)
            if pa.types.is_timestamp(arr.type):
                arr = arr.cast(pa.timestamp('us', tz=arr.type.tz))
            cached = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            self._ts_cache[name] = cached
        return cached

    def cond_mask(self, condition: Optional[Expr]) -> Optional[np.ndarray]:
        """Boolean mask for a filtering condition; nulls count as False.

        Returns ``None`` when there is no (non-trivial) condition.
        """
        if condition is None or condition.is_true_literal:
            return None
        key = id(condition)
        cached = self._cond_cache.get(key)
        if cached is None:
            values = condition.evaluate(self.table)
            if not pa.types.is_boolean(values.type):
                raise TypeError(f'Filtering condition must be boolean, got {values.type}')
            cached = pc.fill_null(values, False).to_numpy(zero_copy_only=False).astype(bool)
            self._cond_cache[key] = cached
        return cached

    def slice(self, lo: int, hi: int) -> 'AggFrame':
        return AggFrame(self.table.slice(lo, hi - lo))

    def group_codes(self, columns: Sequence[str], base: Optional[np.ndarray] = None) -> np.ndarray:
        """Dense group codes for ``columns`` (optionally nested under ``base``).

        Null keys form their own group, matching polars ``.over`` semantics.
        """
        # only the base-less case is cached: a base array's id could be recycled
        cacheable = base is None
        if cacheable:
            cached = self._codes_cache.get(tuple(columns))
            if cached is not None:
                return cached
        frame = {f'k{i}': self.series(c) for i, c in enumerate(columns)}
        if base is not None:
            frame['__base'] = base
        df = pd.DataFrame(frame)
        codes = df.groupby(list(frame), sort=False, dropna=False).ngroup().to_numpy()
        if cacheable:
            self._codes_cache[tuple(columns)] = codes
        return codes


def group_index_lists(codes: np.ndarray):
    """Yield per-group row-index arrays, preserving within-group row order.

    Works for arbitrary (not necessarily contiguous) code layouts — needed when
    a grouped kernel runs over a rolling-window slice.
    """
    order = np.argsort(codes, kind='stable')
    sorted_codes = codes[order]
    bounds = contiguous_segments(sorted_codes, len(codes))
    for s, e in zip(bounds[:-1], bounds[1:]):
        yield order[s:e]


def contiguous_segments(codes: Optional[np.ndarray], n: int) -> np.ndarray:
    """Start offsets of each contiguous code run, plus terminal ``n``.

    The runtime sorts partitions by the grouping keys, so each group is one
    contiguous run; this returns ``[s0, s1, ..., n]``.
    """
    if codes is None or len(codes) == 0:
        return np.array([0, n], dtype=np.int64)
    changes = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    return np.concatenate(([0], changes, [n])).astype(np.int64)
