"""Transformer contract for the Ray-Data-native engine.

The reference's transformer unit produces one ``polars.Expr`` = one output
column (``/root/reference/src/auto_featurs/transformers/base.py:12-42``).  This
engine keeps the same *interface* surface — ``input_type`` /
``is_commutative`` / ``_return_type`` / deterministic output naming — but each
transformer compiles to one of two execution forms instead:

* :class:`RowLocalTransformer` — a vectorized Arrow batch kernel
  ``pa.Table -> pa.Array``.  All row-local kernels of a pipeline layer are
  fused into a single ``Dataset.map_batches(..., batch_format='pyarrow')``
  stage by the planner.
* :class:`AggregatingTransformer` — a segmented kernel evaluated inside the
  partitioned/sorted window runtime (``engine/runtime.py``): the engine
  hash-partitions by the entity key, sorts each partition by
  ``(keys, order_by)`` and calls :meth:`AggregatingTransformer.compute` with
  the whole sorted partition, so expanding/cumulative/lag/rolling features are
  computed without temporal leakage.

Deterministic output-column naming is part of the conformance surface
(reference README.md:609); every subclass reproduces the reference's exact
name format.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from enum import Enum
from functools import cached_property
from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa

from auto_featurs_ray.base.column_specification import (
    ColumnSpecification,
    ColumnType,
    ColumnTypeSelector,
)
from auto_featurs_ray.expressions import Expr


class CumulativeOptions(Enum):
    """Expanding-window mode (reference aggregating_transformers.py:21-27).

    ``EXCLUSIVE`` aggregates strictly preceding rows (the point-in-time-correct
    / zero-leakage mode); ``INCLUSIVE`` includes the current row.
    """

    NONE = 'none'
    EXCLUSIVE = 'exclusive'
    INCLUSIVE = 'inclusive'

    def __str__(self) -> str:
        return f'{self.value}_cum_' if self != CumulativeOptions.NONE else ''


class Transformer(ABC):
    @abstractmethod
    def input_type(self) -> Union[ColumnTypeSelector, tuple]:
        raise NotImplementedError

    @classmethod
    @abstractmethod
    def is_commutative(cls) -> bool:
        raise NotImplementedError

    @abstractmethod
    def _return_type(self) -> ColumnType:
        raise NotImplementedError

    @abstractmethod
    def _output_name(self) -> str:
        raise NotImplementedError

    @property
    def output_name(self) -> str:
        return self._output_name()

    @cached_property
    def output_column_specification(self) -> ColumnSpecification:
        return ColumnSpecification(name=self.output_name, column_type=self._return_type())

    def __repr__(self) -> str:
        return f'{type(self).__name__}({self.output_name!r})'


class RowLocalTransformer(Transformer):
    """1-row -> 1-value kernel; fuses into a single map_batches stage."""

    @abstractmethod
    def apply(self, table: pa.Table) -> Union[pa.Array, pa.ChunkedArray]:
        """Compute the output column for one Arrow batch (vectorized)."""
        raise NotImplementedError


class AggregatingTransformer(Transformer):
    """Segmented kernel over a sorted partition.

    ``compute(frame, codes)`` receives the full sorted partition
    (:class:`~auto_featurs_ray.engine.aggframe.AggFrame`) plus optional
    grouping codes (``None`` = one group spanning the partition) and returns a
    full-length result column.  Wrappers (:class:`OverWrapper`,
    :class:`RollingWrapper`) refine ``codes`` / window bounds and delegate.
    """

    cumulative: CumulativeOptions = CumulativeOptions.NONE
    filtering_condition: Optional[Expr] = None

    @abstractmethod
    def compute(self, frame, codes: Optional[np.ndarray]) -> Union[np.ndarray, pd.Series]:
        raise NotImplementedError

    def compute_windowed(self, frame, lo: np.ndarray, hi: np.ndarray) -> Optional[np.ndarray]:
        """Optional O(n) kernel for trailing time windows ``(t-period, t]``.

        ``lo[i]``/``hi[i]`` delimit row *i*'s window slice in the sorted
        partition.  Return ``None`` to fall back to the generic per-slice
        evaluation in :class:`RollingWrapper`.
        """
        return None

    # -- distributed two-pass protocol (ungrouped NONE-mode aggregates) -----
    # Implemented by broadcastable aggregates so a global scalar can be
    # computed as map_batches partials + driver combine + broadcast, without
    # funnelling the dataset through a single partition.
    supports_global_two_pass: bool = False

    def global_partial(self, table: pa.Table) -> object:
        raise NotImplementedError

    def global_combine(self, left: object, right: object) -> object:
        raise NotImplementedError

    def global_finalize(self, state: object, table: pa.Table) -> Union[pa.Array, np.ndarray]:
        """Produce the output column for one batch given the combined state."""
        raise NotImplementedError
