"""Row-local datetime transformers (ref datetime_transformers.py).

Seasonal extraction (hour/weekday/month) with optional angular encoding and
sin/cos pairs; time differences truncate toward zero to whole units
(reference test ``test_datetime_transformers.py:136-138``: 25h1s -> 25h, 1d).
"""

from __future__ import annotations

import math
from abc import ABC
from enum import Enum
from typing import Literal, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.base.column_specification import (
    ColumnNameOrSpec,
    ColumnType,
    ColumnTypeSelector,
    parse_column_name,
)
from auto_featurs_ray.transformers.base import RowLocalTransformer


class SeasonalTransformer(RowLocalTransformer, ABC):
    _word = ''
    _period = 1
    _one_based = False

    def __init__(self, column: ColumnNameOrSpec, angular: bool = False,
                 gon_transformation: Optional[Literal['sin', 'cos']] = None) -> None:
        if not angular and gon_transformation is not None:
            raise ValueError('gon_transformation can be used only with angular=True')
        self._column = parse_column_name(column)
        self._angular = angular
        self._gon_transformation = gon_transformation

    def input_type(self) -> ColumnTypeSelector:
        return ColumnType.DATETIME.as_selector()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        return ColumnType.ORDINAL if self._gon_transformation is None else ColumnType.NUMERIC

    def _output_name(self) -> str:
        angular = '_angular' if self._angular else ''
        gon = f'_{self._gon_transformation}' if self._gon_transformation is not None else ''
        return f'{self._column}_{self._word}{angular}{gon}'

    def _extract(self, column: pa.ChunkedArray) -> pa.ChunkedArray:
        raise NotImplementedError

    def apply(self, table: pa.Table):
        values = self._extract(table.column(self._column))
        if not self._angular:
            return values
        base = pc.cast(values, pa.float64())
        if self._one_based:
            base = pc.subtract(base, 1.0)
        angles = pc.divide(pc.multiply(base, 2 * math.pi), float(self._period))
        if self._gon_transformation == 'sin':
            return pc.sin(angles)
        if self._gon_transformation == 'cos':
            return pc.cos(angles)
        return angles


class HourOfDayTransformer(SeasonalTransformer):
    _word = 'hour_of_day'
    _period = 24
    _one_based = False

    def _extract(self, column):
        return pc.hour(column)


class DayOfWeekTransformer(SeasonalTransformer):
    _word = 'day_of_week'
    _period = 7
    _one_based = True

    def _extract(self, column):
        # ISO weekday 1..7 (polars dt.weekday)
        return pc.day_of_week(column, count_from_zero=False, week_start=1)


class MonthOfYearTransformer(SeasonalTransformer):
    _word = 'month_of_year'
    _period = 12
    _one_based = True

    def _extract(self, column):
        return pc.month(column)


class DayOfMonthTransformer(SeasonalTransformer):
    """Day of month 1..31 (engine extension to the reference's seasonal trio)."""

    _word = 'day_of_month'
    _period = 31
    _one_based = True

    def _extract(self, column):
        return pc.day(column)


class WeekOfYearTransformer(SeasonalTransformer):
    """ISO week number 1..53 (engine extension)."""

    _word = 'week_of_year'
    _period = 52
    _one_based = True

    def _extract(self, column):
        return pc.iso_week(column)


class QuarterTransformer(SeasonalTransformer):
    """Calendar quarter 1..4 (engine extension)."""

    _word = 'quarter'
    _period = 4
    _one_based = True

    def _extract(self, column):
        return pc.quarter(column)


class IsWeekendTransformer(SeasonalTransformer):
    """1 for Saturday/Sunday, else 0 (engine extension); angular modes are
    meaningless for a binary flag and rejected."""

    _word = 'is_weekend'

    def __init__(self, column: ColumnNameOrSpec, angular: bool = False,
                 gon_transformation: Optional[Literal['sin', 'cos']] = None) -> None:
        if angular or gon_transformation is not None:
            raise ValueError('is_weekend is a binary flag; angular encoding not supported')
        super().__init__(column)

    def _extract(self, column):
        dow = pc.day_of_week(column, count_from_zero=False, week_start=1)
        return pc.cast(pc.greater_equal(dow, 6), pa.int8())


class SeasonalOperation(Enum):
    HOUR_OF_DAY = HourOfDayTransformer
    DAY_OF_WEEK = DayOfWeekTransformer
    MONTH_OF_YEAR = MonthOfYearTransformer
    DAY_OF_MONTH = DayOfMonthTransformer
    WEEK_OF_YEAR = WeekOfYearTransformer
    QUARTER = QuarterTransformer
    IS_WEEKEND = IsWeekendTransformer


_UNIT_US = {'s': 1_000_000, 'h': 3_600_000_000, 'd': 86_400_000_000}
_UNIT_WORD = {'s': 'seconds', 'h': 'hours', 'd': 'days'}


class TimeDiffTransformer(RowLocalTransformer):
    def __init__(self, left_column: ColumnNameOrSpec, right_column: ColumnNameOrSpec,
                 unit: Literal['s', 'h', 'd'] = 'd') -> None:
        self._left_column = parse_column_name(left_column)
        self._right_column = parse_column_name(right_column)
        self._unit = unit

    def input_type(self):
        return (ColumnType.DATETIME.as_selector(), ColumnType.DATETIME.as_selector())

    @classmethod
    def is_commutative(cls) -> bool:
        return False

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._left_column}_total_{_UNIT_WORD[self._unit]}_diff_{self._right_column}'

    def apply(self, table: pa.Table):
        left = table.column(self._left_column).cast(pa.timestamp('us')).cast(pa.int64())
        right = table.column(self._right_column).cast(pa.timestamp('us')).cast(pa.int64())
        diff_us = pc.subtract(left, right).to_numpy(zero_copy_only=False)
        # truncate toward zero, like polars duration .total_hours() etc.
        out = np.trunc(diff_us / _UNIT_US[self._unit]).astype(np.float64)
        return pa.array(out, type=pa.float64())
