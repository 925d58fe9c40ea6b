"""Row-local comparison transformers (ref comparison_transformers.py).

String comparisons are lexicographic, matching polars (reference test
``pipeline/tests/test_pipeline.py:358-361``).
"""

from __future__ import annotations

from abc import ABC
from enum import Enum

import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.base.column_specification import (
    ColumnNameOrSpec,
    ColumnType,
    ColumnTypeSelector,
    parse_column_name,
)
from auto_featurs_ray.transformers.base import RowLocalTransformer


class ComparisonTransformer(RowLocalTransformer, ABC):
    _kernel = None
    _word = ''

    def __init__(self, left_column: ColumnNameOrSpec, right_column: ColumnNameOrSpec) -> None:
        self._left_column = parse_column_name(left_column)
        self._right_column = parse_column_name(right_column)

    def input_type(self):
        return (ColumnTypeSelector.any(), ColumnTypeSelector.any())

    def _return_type(self) -> ColumnType:
        return ColumnType.BOOLEAN

    def _output_name(self) -> str:
        return f'{self._left_column}_{self._word}_{self._right_column}'

    def apply(self, table: pa.Table):
        return type(self)._kernel(table.column(self._left_column), table.column(self._right_column))


class EqualTransformer(ComparisonTransformer):
    _kernel = staticmethod(pc.equal)
    _word = 'equal'

    @classmethod
    def is_commutative(cls) -> bool:
        return True


class GreaterThanTransformer(ComparisonTransformer):
    _kernel = staticmethod(pc.greater)
    _word = 'greater_than'

    @classmethod
    def is_commutative(cls) -> bool:
        return False


class GreaterOrEqualTransformer(ComparisonTransformer):
    _kernel = staticmethod(pc.greater_equal)
    _word = 'greater_or_equal'

    @classmethod
    def is_commutative(cls) -> bool:
        return False


class Comparisons(Enum):
    EQUAL = EqualTransformer
    GREATER_THAN = GreaterThanTransformer
    GREATER_OR_EQUAL = GreaterOrEqualTransformer
