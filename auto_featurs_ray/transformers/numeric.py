"""Row-local numeric transformers as Arrow batch kernels.

Semantics mirror the reference's polars expressions
(``/root/reference/src/auto_featurs/transformers/numeric_transformers.py``):
``log(0) = -inf``; bool arithmetic coerces to int; division is float division
with ``0/0 = NaN`` and ``x/0 = ±inf`` (never an error).
"""

from __future__ import annotations

import math
from abc import ABC
from enum import Enum

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


def _as_float(column: pa.ChunkedArray) -> np.ndarray:
    return column.cast(pa.float64()).to_numpy(zero_copy_only=False)


def _numeric_column(table: pa.Table, name: str) -> pa.ChunkedArray:
    column = table.column(name)
    if pa.types.is_boolean(column.type):
        column = column.cast(pa.int8())
    return column


class NumericTransformer(RowLocalTransformer, ABC):
    def __init__(self, column: ColumnNameOrSpec) -> None:
        self._column = parse_column_name(column)

    def input_type(self) -> ColumnTypeSelector:
        return ColumnType.NUMERIC.as_selector()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC


class PolynomialTransformer(NumericTransformer):
    def __init__(self, column: ColumnNameOrSpec, *, degree: int) -> None:
        super().__init__(column)
        self._degree = degree

    def _output_name(self) -> str:
        return f'{self._column}_pow_{self._degree}'

    def apply(self, table: pa.Table):
        return pc.power(table.column(self._column), self._degree)


class LogTransformer(NumericTransformer):
    def __init__(self, column: ColumnNameOrSpec, *, base: float = math.e) -> None:
        super().__init__(column)
        self._base = base

    def _output_name(self) -> str:
        suffix = '_ln' if self._base == math.e else f'_log{self._base}'
        return f'{self._column}{suffix}'

    def apply(self, table: pa.Table):
        x = _as_float(table.column(self._column))
        with np.errstate(divide='ignore', invalid='ignore'):
            out = np.log(x) if self._base == math.e else np.log(x) / math.log(self._base)
        return pa.array(out, type=pa.float64())


class SinTransformer(NumericTransformer):
    def _output_name(self) -> str:
        return f'{self._column}_sin'

    def apply(self, table: pa.Table):
        return pc.sin(pc.cast(table.column(self._column), pa.float64()))


class CosTransformer(NumericTransformer):
    def _output_name(self) -> str:
        return f'{self._column}_cos'

    def apply(self, table: pa.Table):
        return pc.cos(pc.cast(table.column(self._column), pa.float64()))


class Goniometric(Enum):
    SIN = SinTransformer
    COS = CosTransformer


class ArithmeticTransformer(RowLocalTransformer, ABC):
    def __init__(self, left_column: ColumnNameOrSpec, right_column: ColumnNameOrSpec) -> None:
        self._left_column = parse_column_name(left_column)
        self._right_column = parse_column_name(right_column)

    def input_type(self):
        both = ColumnTypeSelector(frozenset((ColumnType.NUMERIC, ColumnType.BOOLEAN)))
        return (both, both)

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _operands(self, table: pa.Table):
        return (_numeric_column(table, self._left_column), _numeric_column(table, self._right_column))


class AddTransformer(ArithmeticTransformer):
    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _output_name(self) -> str:
        return f'{self._left_column}_add_{self._right_column}'

    def apply(self, table: pa.Table):
        left, right = self._operands(table)
        return pc.add(left, right)


class SubtractTransformer(ArithmeticTransformer):
    @classmethod
    def is_commutative(cls) -> bool:
        return False

    def _output_name(self) -> str:
        return f'{self._left_column}_subtract_{self._right_column}'

    def apply(self, table: pa.Table):
        left, right = self._operands(table)
        return pc.subtract(left, right)


class MultiplyTransformer(ArithmeticTransformer):
    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _output_name(self) -> str:
        return f'{self._left_column}_multiply_{self._right_column}'

    def apply(self, table: pa.Table):
        left, right = self._operands(table)
        return pc.multiply(left, right)


class DivideTransformer(ArithmeticTransformer):
    @classmethod
    def is_commutative(cls) -> bool:
        return False

    def _output_name(self) -> str:
        return f'{self._left_column}_divide_{self._right_column}'

    def apply(self, table: pa.Table):
        left, right = self._operands(table)
        with np.errstate(divide='ignore', invalid='ignore'):
            out = _as_float(left) / _as_float(right)
        return pa.array(out, type=pa.float64())


class ArithmeticOperation(Enum):
    ADD = AddTransformer
    SUBTRACT = SubtractTransformer
    MULTIPLY = MultiplyTransformer
    DIVIDE = DivideTransformer


class ExpressionTransformer(RowLocalTransformer):
    """First-class expression column (engine extension): evaluates an
    aliased :class:`~auto_featurs_ray.expressions.Expr` combinator tree as a
    vectorized row-local kernel, fused into the layer's single
    ``map_batches`` stage like every other row-local — the
    ``with_columns``-style derived-column surface.

    The output column type cannot be inferred before execution, so the
    caller declares it (NUMERIC default; pass BOOLEAN for comparisons)."""

    def __init__(self, expression, column_type: ColumnType = ColumnType.NUMERIC) -> None:
        from auto_featurs_ray.expressions import Expr
        if not isinstance(expression, Expr):
            raise TypeError(f'expected an Expr, got {type(expression).__name__}')
        self._expression = expression
        self._column_type = column_type
        self._expression.output_name  # raises if un-aliased

    def input_type(self):
        return ()  # expression-driven: no declared column subset

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        return self._column_type

    def _output_name(self) -> str:
        return self._expression.output_name

    def apply(self, table):
        return self._expression.evaluate(table)
