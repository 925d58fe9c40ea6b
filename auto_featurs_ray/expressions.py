"""Vectorized row-local expressions over Arrow batches.

The reference engine uses ``polars.Expr`` objects for filtering conditions
(e.g. ``pl.col('X').ge(2).alias('X_GE_2')``).  This engine replaces them with a
small, self-contained expression tree whose nodes evaluate against a
``pyarrow.Table`` batch with ``pyarrow.compute`` kernels — zero-copy and
vectorized, suitable for use inside ``Dataset.map_batches``.

Naming mirrors polars' output-name semantics (the leftmost column name
propagates; ``alias`` overrides), because condition output names become part of
generated feature-column names (``..._where_{name}``) — see
``/root/reference/src/auto_featurs/utils/utils.py:29-32``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import pyarrow as pa
import pyarrow.compute as pc


def _as_expr(value: Any) -> 'Expr':
    return value if isinstance(value, Expr) else lit(value)


class Expr:
    """A compiled batch kernel ``pa.Table -> pa.Array`` with an output name."""

    def __init__(self, fn: Callable[[pa.Table], Any], output_name: Optional[str],
                 *, is_true_literal: bool = False) -> None:
        self._fn = fn
        self._output_name = output_name
        self.is_true_literal = is_true_literal

    # -- evaluation ---------------------------------------------------------
    def evaluate(self, table: pa.Table) -> pa.ChunkedArray:
        result = self._fn(table)
        if isinstance(result, (pa.Array, pa.ChunkedArray)):
            return result
        # scalar literal -> broadcast
        return pa.chunked_array([pa.array([result] * table.num_rows)])

    @property
    def output_name(self) -> str:
        if self._output_name is None:
            raise ValueError('Expression has no output name; use .alias(...)')
        return self._output_name

    def alias(self, name: str) -> 'Expr':
        return Expr(self._fn, name, is_true_literal=self.is_true_literal)

    # -- combinators --------------------------------------------------------
    def _binary(self, other: Any, kernel, name_from_self: bool = True) -> 'Expr':
        other = _as_expr(other)

        def fn(table: pa.Table, s=self, o=other, k=kernel):
            return k(s._fn(table), o._fn(table))

        name = self._output_name if self._output_name is not None else other._output_name
        return Expr(fn, name)

    def __ge__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.greater_equal)

    def __gt__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.greater)

    def __le__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.less_equal)

    def __lt__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.less)

    def __eq__(self, other: Any) -> 'Expr':  # type: ignore[override]
        return self._binary(other, pc.equal)

    def __ne__(self, other: Any) -> 'Expr':  # type: ignore[override]
        return self._binary(other, pc.not_equal)

    def __and__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.and_kleene)

    def __or__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.or_kleene)

    def __invert__(self) -> 'Expr':
        return Expr(lambda t, s=self: pc.invert(s._fn(t)), self._output_name)

    def __add__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.add)

    def __sub__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.subtract)

    def __mul__(self, other: Any) -> 'Expr':
        return self._binary(other, pc.multiply)

    def is_null(self) -> 'Expr':
        return Expr(lambda t, s=self: pc.is_null(s._fn(t)), self._output_name)

    def is_not_null(self) -> 'Expr':
        return Expr(lambda t, s=self: pc.is_valid(s._fn(t)), self._output_name)

    def is_in(self, values) -> 'Expr':
        vs = pa.array(list(values))
        return Expr(lambda t, s=self, v=vs: pc.is_in(s._fn(t), value_set=v), self._output_name)

    # polars-style method aliases used in reference tests
    def ge(self, other: Any) -> 'Expr':
        return self.__ge__(other)

    def gt(self, other: Any) -> 'Expr':
        return self.__gt__(other)

    def le(self, other: Any) -> 'Expr':
        return self.__le__(other)

    def lt(self, other: Any) -> 'Expr':
        return self.__lt__(other)

    def eq(self, other: Any) -> 'Expr':
        return self.__eq__(other)


def col(name: str) -> Expr:
    return Expr(lambda t, n=name: t.column(n), name)


def lit(value: Any) -> Expr:
    return Expr(lambda t, v=value: v, None, is_true_literal=value is True)


LIT_TRUE = lit(True)


def default_true_filtering_condition(condition: Optional[Expr]) -> Expr:
    return condition if condition is not None else LIT_TRUE


def filtering_condition_to_string(condition: Optional[Expr]) -> str:
    """Naming suffix for filtered aggregates (reference utils.py:29-32)."""
    if condition is None or condition.is_true_literal:
        return ''
    return f'_where_{condition.output_name}'
