"""Logical column model: types, roles, specifications and the selector algebra.

Re-creates the user-facing column model of the reference engine
(``/root/reference/src/auto_featurs/base/column_specification.py``) from scratch:
a declared logical schema (NUMERIC/BOOLEAN/NOMINAL/ORDINAL/TEXT/DATETIME x
LABEL/IDENTIFIER/TIME_INFO/FEATURE) plus a composable boolean algebra of column
selectors (``&``, ``|``, ``~``, name predicates).  The logical model is
deliberately decoupled from physical Arrow dtypes; see
:func:`ColumnSpecification.arrow_type` for the derivation used when creating
Arrow schemas for synthesized tables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Callable, Union

import pyarrow as pa


class ColumnType(Enum):
    """Logical (not physical) column types; NUMERIC covers ints and floats."""

    NUMERIC = 'numeric'
    BOOLEAN = 'boolean'
    NOMINAL = 'nominal'
    ORDINAL = 'ordinal'
    TEXT = 'text'
    DATETIME = 'datetime'

    @classmethod
    def ANY(cls) -> set['ColumnType']:  # noqa: N802
        return set(cls)

    def as_selector(self) -> 'ColumnTypeSelector':
        return ColumnTypeSelector(frozenset((self,)))

    def __or__(self, other: object) -> 'ColumnSelector':
        if isinstance(other, ColumnType):
            return ColumnTypeSelector(frozenset((self, other)))
        if isinstance(other, (ColumnRole, ColumnSelector)):
            return self.as_selector() | _as_selector(other)
        raise TypeError(f'Cannot combine {type(other)} with ColumnType')

    def __and__(self, other: object) -> 'ColumnSelector':
        if isinstance(other, (ColumnRole, ColumnSelector)):
            return self.as_selector() & _as_selector(other)
        raise TypeError(f'Cannot combine {type(other)} with ColumnType')

    def __invert__(self) -> 'ColumnSelector':
        return ~self.as_selector()


class ColumnRole(Enum):
    """Semantic role of a column inside a pipeline."""

    LABEL = auto()
    IDENTIFIER = auto()
    TIME_INFO = auto()
    FEATURE = auto()

    @classmethod
    def ANY(cls) -> set['ColumnRole']:  # noqa: N802
        return set(cls)

    def as_selector(self) -> 'ColumnRoleSelector':
        return ColumnRoleSelector(frozenset((self,)))

    def __or__(self, other: object) -> 'ColumnSelector':
        if isinstance(other, ColumnRole):
            return ColumnRoleSelector(frozenset((self, other)))
        if isinstance(other, (ColumnType, ColumnSelector)):
            return self.as_selector() | _as_selector(other)
        raise TypeError(f'Cannot combine {type(other)} with ColumnRole')

    def __and__(self, other: object) -> 'ColumnSelector':
        if isinstance(other, (ColumnType, ColumnSelector)):
            return self.as_selector() & _as_selector(other)
        raise TypeError(f'Cannot combine {type(other)} with ColumnRole')

    def __invert__(self) -> 'ColumnSelector':
        return ~self.as_selector()


@dataclass(kw_only=True, frozen=True, slots=True)
class ColumnSpecification:
    """One declared logical column: ``(name, column_type, column_role)``."""

    name: str
    column_type: ColumnType
    column_role: ColumnRole = ColumnRole.FEATURE

    @classmethod
    def numeric(cls, name: str, role: ColumnRole = ColumnRole.FEATURE) -> 'ColumnSpecification':
        return cls(name=name, column_type=ColumnType.NUMERIC, column_role=role)

    @classmethod
    def boolean(cls, name: str, role: ColumnRole = ColumnRole.FEATURE) -> 'ColumnSpecification':
        return cls(name=name, column_type=ColumnType.BOOLEAN, column_role=role)

    @classmethod
    def nominal(cls, name: str, role: ColumnRole = ColumnRole.FEATURE) -> 'ColumnSpecification':
        return cls(name=name, column_type=ColumnType.NOMINAL, column_role=role)

    @classmethod
    def ordinal(cls, name: str, role: ColumnRole = ColumnRole.FEATURE) -> 'ColumnSpecification':
        return cls(name=name, column_type=ColumnType.ORDINAL, column_role=role)

    @classmethod
    def text(cls, name: str, role: ColumnRole = ColumnRole.FEATURE) -> 'ColumnSpecification':
        return cls(name=name, column_type=ColumnType.TEXT, column_role=role)

    @classmethod
    def datetime(cls, name: str, role: ColumnRole = ColumnRole.FEATURE) -> 'ColumnSpecification':
        return cls(name=name, column_type=ColumnType.DATETIME, column_role=role)

    def arrow_type(self) -> pa.DataType:
        """Default physical Arrow type for this logical type."""
        mapping = {
            ColumnType.NUMERIC: pa.float64(),
            ColumnType.BOOLEAN: pa.bool_(),
            ColumnType.NOMINAL: pa.string(),
            ColumnType.ORDINAL: pa.string(),
            ColumnType.TEXT: pa.string(),
            ColumnType.DATETIME: pa.timestamp('us'),
        }
        return mapping[self.column_type]


ColumnNameOrSpec = Union[str, ColumnSpecification]


def _as_selector(obj: object) -> 'ColumnSelector':
    if isinstance(obj, ColumnSelector):
        return obj
    if isinstance(obj, (ColumnType, ColumnRole)):
        return obj.as_selector()
    raise TypeError(f'Cannot interpret {type(obj)} as a column selector')


class ColumnSelector:
    """Composable predicate over :class:`ColumnSpecification`.

    Subclasses implement :meth:`matches`; ``&``, ``|`` and ``~`` build combined
    selectors so users can write e.g.
    ``(ColumnType.NUMERIC | ColumnType.BOOLEAN) & ~ColumnRole.LABEL``.
    """

    def matches(self, column: ColumnSpecification) -> bool:
        raise NotImplementedError

    def __and__(self, other: object) -> 'ColumnSelector':
        return _Combinator(lambda c, s=self, o=_as_selector(other): s.matches(c) and o.matches(c))

    def __rand__(self, other: object) -> 'ColumnSelector':
        return _as_selector(other) & self

    def __or__(self, other: object) -> 'ColumnSelector':
        return _Combinator(lambda c, s=self, o=_as_selector(other): s.matches(c) or o.matches(c))

    def __ror__(self, other: object) -> 'ColumnSelector':
        return _as_selector(other) | self

    def __invert__(self) -> 'ColumnSelector':
        return _Combinator(lambda c, s=self: not s.matches(c))


@dataclass(frozen=True)
class _Combinator(ColumnSelector):
    predicate: Callable[[ColumnSpecification], bool] = field(compare=False)

    def matches(self, column: ColumnSpecification) -> bool:
        return self.predicate(column)


@dataclass(frozen=True)
class ColumnTypeSelector(ColumnSelector):
    types: frozenset

    def matches(self, column: ColumnSpecification) -> bool:
        return column.column_type in self.types

    @classmethod
    def any(cls) -> 'ColumnTypeSelector':
        return cls(frozenset(ColumnType.ANY()))

    @classmethod
    def exclude(cls, *excluded: ColumnType) -> 'ColumnTypeSelector':
        return cls(frozenset(ColumnType.ANY()) - frozenset(excluded))


@dataclass(frozen=True)
class ColumnRoleSelector(ColumnSelector):
    roles: frozenset

    def matches(self, column: ColumnSpecification) -> bool:
        return column.column_role in self.roles

    @classmethod
    def any(cls) -> 'ColumnRoleSelector':
        return cls(frozenset(ColumnRole.ANY()))

    @classmethod
    def exclude(cls, *excluded: ColumnRole) -> 'ColumnRoleSelector':
        return cls(frozenset(ColumnRole.ANY()) - frozenset(excluded))


@dataclass(frozen=True)
class NameContains(ColumnSelector):
    value: str

    def matches(self, column: ColumnSpecification) -> bool:
        return self.value in column.name


@dataclass(frozen=True)
class NameStartsWith(ColumnSelector):
    value: str

    def matches(self, column: ColumnSpecification) -> bool:
        return column.name.startswith(self.value)


@dataclass(frozen=True)
class NameEndsWith(ColumnSelector):
    value: str

    def matches(self, column: ColumnSpecification) -> bool:
        return column.name.endswith(self.value)


@dataclass(frozen=True)
class NameRegex(ColumnSelector):
    pattern: str
    flags: int = 0

    def matches(self, column: ColumnSpecification) -> bool:
        return re.search(self.pattern, column.name, self.flags) is not None


def name_contains(value: str) -> NameContains:
    return NameContains(value)


def name_starts_with(value: str) -> NameStartsWith:
    return NameStartsWith(value)


def name_ends_with(value: str) -> NameEndsWith:
    return NameEndsWith(value)


def name_matches(regex: str, flags: int = 0) -> NameRegex:
    return NameRegex(regex, flags)


def parse_column_name(column: ColumnNameOrSpec) -> str:
    return column.name if isinstance(column, ColumnSpecification) else column


def get_names_from_column_specs(columns) -> list:
    return [parse_column_name(c) for c in columns]
