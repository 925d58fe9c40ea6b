"""Ordered, explicit logical schema with selection resolution.

Mirrors the behaviour of the reference's declared schema
(``/root/reference/src/auto_featurs/base/schema.py``): a ``ColumnSelection``
may be a column name, a :class:`ColumnType`, a :class:`ColumnRole`, a
:class:`ColumnSpecification`, a :class:`ColumnSelector`, or an iterable of
those; resolving a ``set`` sorts the result by name for determinism.
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

from auto_featurs_ray.base.column_specification import (
    ColumnNameOrSpec,
    ColumnRole,
    ColumnSelector,
    ColumnSpecification,
    ColumnType,
    get_names_from_column_specs,
)

ColumnSelection = Union[
    str,
    ColumnType,
    ColumnRole,
    ColumnSpecification,
    ColumnSelector,
    Iterable,
]
ColumnSet = list


class Schema:
    def __init__(self, columns: list) -> None:
        self._columns: list = list(columns)

    def __add__(self, other: object) -> 'Schema':
        if not isinstance(other, Schema):
            raise TypeError(f'Cannot add {type(other)} to Schema')
        return Schema(self._columns + other.columns)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Schema):
            raise TypeError(f'Cannot compare {type(other)} to Schema')
        return self._columns == other.columns

    def __repr__(self) -> str:
        return f'Schema({self._columns!r})'

    @classmethod
    def from_dict(cls, spec: dict, *, label_col: Optional[str] = None) -> 'Schema':
        """Build a schema from ``{ColumnType: [names...]}``."""
        columns = []
        for col_type, names in spec.items():
            for name in names:
                role = ColumnRole.LABEL if name == label_col else ColumnRole.FEATURE
                columns.append(ColumnSpecification(name=name, column_type=col_type, column_role=role))
        if label_col is not None and not any(c.name == label_col for c in columns):
            raise ValueError(f'label_col={label_col!r} not found in provided columns')
        return cls(columns)

    @property
    def columns(self) -> list:
        return self._columns

    @property
    def column_names(self) -> list:
        return get_names_from_column_specs(self._columns)

    @property
    def num_columns(self) -> int:
        return len(self._columns)

    @property
    def label_column(self) -> ColumnSpecification:
        for spec in self._columns:
            if spec.column_role == ColumnRole.LABEL:
                return spec
        raise ValueError('No label column found in schema.')

    def drop(self, columns: Iterable) -> 'Schema':
        remaining = list(self._columns)
        for col in columns:
            remaining.remove(col)
        return Schema(remaining)

    def get_column_by_name(self, column_name: str) -> ColumnSpecification:
        for spec in self._columns:
            if spec.name == column_name:
                return spec
        raise KeyError(f'Column "{column_name}" not found in schema.')

    def get_columns_of_type(self, column_type: ColumnType, subset=None) -> list:
        pool = self._validated_subset(subset)
        return [s for s in pool if s.column_type == column_type]

    def get_columns_of_role(self, column_role: ColumnRole, subset=None) -> list:
        pool = self._validated_subset(subset)
        return [s for s in pool if s.column_role == column_role]

    def get_columns_matching_selector(self, selector: ColumnSelector, subset=None) -> list:
        pool = self._validated_subset(subset)
        return [s for s in pool if selector.matches(s)]

    def get_columns_from_selection(self, subset: ColumnSelection) -> list:
        if isinstance(subset, ColumnType):
            return self.get_columns_of_type(subset)
        if isinstance(subset, ColumnRole):
            return self.get_columns_of_role(subset)
        if isinstance(subset, ColumnSpecification):
            self._check_in_schema([subset])
            return [subset]
        if isinstance(subset, ColumnSelector):
            return self.get_columns_matching_selector(subset)
        if isinstance(subset, str):
            return [self.get_column_by_name(subset)]
        if isinstance(subset, Iterable):
            resolved = []
            for item in subset:
                resolved.extend(self.get_columns_from_selection(item))
            if type(subset) is set:
                return sorted(resolved, key=lambda c: c.name)
            return resolved
        raise ValueError(f'Unexpected subset type: {type(subset)}')

    def _validated_subset(self, subset) -> list:
        if subset is None:
            return self._columns
        self._check_in_schema(subset)
        return subset

    def _check_in_schema(self, subset) -> None:
        missing = [c for c in subset if c not in self._columns]
        if missing:
            names = sorted(get_names_from_column_specs(subset))
            raise ValueError(f'The following columns in subset not found in schema: {names}')
