"""Ordered, explicit logical schema with selection resolution.

The engine keeps a user-declared logical schema separate from the physical
Arrow dtypes, mirroring the behaviour of the reference's declared schema
(``/root/reference/src/auto_featurs/base/schema.py``): a ``ColumnSelection``
may be a column name, a :class:`ColumnType`, a :class:`ColumnRole`, a
:class:`ColumnSpecification`, a :class:`ColumnSelector`, or any iterable of
those.  Resolving a ``set`` sorts the result by name so generated feature
grids stay deterministic.

Internally the schema maintains both the declaration order (driving feature
generation order) and a name index (O(1) lookups during pipeline building,
which resolves thousands of selections for wide cartesian grids).
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

from auto_featurs_ray.base.column_specification import (
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
    """An ordered list of :class:`ColumnSpecification` with selection helpers."""

    __slots__ = ('_columns', '_by_name')

    def __init__(self, columns: Iterable) -> None:
        self._columns = list(columns)
        self._by_name = {}
        for spec in self._columns:
            # first declaration wins for name lookup, matching list search order
            self._by_name.setdefault(spec.name, spec)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_dict(cls, spec: dict, *, label_col: Optional[str] = None) -> 'Schema':
        """Build a schema from ``{ColumnType: [names...]}`` with an optional label."""
        columns = [
            ColumnSpecification(
                name=name,
                column_type=col_type,
                column_role=ColumnRole.LABEL if name == label_col else ColumnRole.FEATURE,
            )
            for col_type, names in spec.items()
            for name in names
        ]
        schema = cls(columns)
        if label_col is not None and label_col not in schema._by_name:
            raise ValueError(f'label_col={label_col!r} not found in provided columns')
        return schema

    # -- dunder surface ------------------------------------------------------
    def __add__(self, other: object) -> 'Schema':
        if not isinstance(other, Schema):
            raise TypeError(f'Cannot add {type(other)} to Schema')
        return Schema(self._columns + other._columns)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Schema):
            raise TypeError(f'Cannot compare {type(other)} to Schema')
        return self._columns == other._columns

    def __repr__(self) -> str:
        return f'Schema({self._columns!r})'

    def __len__(self) -> int:
        return len(self._columns)

    # -- basic accessors -----------------------------------------------------
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
        labelled = [s for s in self._columns if s.column_role == ColumnRole.LABEL]
        if not labelled:
            raise ValueError('No label column found in schema.')
        return labelled[0]

    def get_column_by_name(self, column_name: str) -> ColumnSpecification:
        try:
            return self._by_name[column_name]
        except KeyError:
            raise KeyError(f'Column "{column_name}" not found in schema.') from None

    # -- mutation-by-copy ----------------------------------------------------
    def drop(self, columns: Iterable) -> 'Schema':
        remaining = list(self._columns)
        for spec in columns:
            remaining.remove(spec)
        return Schema(remaining)

    # -- filtered views ------------------------------------------------------
    def _pool(self, subset) -> list:
        if subset is None:
            return self._columns
        missing = [c for c in subset if c not in self._columns]
        if missing:
            names = sorted(get_names_from_column_specs(subset))
            raise ValueError(f'The following columns in subset not found in schema: {names}')
        return subset

    def get_columns_of_type(self, column_type: ColumnType, subset=None) -> list:
        return [s for s in self._pool(subset) if s.column_type == column_type]

    def get_columns_of_role(self, column_role: ColumnRole, subset=None) -> list:
        return [s for s in self._pool(subset) if s.column_role == column_role]

    def get_columns_matching_selector(self, selector: ColumnSelector, subset=None) -> list:
        return [s for s in self._pool(subset) if selector.matches(s)]

    # -- selection resolution ------------------------------------------------
    def get_columns_from_selection(self, subset: ColumnSelection) -> list:
        """Resolve any supported selection form to a concrete column list."""
        resolver = self._RESOLVERS.get(type(subset))
        if resolver is not None:
            return resolver(self, subset)
        if isinstance(subset, ColumnType):
            return self.get_columns_of_type(subset)
        if isinstance(subset, ColumnRole):
            return self.get_columns_of_role(subset)
        if isinstance(subset, ColumnSelector):
            return self.get_columns_matching_selector(subset)
        if isinstance(subset, Iterable):
            return self._resolve_iterable(subset)
        raise ValueError(f'Unexpected subset type: {type(subset)}')

    def _resolve_name(self, name: str) -> list:
        return [self.get_column_by_name(name)]

    def _resolve_spec(self, spec: ColumnSpecification) -> list:
        self._pool([spec])
        return [spec]

    def _resolve_iterable(self, subset) -> list:
        resolved = [col for item in subset for col in self.get_columns_from_selection(item)]
        if type(subset) is set:
            # sets are unordered: sort by name for deterministic feature grids
            return sorted(resolved, key=lambda spec: spec.name)
        return resolved

    _RESOLVERS = {
        str: _resolve_name,
        ColumnSpecification: _resolve_spec,
    }
