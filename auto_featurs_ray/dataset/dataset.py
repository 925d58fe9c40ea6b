"""Dataset: a ``ray.data.Dataset`` paired with an explicit logical Schema.

Counterpart of the reference's LazyFrame+Schema pair
(``/root/reference/src/auto_featurs/dataset/dataset.py``), with two additions
the distributed engine needs:

* ``order_by`` — the canonical row-order columns.  Every cumulative / lag /
  rolling feature depends on row order; the reference trusts frame order, a
  distributed engine cannot, so the order is an explicit, totally-ordered
  column list (e.g. ``['ts', 'event_id']``) used for the in-partition sort and
  for deterministic collection.
* ``num_partitions`` — the hash-partition count for entity-keyed window
  stages (pick so one partition's rows fit a worker's heap at full scale).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterable, Optional, Sequence, Union

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from auto_featurs_ray.base.column_specification import ColumnRole, ColumnSpecification, ColumnType
from auto_featurs_ray.base.schema import ColumnSelection, Schema
from auto_featurs_ray.engine.runtime import DEFAULT_NUM_PARTITIONS

logger = logging.getLogger(__name__)


class Dataset:
    def __init__(self, data: 'ray.data.Dataset', schema: Schema, *,
                 order_by: Optional[Sequence[str]] = None,
                 num_partitions: int = DEFAULT_NUM_PARTITIONS,
                 broadcast_agg_keys: Optional[Sequence[str]] = None,
                 drop_columns_outside_schema: bool = False) -> None:
        self._data = data
        self._schema = schema
        self.order_by: list = list(order_by or [])
        self.num_partitions = num_partitions
        # low-cardinality (possibly hot/skewed) keys: NONE-mode grouped
        # aggregates over these route through the skew-immune partial+broadcast
        # stage instead of the row shuffle
        self.broadcast_agg_keys = frozenset(broadcast_agg_keys or ())
        if drop_columns_outside_schema:
            physical = set(data.schema().names)
            declared = set(schema.column_names)
            extra = physical - declared
            if extra:
                logger.warning('Dropping columns not present in schema: %s', ', '.join(sorted(extra)))
                self._data = data.select_columns([c for c in data.schema().names if c in declared])

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_parquet(cls, path: Union[str, Path], schema: Schema, *,
                     order_by: Optional[Sequence[str]] = None,
                     num_partitions: int = DEFAULT_NUM_PARTITIONS,
                     broadcast_agg_keys: Optional[Sequence[str]] = None,
                     drop_columns_outside_schema: bool = False,
                     columns: Optional[Sequence[str]] = None) -> 'Dataset':
        data = ray.data.read_parquet(str(path), columns=list(columns) if columns else None)
        return cls(data, schema, order_by=order_by, num_partitions=num_partitions,
                   broadcast_agg_keys=broadcast_agg_keys,
                   drop_columns_outside_schema=drop_columns_outside_schema)

    @classmethod
    def from_csv(cls, path: Union[str, Path], schema: Schema, *,
                 order_by: Optional[Sequence[str]] = None,
                 num_partitions: int = DEFAULT_NUM_PARTITIONS,
                 broadcast_agg_keys: Optional[Sequence[str]] = None,
                 drop_columns_outside_schema: bool = False,
                 columns: Optional[Sequence[str]] = None,
                 **read_csv_kwargs) -> 'Dataset':
        """CSV source (engine extension; the reference ships only a stub CSV
        example fetcher).  Column pruning happens right after the scan —
        CSV cannot push projections into the read itself; prefer parquet for
        wide tables at scale."""
        data = ray.data.read_csv(str(path), **read_csv_kwargs)
        if columns:
            data = data.select_columns(list(columns))
        return cls(data, schema, order_by=order_by, num_partitions=num_partitions,
                   broadcast_agg_keys=broadcast_agg_keys,
                   drop_columns_outside_schema=drop_columns_outside_schema)

    @classmethod
    def from_json(cls, path: Union[str, Path], schema: Schema, *,
                  order_by: Optional[Sequence[str]] = None,
                  num_partitions: int = DEFAULT_NUM_PARTITIONS,
                  broadcast_agg_keys: Optional[Sequence[str]] = None,
                  drop_columns_outside_schema: bool = False,
                  columns: Optional[Sequence[str]] = None,
                  **read_json_kwargs) -> 'Dataset':
        """JSON-lines source (engine extension) — the lingua franca of text
        corpora.  Same post-scan pruning caveat as :meth:`from_csv`."""
        data = ray.data.read_json(str(path), **read_json_kwargs)
        if columns:
            data = data.select_columns(list(columns))
        return cls(data, schema, order_by=order_by, num_partitions=num_partitions,
                   broadcast_agg_keys=broadcast_agg_keys,
                   drop_columns_outside_schema=drop_columns_outside_schema)

    @classmethod
    def from_arrow(cls, table: pa.Table, schema: Schema, *,
                   order_by: Optional[Sequence[str]] = None,
                   num_partitions: int = DEFAULT_NUM_PARTITIONS,
                   broadcast_agg_keys: Optional[Sequence[str]] = None,
                   num_blocks: Optional[int] = None) -> 'Dataset':
        if num_blocks and num_blocks > 1:
            # split across blocks to exercise multi-block execution in tests
            step = max(1, (table.num_rows + num_blocks - 1) // num_blocks)
            pieces = [table.slice(i, step) for i in range(0, table.num_rows, step)]
            data = ray.data.from_arrow(pieces)
        else:
            data = ray.data.from_arrow(table)
        return cls(data, schema, order_by=order_by, num_partitions=num_partitions,
                   broadcast_agg_keys=broadcast_agg_keys)

    @classmethod
    def from_pandas(cls, df: pd.DataFrame, schema: Schema, **kwargs) -> 'Dataset':
        return cls.from_arrow(pa.Table.from_pandas(df, preserve_index=False), schema, **kwargs)

    # -- accessors ----------------------------------------------------------
    @property
    def data(self) -> 'ray.data.Dataset':
        return self._data

    @property
    def schema(self) -> Schema:
        return self._schema

    @property
    def num_columns(self) -> int:
        return self._schema.num_columns

    def get_combinations_from_selections(self, *subsets: ColumnSelection) -> list:
        return [self.get_columns_from_selection(s) for s in subsets]

    def get_columns_from_selection(self, subset: ColumnSelection) -> list:
        return self._schema.get_columns_from_selection(subset)

    def get_columns_of_type(self, column_type: ColumnType) -> list:
        return self._schema.get_columns_of_type(column_type)

    def get_column_by_name(self, column_name: str) -> ColumnSpecification:
        return self._schema.get_column_by_name(column_name)

    def get_label_column(self) -> ColumnSpecification:
        return self._schema.label_column

    # -- plan transforms ----------------------------------------------------
    def drop(self, columns: Iterable) -> 'Dataset':
        columns = list(columns)
        names = [c.name for c in columns]
        data = self._data.drop_columns(names) if names else self._data
        return self._with(data, self._schema.drop(columns))

    def with_data(self, data: 'ray.data.Dataset') -> 'Dataset':
        return self._with(data, self._schema)

    def with_schema(self, new_schema: Schema) -> 'Dataset':
        return self._with(self._data, self._schema + new_schema)

    def with_cached_computation(self) -> 'Dataset':
        return self._with(self._data.materialize(), self._schema)

    def _with(self, data: 'ray.data.Dataset', schema: Schema) -> 'Dataset':
        return Dataset(data, schema, order_by=self.order_by, num_partitions=self.num_partitions,
                       broadcast_agg_keys=self.broadcast_agg_keys)

    # -- consumption --------------------------------------------------------
    def collect(self) -> pd.DataFrame:
        """Materialize to pandas in canonical order (test/small-result path)."""
        df = self._data.to_pandas()
        if self.order_by and all(c in df.columns for c in self.order_by):
            # an empty dataset materializes with no columns at all — nothing
            # to sort then (or ever, at 0 rows)
            df = df.sort_values(self.order_by, kind='stable').reset_index(drop=True)
        return df

    def to_arrow(self) -> pa.Table:
        tables = [ray.get(ref) for ref in self._data.to_arrow_refs()]
        tables = [t for t in tables if t.num_rows]
        combined = pa.concat_tables(tables, promote_options='permissive') if tables else pa.table({})
        if self.order_by and combined.num_rows:
            import pyarrow.compute as pc
            idx = pc.sort_indices(combined, sort_keys=[(c, 'ascending') for c in self.order_by])
            combined = combined.take(idx)
        return combined

    def sink_parquet(self, path: Union[str, Path]) -> None:
        self._data.write_parquet(str(path))

    def count(self) -> int:
        return self._data.count()
