"""Partitioned execution runtime: turning transformer layers into Ray Data stages.

Physical plan per pipeline layer (SURVEY.md §7 milestone 5):

1. **Partitioned window stages** — aggregating transformers grouped by their
   outermost ``over`` key set.  For each distinct key set the engine adds a
   ``__afr_part = hash(keys) % P`` column inside ``map_batches`` (vectorized),
   then runs ``groupby('__afr_part').map_groups(fn, batch_format='pyarrow')``:
   one all-to-all exchange serves *all* features keyed on that entity set.
   Inside each partition, rows are sorted by ``(keys, order_by)`` with
   ``pyarrow.compute.sort_indices`` + zero-copy ``take``; every aggregate for
   the stage is computed in one pass over the sorted partition.  Ungrouped
   order-dependent features (global cumulative / rolling) degenerate to a
   single partition — inherently sequential; key them on an entity at scale.
2. **Global two-pass stages** — ungrouped NONE-mode aggregates (scalers,
   whole-frame min/max/sum/mean/std/quantile/...) are computed as map_batches
   partials -> driver combine -> broadcast into a second map_batches.  No
   shuffle; the partial pass prunes to the needed columns.
3. **Fused row-local stage** — every row-local kernel of the layer runs in one
   ``map_batches(batch_format='pyarrow', zero_copy_batch=True)`` call.

Heavy payload columns (``tokens: list<int32>``) are only ever moved by Arrow
``take``/slice — never converted to Python — preserving byte equality.
"""

from __future__ import annotations

import pickle
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.engine.aggframe import AggFrame
from auto_featurs_ray.transformers.base import (
    AggregatingTransformer,
    CumulativeOptions,
    RowLocalTransformer,
    Transformer,
)
from auto_featurs_ray.transformers.over_wrapper import OverWrapper

PARTITION_COLUMN = '__afr_part'
DEFAULT_NUM_PARTITIONS = 64


def _stage_key(transformer: AggregatingTransformer) -> tuple:
    """Shuffle key for an aggregating transformer = outermost over columns."""
    if isinstance(transformer, OverWrapper):
        return tuple(transformer.over_columns)
    return ()


def _is_global_two_pass(transformer: AggregatingTransformer) -> bool:
    return (
        not isinstance(transformer, OverWrapper)
        and transformer.supports_global_two_pass
        and getattr(transformer, 'cumulative', CumulativeOptions.NONE) == CumulativeOptions.NONE
    )


def _to_arrow_column(values) -> pa.Array:
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        return values
    if isinstance(values, pd.Series):
        return pa.Array.from_pandas(values)
    values = np.asarray(values)
    if values.dtype == object:
        return pa.Array.from_pandas(pd.Series(values))
    return pa.array(values)


def hash_partition_codes(table: pa.Table, key_columns: Sequence[str], num_partitions: int) -> np.ndarray:
    """Deterministic hash of the key columns -> [0, num_partitions)."""
    acc = np.zeros(table.num_rows, dtype=np.uint64)
    for name in key_columns:
        # siphash with pandas' fixed default key: deterministic across batches,
        # processes and nodes — safe as a shuffle key.
        series = table.column(name).to_pandas()
        hashed = pd.util.hash_pandas_object(series, index=False).to_numpy()
        acc = acc * np.uint64(1000003) + hashed.astype(np.uint64)
    return (acc % np.uint64(num_partitions)).astype(np.int64)


def sort_partition(table: pa.Table, sort_columns: Sequence[str]) -> pa.Table:
    if not sort_columns:
        return table
    indices = pc.sort_indices(table, sort_keys=[(c, 'ascending') for c in sort_columns])
    return table.take(indices)


def make_partition_fn(transformers: Sequence[AggregatingTransformer], key_columns: Sequence[str],
                      order_by: Sequence[str]):
    """Build the per-partition map_groups function for one window stage."""
    sort_columns = [*key_columns, *order_by]

    def run_partition(table: pa.Table) -> pa.Table:
        if PARTITION_COLUMN in table.column_names:
            table = table.drop_columns([PARTITION_COLUMN])
        table = sort_partition(table, [c for c in sort_columns if c in table.column_names])
        frame = AggFrame(table)
        out = table
        for transformer in transformers:
            # the outermost OverWrapper's keys ARE the partition keys; compute
            # re-derives codes internally so nested wrappers compose correctly.
            result = transformer.compute(frame, None)
            out = out.append_column(transformer.output_name, _to_arrow_column(result))
        return out

    return run_partition


def apply_window_stage(ds, transformers: Sequence[AggregatingTransformer], key_columns: Sequence[str],
                       order_by: Sequence[str], num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Hash-partition by ``key_columns`` and run all aggregates in one pass."""

    if key_columns:
        def assign(batch: pa.Table) -> pa.Table:
            codes = hash_partition_codes(batch, key_columns, num_partitions)
            return batch.append_column(PARTITION_COLUMN, pa.array(codes))
    else:
        def assign(batch: pa.Table) -> pa.Table:
            return batch.append_column(PARTITION_COLUMN, pa.array(np.zeros(batch.num_rows, dtype=np.int64)))

    fn = make_partition_fn(transformers, key_columns, order_by)
    ds = ds.map_batches(assign, batch_format='pyarrow', zero_copy_batch=True)
    return ds.groupby(PARTITION_COLUMN).map_groups(fn, batch_format='pyarrow')


def apply_row_local_stage(ds, transformers: Sequence[RowLocalTransformer]):
    names = [t.output_name for t in transformers]

    def fused(batch: pa.Table) -> pa.Table:
        for transformer, name in zip(transformers, names):
            batch = batch.append_column(name, transformer.apply(batch))
        return batch

    return ds.map_batches(fused, batch_format='pyarrow', zero_copy_batch=True)


def apply_global_two_pass_stage(ds, transformers: Sequence[AggregatingTransformer]):
    """Partial per batch -> combine on driver -> broadcast finalize per batch."""

    def partials(batch: pa.Table) -> pa.Table:
        states = [pickle.dumps(t.global_partial(batch)) for t in transformers]
        return pa.table({'state': [pickle.dumps(states)]})

    partial_rows = ds.map_batches(partials, batch_format='pyarrow').take_all()
    combined: List[object] = []
    for row in partial_rows:
        states = [pickle.loads(s) for s in pickle.loads(row['state'])]
        if not combined:
            combined = states
        else:
            combined = [t.global_combine(acc, s) for t, acc, s in zip(transformers, combined, states)]
    if not combined:
        raise ValueError('Global aggregate over an empty dataset')

    def finalize(batch: pa.Table) -> pa.Table:
        for transformer, state in zip(transformers, combined):
            batch = batch.append_column(transformer.output_name,
                                        _to_arrow_column(transformer.global_finalize(state, batch)))
        return batch

    return ds.map_batches(finalize, batch_format='pyarrow', zero_copy_batch=True)


def apply_layer(ds, transformers: Sequence[Transformer], order_by: Sequence[str],
                num_partitions: int = DEFAULT_NUM_PARTITIONS, allow_two_pass: bool = True):
    """Execute one pipeline layer: window stages, global stats, fused row-local map."""
    row_local = [t for t in transformers if isinstance(t, RowLocalTransformer)]
    aggregating = [t for t in transformers if isinstance(t, AggregatingTransformer)]

    two_pass = [t for t in aggregating if allow_two_pass and _is_global_two_pass(t)]
    partitioned = [t for t in aggregating if t not in two_pass]

    stages: dict = {}
    for t in partitioned:
        stages.setdefault(_stage_key(t), []).append(t)
    for key, group in stages.items():
        ds = apply_window_stage(ds, group, list(key), order_by, num_partitions)
    if two_pass:
        ds = apply_global_two_pass_stage(ds, two_pass)
    if row_local:
        ds = apply_row_local_stage(ds, row_local)
    return ds
