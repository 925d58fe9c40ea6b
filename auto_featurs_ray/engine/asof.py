"""Distributed point-in-time (as-of) join.

The north-rule operator the reference lacks (SURVEY.md §2.7): for each left
row at time ``t`` with entity key ``k``, attach the latest right row with the
same key and ``ts_right <= t`` (direction='backward'; 'forward' gives the
earliest ``ts_right >= t``).

Physical plan (one all-to-all exchange, no driver materialization):

1. Align both sides to a common column set (missing columns null-filled) with
   a ``__side`` tag, inside vectorized ``map_batches``.
2. Union, hash-partition on the entity key (same partitioner as the window
   runtime — co-partitions both sides), ``groupby.map_groups`` per partition.
3. Inside a partition: split sides, sort each by (ts, order), and run a
   vectorized ``pandas.merge_asof`` on the *key/ts columns only* to obtain the
   matched right-row index per left row; right value columns are then attached
   with Arrow ``take`` — the left table (incl. heavy ``tokens`` payloads)
   never leaves Arrow, so token arrays stay byte-equal.

Skew note: entity keys are hashed into ``num_partitions`` buckets; a single
pathological entity streams through one partition task with bounded sort
memory.  Sub-split of one entity is not possible for an as-of join (the match
needs the full right history), so cap per-entity history upstream if needed.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.engine.runtime import PARTITION_COLUMN, hash_partition_codes

_SIDE = '__afr_side'


def _arrow_schema(ds) -> pa.Schema:
    schema = ds.schema()
    return pa.schema(list(zip(schema.names, schema.types)))


def asof_join(left, right, *, by: Sequence[str], on: str, right_on: Optional[str] = None,
              direction: str = 'backward', tolerance_us: Optional[int] = None,
              suffix: str = '_right', num_partitions: int = 64):
    """As-of join two ``ray.data.Dataset``s; returns a new Dataset.

    ``by``: entity key columns (must exist on both sides).
    ``on`` / ``right_on``: event-time columns (timestamp or numeric).
    Right value columns colliding with left names get ``suffix``.
    """
    if direction not in ('backward', 'forward'):
        raise ValueError(f'Unsupported direction: {direction}')
    right_on = right_on or on
    by = list(by)

    left_schema = _arrow_schema(left)
    right_schema = _arrow_schema(right)
    left_names = list(left_schema.names)
    right_value_cols = [n for n in right_schema.names if n not in by and n != right_on]
    out_names = {n: (n + suffix if n in left_names else n) for n in right_value_cols}

    # the union's common physical layout: left columns + right value columns + tag
    union_fields: List[pa.Field] = list(left_schema)
    for name in right_value_cols:
        union_fields.append(pa.field(name + '__r', right_schema.field(name).type))
    union_fields.append(pa.field('__rts', right_schema.field(right_on).type))

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = [batch.column(f.name) if f.name in batch.column_names else pa.nulls(n, f.type)
                  for f in union_fields]
        table = pa.table(arrays, schema=pa.schema(union_fields))
        table = table.append_column(_SIDE, pa.array(np.zeros(n, dtype=np.int8)))
        return table.append_column(PARTITION_COLUMN, pa.array(hash_partition_codes(batch, by, num_partitions)))

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = []
        for f in union_fields:
            if f.name in by:
                arrays.append(batch.column(f.name).cast(f.type))
            elif f.name.endswith('__r') and f.name[:-3] in batch.column_names:
                arrays.append(batch.column(f.name[:-3]))
            elif f.name == '__rts':
                arrays.append(batch.column(right_on))
            else:
                arrays.append(pa.nulls(n, f.type))
        table = pa.table(arrays, schema=pa.schema(union_fields))
        table = table.append_column(_SIDE, pa.array(np.ones(n, dtype=np.int8)))
        return table.append_column(PARTITION_COLUMN, pa.array(hash_partition_codes(batch, by, num_partitions)))

    tagged = left.map_batches(tag_left, batch_format='pyarrow', zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format='pyarrow', zero_copy_batch=True))

    def merge_partition(table: pa.Table) -> pa.Table:
        side = table.column(_SIDE).to_numpy(zero_copy_only=False)
        left_t = table.filter(pa.array(side == 0)).drop_columns([_SIDE, PARTITION_COLUMN])
        right_t = table.filter(pa.array(side == 1)).drop_columns([_SIDE, PARTITION_COLUMN])

        # sort left by its event time, right by the right event time
        left_t = left_t.take(pc.sort_indices(left_t, sort_keys=[(on, 'ascending')]))
        right_rows = right_t.num_rows

        result = left_t.drop_columns([f'{c}__r' for c in right_value_cols] + ['__rts'])
        if right_rows == 0 or left_t.num_rows == 0:
            for c in right_value_cols:
                result = result.append_column(out_names[c], pa.nulls(left_t.num_rows,
                                                                     right_schema.field(c).type))
            return result

        right_t = right_t.take(pc.sort_indices(right_t, sort_keys=[('__rts', 'ascending')]))
        left_key = {k: left_t.column(k).to_pandas() for k in by}
        right_key = {k: right_t.column(k).to_pandas() for k in by}
        lframe = pd.DataFrame({**left_key, '__ts': left_t.column(on).to_pandas(),
                               '__lidx': np.arange(left_t.num_rows)})
        rframe = pd.DataFrame({**right_key, '__ts': right_t.column('__rts').to_pandas(),
                               '__ridx': np.arange(right_rows)})
        merged = pd.merge_asof(lframe, rframe, on='__ts', by=by, direction=direction,
                               tolerance=None if tolerance_us is None else pd.Timedelta(microseconds=tolerance_us),
                               allow_exact_matches=True)
        ridx = merged.sort_values('__lidx')['__ridx'].astype('Int64')
        take_idx = pa.Array.from_pandas(ridx.reset_index(drop=True), type=pa.int64())
        for c in right_value_cols:
            result = result.append_column(out_names[c], right_t.column(f'{c}__r').take(take_idx))
        return result

    return tagged.groupby(PARTITION_COLUMN).map_groups(merge_partition, batch_format='pyarrow')
