"""Distributed equi-join on the co-grouped task shuffle.

General partitioned hash join (inner / left / semi / anti) between two
``ray.data.Dataset``s: both sides are hash-partitioned on the key with the
same partitioner as every other engine exchange, and each co-located partition
pair is joined with Arrow's native ``Table.join`` — vectorized, zero Python
per row.  Small dimension tables should instead be broadcast
(``ray.put`` + lookup in ``map_batches``); this operator is for two LARGE
sides.  Skewed keys follow the same story as the window runtime: a hot key's
rows land in one partition task; pre-aggregate or salt upstream if a single
key exceeds worker memory.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa

from auto_featurs_ray.engine.runtime import _canonical_key_array, cogroup_map_partitions


def hash_join(left, right, *, on: Sequence[str], right_on: Optional[Sequence[str]] = None,
              how: str = 'inner', suffix: str = '_right', num_partitions: int = 64):
    """Join two datasets on equality keys; returns a ``ray.data.Dataset``.

    ``how``: 'inner', 'left' (left outer), 'semi' (left rows WITH a key
    match — the allowlist filter) or 'anti' (left rows WITHOUT one — the
    blocklist / decontamination filter).  Semi/anti never multiply rows and
    ship only the right side's KEY columns through the exchange.  Right
    columns colliding with left names receive ``suffix``; ``right_on`` keys
    are renamed to the left's.
    """
    type_map = {'inner': 'inner', 'left': 'left outer',
                'semi': 'left semi', 'anti': 'left anti'}
    if how not in type_map:
        raise ValueError(f'Unsupported join type: {how}')
    on = list(on)
    right_on = list(right_on or on)
    join_type = type_map[how]

    rename = dict(zip(right_on, on))

    def align(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns([rename.get(c, c) for c in batch.column_names])
        if how in ('semi', 'anti'):
            batch = batch.select(on)
        return _canonicalize_keys(batch)

    def _canonicalize_keys(batch: pa.Table) -> pa.Table:
        # equal keys must share one physical type on both sides: the hash
        # partitioner is representation-sensitive and Arrow's join requires
        # matching key types (int32 vs int64 would silently drop matches)
        for key in on:
            canonical = _canonical_key_array(batch.column(key))
            if canonical.type != batch.column(key).type:
                batch = batch.set_column(batch.column_names.index(key), key, canonical)
        return batch

    left = left.map_batches(_canonicalize_keys, batch_format='pyarrow', zero_copy_batch=True)
    right = right.map_batches(align, batch_format='pyarrow', zero_copy_batch=True)

    def join_partition(left_t: pa.Table, right_t: pa.Table, _pid: int) -> pa.Table:
        return left_t.join(right_t, keys=on, join_type=join_type,
                           right_suffix=suffix, use_threads=False)

    return cogroup_map_partitions(left, right, on, num_partitions, join_partition)
