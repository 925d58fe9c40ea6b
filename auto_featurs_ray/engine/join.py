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

import logging
from typing import Optional, Sequence

import pyarrow as pa

from auto_featurs_ray.engine.runtime import _canonical_key_array, cogroup_map_partitions

logger = logging.getLogger(__name__)

#: estimated right-side row count below which hash_join hints at
#: broadcast_join (the symmetric pointer to broadcast_join's max_rows guard,
#: closing the scale boundary in both directions)
BROADCAST_HINT_ROWS = 1_000_000


def _tiny_side_hint(left_rows: int, right_rows: int, num_partitions: int) -> Optional[str]:
    """Hint text when the right side looks broadcast-sized, else ``None``.

    Evaluated on ONE reduce partition (its row counts x num_partitions
    estimate the totals), so the heuristic needs no extra counting pass."""
    est_right = right_rows * num_partitions
    est_left = left_rows * num_partitions
    if 0 < est_right < BROADCAST_HINT_ROWS and est_left > est_right * 10:
        return (f'hash_join right side is tiny (~{est_right} rows estimated vs '
                f'~{est_left} left); broadcast_join would skip the two-sided '
                'exchange and join it against streaming left batches instead')
    return None


def hash_join(left, right, *, on: Sequence[str], right_on: Optional[Sequence[str]] = None,
              how: str = 'inner', suffix: str = '_right', num_partitions: int = 64):
    """Join two datasets on equality keys; returns a ``ray.data.Dataset``.

    ``how``: 'inner', 'left' (left outer), 'right' (right outer), 'full'
    (full outer — key columns coalesced, Arrow semantics), 'semi' (left rows
    WITH a key match — the allowlist filter) or 'anti' (left rows WITHOUT
    one — the blocklist / decontamination filter).  Semi/anti never multiply
    rows and ship only the right side's KEY columns through the exchange;
    right/full outer are per-co-partition complete because both sides are
    hashed with the same partitioner (a key's rows land together or nowhere).
    Right columns colliding with left names receive ``suffix``; ``right_on``
    keys are renamed to the left's.
    """
    type_map = {'inner': 'inner', 'left': 'left outer',
                'right': 'right outer', 'full': 'full outer',
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
        if _pid == 0:  # one partition samples the size asymmetry, logs once
            hint = _tiny_side_hint(left_t.num_rows, right_t.num_rows, num_partitions)
            if hint:
                logger.warning(hint)
        return left_t.join(right_t, keys=on, join_type=join_type,
                           right_suffix=suffix, use_threads=False)

    return cogroup_map_partitions(left, right, on, num_partitions, join_partition)


def broadcast_join(left, right, *, on: Sequence[str], right_on: Optional[Sequence[str]] = None,
                   how: str = 'left', suffix: str = '_right',
                   max_rows: int = 5_000_000):
    """Broadcast-hash join for a SMALL right side: the dimension table is
    collected once, shipped to the object store once (``ray.put``) and
    joined against every left batch with Arrow's native join — ZERO
    shuffle, the pattern the flagship pipeline uses for per-source lookups,
    exposed as a first-class operator.

    All supported join types (``left`` / ``inner`` / ``semi`` / ``anti``)
    are per-left-row decisions, so joining batch-by-batch is exact.  The
    right side must fit on the driver: rows are counted first and anything
    above ``max_rows`` raises, pointing at :func:`hash_join` — the
    documented scale boundary between broadcast and exchange joins.
    """
    import numpy as np
    import ray

    type_map = {'inner': 'inner', 'left': 'left outer',
                'semi': 'left semi', 'anti': 'left anti'}
    if how not in type_map:
        raise ValueError(f'Unsupported join type: {how}')
    on = list(on)
    right_on = list(right_on or on)
    rename = dict(zip(right_on, on))

    def _canon(batch: pa.Table) -> pa.Table:
        for key in on:
            canonical = _canonical_key_array(batch.column(key))
            if canonical.type != batch.column(key).type:
                batch = batch.set_column(batch.column_names.index(key), key, canonical)
        return batch

    n_right = right.count()
    if n_right > max_rows:
        raise ValueError(
            f'broadcast_join right side has {n_right} rows > max_rows={max_rows}; '
            'a side this large should go through hash_join (co-group exchange) instead')
    tbl = pa.concat_tables(ray.get(right.to_arrow_refs()), promote_options='permissive')
    tbl = tbl.rename_columns([rename.get(c, c) for c in tbl.column_names])
    if how in ('semi', 'anti'):
        tbl = tbl.select(on)
    tbl = _canon(tbl.combine_chunks())
    handle = ray.put(tbl)

    def join_batch(batch: pa.Table) -> pa.Table:
        right_t = ray.get(handle)
        return _canon(batch).join(right_t, keys=on, join_type=type_map[how],
                                  right_suffix=suffix, use_threads=False)

    return left.map_batches(join_batch, batch_format='pyarrow', zero_copy_batch=True)
