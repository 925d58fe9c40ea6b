"""Distributed point-in-time (as-of) join.

The north-rule operator the reference lacks (SURVEY.md §2.7): for each left
row at time ``t`` with entity key ``k``, attach the latest right row with the
same key and ``ts_right <= t`` (direction='backward'; 'forward' gives the
earliest ``ts_right >= t``).

Physical plan — ONE all-to-all exchange, built on the engine's co-grouped
task shuffle (``cogroup_map_partitions``): both sides are hash-partitioned on
the entity key with the same partitioner as the window runtime; inside each
partition the sides are sorted by event time and a vectorized
``pandas.merge_asof`` runs on the *key/ts columns only* to obtain the matched
right-row index per left row.  Right value columns are then attached with
Arrow ``take`` — the left table (incl. heavy ``tokens`` payloads) never
leaves Arrow, so token arrays stay byte-equal through the join.

Per-entity window features can piggyback on the same exchange
(``post_transformers``), and row-local kernels on the joined+windowed table
fuse into the same reduce task (``post_row_local``) — the flagship pipeline
(as-of join + full window suite + ratio layer) costs exactly one shuffle.

Skew note: entity keys are hashed into ``num_partitions`` buckets; a single
pathological entity streams through one partition task with bounded sort
memory.  Sub-splitting one entity is not possible for an as-of join (the
match needs the full right history) — cap per-entity history upstream.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.engine.runtime import cogroup_map_partitions


def _dedupe_max(table: pa.Table, by: Sequence[str], on: str, value_column: str) -> pa.Table:
    """One row per (by, on): the max-``value_column`` row (vectorized run filter).

    Null keys are normalized: two nulls compare EQUAL (one run, so null-keyed
    duplicates collapse like any other key), a null never equals a non-null.
    Raw numpy ``!=`` would treat NaN/NaT keys as always-distinct while object
    ``None`` keys compare equal — two different null semantics in one pass.
    """
    keys = [(k, 'ascending') for k in by] + [(on, 'ascending'), (value_column, 'descending')]
    table = table.take(pc.sort_indices(table, sort_keys=keys))
    if table.num_rows <= 1:
        return table
    diff = _null_safe_run_diff(table, [*by, on])
    return table.filter(pa.array(np.concatenate(([True], diff))))


def _null_safe_run_diff(table: pa.Table, columns: Sequence[str]) -> np.ndarray:
    """Boolean array of length n-1: True where row i+1 starts a new key run
    (nulls compare equal to nulls, unequal to everything else)."""
    n = table.num_rows
    diff = np.zeros(max(n - 1, 0), dtype=bool)
    for name in columns:
        arr = table.column(name).to_numpy(zero_copy_only=False)
        isna = pd.isna(arr)
        both_na = isna[1:] & isna[:-1]
        one_na = isna[1:] ^ isna[:-1]
        with np.errstate(invalid='ignore'):
            neq = arr[1:] != arr[:-1]
        diff |= one_na | (neq & ~both_na & ~one_na)
    return diff


def _cap_entity_history(table: pa.Table, by: Sequence[str], on: str, cap: int,
                        partition_id: int) -> pa.Table:
    """Keep only the most recent ``cap`` right-side rows per entity.

    The escape hatch for entities whose history exceeds one reduce task's
    memory (an as-of join cannot sub-split an entity — the match needs the
    full right history).  Truncation is surfaced with a warning; matches that
    would have landed beyond the kept window resolve to the oldest kept row
    or null, so set the cap above the longest lookback the pipeline needs.
    """
    if table.num_rows <= cap:
        return table
    keys = [(k, 'ascending') for k in by] + [(on, 'ascending')]
    table = table.take(pc.sort_indices(table, sort_keys=keys))
    n = table.num_rows
    diff = _null_safe_run_diff(table, by)
    starts = np.concatenate(([0], np.flatnonzero(diff) + 1, [n]))
    lengths = np.diff(starts)
    oversized = int((lengths > cap).sum())
    if not oversized:
        return table
    rank_in_run = np.arange(n) - np.repeat(starts[:-1], lengths)
    keep = rank_in_run >= np.repeat(lengths - cap, lengths)
    import logging
    logging.getLogger(__name__).warning(
        'asof partition %d: truncated %d entities to their most recent %d right-side '
        'rows (largest had %d); matches beyond the kept history resolve to its oldest '
        'row or null — raise max_right_rows_per_entity if the lookback needs more',
        partition_id, oversized, cap, int(lengths.max()))
    return table.filter(pa.array(keep))


def _arrow_schema(ds) -> pa.Schema:
    if isinstance(ds, (list, tuple)):  # parquet shard paths (fused scan+split)
        import pyarrow.parquet as pq
        return pq.read_schema(ds[0])
    schema = ds.schema()
    return pa.schema(list(zip(schema.names, schema.types)))


def asof_join(left, right, *, by: Sequence[str], on: str, right_on: Optional[str] = None,
              direction: str = 'backward', tolerance_us: Optional[int] = None,
              suffix: str = '_right', num_partitions: int = 64,
              post_transformers: Optional[Sequence] = None,
              post_order_by: Sequence[str] = (),
              post_row_local: Optional[Sequence] = None,
              right_dedupe_max: Optional[str] = None,
              max_right_rows_per_entity: Optional[int] = None,
              presplit: Optional[dict] = None):
    """As-of join two ``ray.data.Dataset``s; returns a new Dataset.

    ``by``: entity key columns (must exist on both sides).
    ``on`` / ``right_on``: event-time columns (timestamp or numeric).
    Right value columns colliding with left names get ``suffix``.
    ``right_dedupe_max``: optionally collapse the right side to one row per
    ``(by, right_on)`` — the row with the maximum value of this column —
    INSIDE the co-group reduce.  The right side is already key-partitioned
    there, so this replaces a whole extra ``groupby().map_groups`` exchange
    (whose fixed overhead dominated the round-1 asof query) with a local
    sort-run filter.

    ``max_right_rows_per_entity``: cap one entity's right-side history to its
    most recent N rows inside the reduce (see :func:`_cap_entity_history`) —
    the documented guard for a single pathological entity larger than a
    reduce task's memory, which cannot be sub-split for an as-of join.

    ``presplit``: a handle from ``cogroup_launch_splits(left, right, by,
    num_partitions)`` — lets the caller overlap driver-side work (e.g.
    broadcast-state computation) with the scan+split phase.
    """
    if direction not in ('backward', 'forward'):
        raise ValueError(f'Unsupported direction: {direction}')
    right_on = right_on or on
    by = list(by)

    left_names = list(_arrow_schema(left).names)
    right_schema = _arrow_schema(right)
    right_value_cols = [n for n in right_schema.names if n not in by and n != right_on]
    out_names = {n: (n + suffix if n in left_names else n) for n in right_value_cols}

    window_fn = None
    if post_transformers:
        from auto_featurs_ray.engine.runtime import make_partition_fn
        window_fn = make_partition_fn(list(post_transformers), by, list(post_order_by))

    row_local = list(post_row_local or [])

    def merge_partition(left_t: pa.Table, right_t: pa.Table, _pid: int) -> pa.Table:
        left_t = left_t.take(pc.sort_indices(left_t, sort_keys=[(on, 'ascending')]))
        result = left_t
        if right_t.num_rows == 0 or left_t.num_rows == 0:
            for c in right_value_cols:
                result = result.append_column(out_names[c],
                                              pa.nulls(left_t.num_rows, right_schema.field(c).type))
        else:
            if right_dedupe_max is not None:
                right_t = _dedupe_max(right_t, by, right_on, right_dedupe_max)
            if max_right_rows_per_entity is not None:
                right_t = _cap_entity_history(right_t, by, right_on,
                                              max_right_rows_per_entity, _pid)
            right_t = right_t.take(pc.sort_indices(right_t, sort_keys=[(right_on, 'ascending')]))
            lframe = pd.DataFrame({**{k: left_t.column(k).to_pandas() for k in by},
                                   '__ts': left_t.column(on).to_pandas(),
                                   '__lidx': np.arange(left_t.num_rows)})
            rframe = pd.DataFrame({**{k: right_t.column(k).to_pandas() for k in by},
                                   '__ts': right_t.column(right_on).to_pandas(),
                                   '__ridx': np.arange(right_t.num_rows)})
            merged = pd.merge_asof(
                lframe, rframe, on='__ts', by=by, direction=direction,
                tolerance=None if tolerance_us is None else pd.Timedelta(microseconds=tolerance_us),
                allow_exact_matches=True)
            ridx = merged.sort_values('__lidx')['__ridx'].astype('Int64')
            take_idx = pa.Array.from_pandas(ridx.reset_index(drop=True), type=pa.int64())
            for c in right_value_cols:
                result = result.append_column(out_names[c], right_t.column(c).take(take_idx))
        if window_fn is not None:
            result = window_fn(result)
        for transformer in row_local:
            result = result.append_column(transformer.output_name, transformer.apply(result))
        return result

    if presplit is not None:
        from auto_featurs_ray.engine.runtime import cogroup_reduce_from_splits
        return cogroup_reduce_from_splits(presplit, merge_partition)
    return cogroup_map_partitions(left, right, by, num_partitions, merge_partition)


def range_join_aggregate(left, right, *, by: Sequence[str], on: str,
                         right_on: Optional[str] = None,
                         lo_us: int = 0, hi_us: int = 0,
                         value_column: Optional[str] = None,
                         aggs: Sequence[str] = ('count',),
                         prefix: str = '', num_partitions: int = 64,
                         max_right_rows_per_entity: Optional[int] = None):
    """Point-in-time range-join aggregation (engine extension; the reference
    ships only the backward as-of join): for every left row ``(entity, t)``,
    aggregate the right rows of the same entity whose time falls in
    ``[t + lo_us, t + hi_us)`` microseconds — e.g. ``lo_us=0,
    hi_us=30*24*3600*1e6`` counts/sums the entity's NEXT-30-days right rows
    (label construction), negative bounds give trailing windows over a
    second table.

    Supported ``aggs``: ``count``, ``sum``, ``mean`` (``sum``/``mean`` need
    ``value_column``).  These difference per-entity PREFIX aggregates at the
    two window edges — one sort plus two vectorized as-of lookups per
    partition, never a per-row scan — which is also why order-statistics
    (min/max) are not offered here: they don't difference; use the as-of
    join plus a rolling window stage for those.

    Scale shape: one co-group exchange hash-partitioned on ``by`` (the same
    partitioning the as-of join and window stages reuse); each reduce task
    handles only its partition's entities.  ``max_right_rows_per_entity``
    caps one entity's right history exactly as in :func:`asof_join`.

    Output columns: ``{prefix}{agg}`` (count) / ``{prefix}{value}_{agg}``.
    Empty windows: count 0, sum/mean NaN (SQL ``SUM``/``AVG`` over an empty
    set is NULL).
    """
    right_on = right_on or on
    by = list(by)
    aggs = list(aggs)
    need_value = [a for a in aggs if a in ('sum', 'mean')]
    if need_value and value_column is None:
        raise ValueError(f'aggs {need_value} need value_column')
    unknown = [a for a in aggs if a not in ('count', 'sum', 'mean')]
    if unknown:
        raise ValueError(f'unsupported range aggs {unknown}; supported: count/sum/mean '
                         '(prefix-differencable)')
    if not hi_us > lo_us:
        raise ValueError(f'empty window: [{lo_us}, {hi_us}) microseconds')

    def out_name(agg: str) -> str:
        return f'{prefix}{agg}' if agg == 'count' else f'{prefix}{value_column}_{agg}'

    def merge_partition(left_t: pa.Table, right_t: pa.Table, _pid: int) -> pa.Table:
        result = left_t
        n = left_t.num_rows
        if n == 0:
            for a in aggs:
                result = result.append_column(
                    out_name(a), pa.nulls(0, pa.int64() if a == 'count' else pa.float64()))
            return result
        if right_t.num_rows == 0:
            zeros = np.zeros(n, dtype=np.int64)
            nans = np.full(n, np.nan)
            for a in aggs:
                col = pa.array(zeros) if a == 'count' else pa.array(nans)
                result = result.append_column(out_name(a), col)
            return result
        if max_right_rows_per_entity is not None:
            right_t = _cap_entity_history(right_t, by, right_on,
                                          max_right_rows_per_entity, _pid)

        def _as_us(col: pa.ChunkedArray) -> np.ndarray:
            # timestamps and numerics both merge as int64/float64 scalars,
            # sidestepping pandas datetime-unit mismatches
            if pa.types.is_timestamp(col.type):
                return col.cast(pa.timestamp('us', tz=col.type.tz)).cast(pa.int64()).to_numpy(
                    zero_copy_only=False)
            return col.to_numpy(zero_copy_only=False)

        rsorted = right_t.take(pc.sort_indices(
            right_t, sort_keys=[(k, 'ascending') for k in by] + [(right_on, 'ascending')]))
        rframe = pd.DataFrame({k: rsorted.column(k).to_pandas() for k in by})
        rframe['__ts'] = _as_us(rsorted.column(right_on))
        grouped = rframe.groupby(by, sort=False, dropna=False)
        rframe['__ccount'] = grouped.cumcount() + 1
        if value_column is not None:
            vals = rsorted.column(value_column).cast(pa.float64()).to_pandas().fillna(0.0)
            rframe['__csum'] = vals.groupby(
                [rframe[k] for k in by], sort=False, dropna=False).cumsum()
            valid = (~rsorted.column(value_column).to_pandas().isna()).astype(np.int64)
            rframe['__cvalid'] = valid.groupby(
                [rframe[k] for k in by], sort=False, dropna=False).cumsum()

        # merge_asof needs the right frame sorted by the on-key GLOBALLY
        # (the per-entity cumulatives above are attached per row, so the
        # re-sort is safe)
        rframe = rframe.sort_values('__ts', kind='stable').reset_index(drop=True)

        lframe = pd.DataFrame({k: left_t.column(k).to_pandas() for k in by})
        lts = _as_us(left_t.column(on))
        lframe['__lidx'] = np.arange(n)

        def prefix_at(edge_us: int) -> pd.DataFrame:
            probe = lframe.copy()
            probe['__ts'] = lts + edge_us
            probe = probe.sort_values('__ts', kind='stable')
            # backward, exact NOT allowed -> last right row with ts < edge:
            # its running aggregates are the prefix F(edge)
            cols = ['__ccount'] + (['__csum', '__cvalid'] if value_column is not None else [])
            merged = pd.merge_asof(probe, rframe[by + ['__ts'] + cols], on='__ts',
                                   by=by, direction='backward', allow_exact_matches=False)
            return merged.sort_values('__lidx')[cols].fillna(0.0).reset_index(drop=True)

        at_hi = prefix_at(hi_us)
        at_lo = prefix_at(lo_us)
        count = (at_hi['__ccount'] - at_lo['__ccount']).to_numpy(dtype=np.int64)
        for a in aggs:
            if a == 'count':
                result = result.append_column(out_name(a), pa.array(count))
                continue
            s = (at_hi['__csum'] - at_lo['__csum']).to_numpy(dtype=np.float64)
            v = (at_hi['__cvalid'] - at_lo['__cvalid']).to_numpy(dtype=np.float64)
            with np.errstate(divide='ignore', invalid='ignore'):
                out = s if a == 'sum' else s / v
            out = np.where(v > 0, out, np.nan)
            result = result.append_column(
                out_name(a), pa.array(out, mask=np.isnan(out)))
        return result

    return cogroup_map_partitions(left, right, by, num_partitions, merge_partition)
