"""Distributed point-in-time (as-of) join.

The north-rule operator the reference lacks (SURVEY.md §2.7): for each left
row at time ``t`` with entity key ``k``, attach the latest right row with the
same key and ``ts_right <= t`` (direction='backward'; 'forward' gives the
earliest ``ts_right >= t``).

Physical plan — ONE all-to-all exchange, built on the engine's co-grouped
task shuffle (``cogroup_map_partitions``): both sides are hash-partitioned on
the entity key with the same partitioner as the window runtime; inside each
partition the matcher (:func:`_asof_match`) runs on the *key/ts columns
only*: one combined stable Arrow sort over ``(keys, ts, side)`` plus a
run-resetting ``np.maximum.accumulate`` scan — no pandas frames in the
reduce.  Right value columns are then attached with Arrow ``take`` — the
left table (incl. heavy ``tokens`` payloads) never leaves Arrow, so token
arrays stay byte-equal through the join.

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


def _ts_as_numeric(col, other_type_is_float: bool = False) -> np.ndarray:
    """Event-time column as a numpy scalar array: timestamps -> int64
    microseconds, ints -> int64, floats -> float64."""
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.timestamp('us', tz=col.type.tz)).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
    out = col.to_numpy(zero_copy_only=False)
    if other_type_is_float and out.dtype.kind != 'f':
        return out.astype(np.float64)
    return out


def _last_right_pos(is_right: np.ndarray, run_id: np.ndarray) -> np.ndarray:
    """Per row, the position of the LATEST preceding right row in the same
    run (-1 when none) — a run-resetting forward fill in one
    ``np.maximum.accumulate`` (the offset trick: runs are lifted onto
    disjoint value ranges so a carry can never leak across a boundary)."""
    m = len(is_right)
    pos = np.arange(m, dtype=np.int64)
    g = run_id * np.int64(m + 1)
    val = np.where(is_right, pos, np.int64(-1)) + g
    return np.maximum.accumulate(val) - g


def _asof_match(left_keys: pa.Table, lts: np.ndarray, right_keys: pa.Table,
                rts: np.ndarray, direction: str, allow_exact: bool = True) -> np.ndarray:
    """Vectorized grouped as-of matcher — pure Arrow sort + numpy scan, no
    pandas frames (round-4 verdict item 5): for each left row, the index of
    the matched RIGHT row (-1 = no match): the latest right row of the same
    key with ``ts_r <= t`` (backward) / earliest with ``ts_r >= t``
    (forward); strict inequality when ``allow_exact=False``.

    Both sides go unsorted into ONE combined stable Arrow sort on
    ``(keys..., ts, side)`` with the side bit ordered so ties are visible
    exactly when ``allow_exact``; a run-resetting accumulate then finds each
    left row's neighbor.  Among equal-ts right candidates the positionally
    LAST right row wins (``pd.merge_asof`` semantics, preserved by sort
    stability).  Null keys compare EQUAL to null keys — the engine-wide key
    convention (see :func:`_dedupe_max`), and what ``pd.merge_asof`` did on
    the object-dtype keys the previous implementation round-tripped."""
    nl, nr = len(lts), len(rts)
    if nl == 0 or nr == 0:
        return np.full(nl, -1, dtype=np.int64)
    by = list(left_keys.column_names)
    float_ts = lts.dtype.kind == 'f' or rts.dtype.kind == 'f'
    if float_ts:
        lts = lts.astype(np.float64)
        rts = rts.astype(np.float64)
    # side ordering: the tie row must be visible to the scan iff allow_exact.
    # backward scans earlier rows -> visible means right BEFORE left;
    # forward scans later rows -> visible means right AFTER left.
    right_first = allow_exact if direction == 'backward' else not allow_exact
    r_side, l_side = (0, 1) if right_first else (1, 0)
    rtab = pa.table({**{k: right_keys.column(k) for k in by},
                     '__ts': pa.array(rts),
                     '__side': pa.array(np.full(nr, r_side, np.int8)),
                     '__src': pa.array(np.arange(nr, dtype=np.int64))})
    ltab = pa.table({**{k: left_keys.column(k) for k in by},
                     '__ts': pa.array(lts),
                     '__side': pa.array(np.full(nl, l_side, np.int8)),
                     '__src': pa.array(np.arange(nl, dtype=np.int64))})
    comb = pa.concat_tables([rtab, ltab], promote_options='permissive')
    order = pc.sort_indices(comb, sort_keys=[(k, 'ascending') for k in by]
                            + [('__ts', 'ascending'), ('__side', 'ascending')])
    comb = comb.take(order)
    side = comb.column('__side').to_numpy(zero_copy_only=False)
    src = comb.column('__src').to_numpy(zero_copy_only=False)
    diff = _null_safe_run_diff(comb, by)
    run_id = np.concatenate(([0], np.cumsum(diff))).astype(np.int64)
    is_right = side == r_side
    if direction == 'backward':
        matched_pos = _last_right_pos(is_right, run_id)
    else:
        m = len(side)
        rid_rev = run_id[-1] - run_id[::-1]
        rev = _last_right_pos(is_right[::-1], rid_rev)
        matched_pos = np.where(rev >= 0, m - 1 - rev, np.int64(-1))[::-1]
    at_left = np.flatnonzero(side == l_side)
    p = matched_pos[at_left]
    ok = p >= 0
    out = np.full(nl, -1, dtype=np.int64)
    out[src[at_left]] = np.where(ok, src[np.maximum(p, 0)], np.int64(-1))
    return out


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
            lts = _ts_as_numeric(left_t.column(on))
            rts = _ts_as_numeric(right_t.column(right_on))
            ridx = _asof_match(left_t.select(by), lts, right_t.select(by), rts,
                               direction, allow_exact=True)
            if tolerance_us is not None:
                matched = ridx >= 0
                gap = np.abs(lts[matched].astype(np.int64)
                             - rts[np.maximum(ridx[matched], 0)].astype(np.int64))
                drop = np.zeros(len(ridx), dtype=bool)
                drop[np.flatnonzero(matched)[gap > tolerance_us]] = True
                ridx = np.where(drop, np.int64(-1), ridx)
            take_idx = pa.array(ridx, mask=ridx < 0)  # null index -> null value
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

        # per-entity running aggregates over the (key, ts)-sorted right side:
        # run-relative cumsums in numpy (no pandas frames in the reduce)
        rsorted = right_t.take(pc.sort_indices(
            right_t, sort_keys=[(k, 'ascending') for k in by] + [(right_on, 'ascending')]))
        nr = rsorted.num_rows
        diff = _null_safe_run_diff(rsorted, by) if nr > 1 else np.zeros(0, dtype=bool)
        starts = np.concatenate(([0], np.flatnonzero(diff) + 1))
        lengths = np.diff(np.concatenate((starts, [nr])))
        ccount = (np.arange(nr, dtype=np.int64)
                  - np.repeat(starts, lengths).astype(np.int64) + 1)
        if value_column is not None:
            raw = rsorted.column(value_column).cast(pa.float64()).to_numpy(zero_copy_only=False)
            vals = np.where(np.isnan(raw), 0.0, raw)
            cs = np.cumsum(vals)
            csum = cs - np.repeat(cs[starts] - vals[starts], lengths)
            ok = (~np.isnan(raw)).astype(np.int64)
            ck = np.cumsum(ok)
            cvalid = ck - np.repeat(ck[starts] - ok[starts], lengths)

        lts = _ts_as_numeric(left_t.column(on))
        rts = _ts_as_numeric(rsorted.column(right_on))
        lkeys = left_t.select(by)
        rkeys = rsorted.select(by)

        def prefix_at(edge_us: int):
            # last right row with ts < edge: its running aggregates are the
            # prefix F(edge); -1 (no earlier row) -> 0
            ridx = _asof_match(lkeys, lts + edge_us, rkeys, rts,
                               'backward', allow_exact=False)
            hit = ridx >= 0
            safe = np.maximum(ridx, 0)
            f_count = np.where(hit, ccount[safe], 0)
            if value_column is None:
                return f_count, None, None
            return (f_count, np.where(hit, csum[safe], 0.0),
                    np.where(hit, cvalid[safe], 0))

        hi_c, hi_s, hi_v = prefix_at(hi_us)
        lo_c, lo_s, lo_v = prefix_at(lo_us)
        count = (hi_c - lo_c).astype(np.int64)
        for a in aggs:
            if a == 'count':
                result = result.append_column(out_name(a), pa.array(count))
                continue
            s = (hi_s - lo_s).astype(np.float64)
            v = (hi_v - lo_v).astype(np.float64)
            with np.errstate(divide='ignore', invalid='ignore'):
                out = s if a == 'sum' else s / v
            out = np.where(v > 0, out, np.nan)
            result = result.append_column(
                out_name(a), pa.array(out, mask=np.isnan(out)))
        return result

    return cogroup_map_partitions(left, right, by, num_partitions, merge_partition)
