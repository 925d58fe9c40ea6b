"""Partitioned execution runtime: turning transformer layers into Ray Data stages.

Physical plan per pipeline layer (SURVEY.md §7 milestone 5):

1. **Partitioned window stages** — aggregating transformers grouped by their
   outermost ``over`` key set.  For each distinct key set the engine hashes
   the keys to ``P`` partitions inside the split tasks (vectorized siphash)
   and runs its own task shuffle (:func:`shuffle_map_partitions`: split tasks
   emit per-partition Arrow slices via zero-copy ``take``, one reduce task per
   partition concatenates and runs the stage fn) — one all-to-all exchange
   serves *all* features keyed on that entity set, with none of the fixed
   overhead of Ray Data's sort-based ``groupby``.  Inside each partition,
   rows are sorted by ``(keys, order_by)`` with
   ``pyarrow.compute.sort_indices`` + zero-copy ``take``; every aggregate for
   the stage is computed in one pass over the sorted partition.  Ungrouped
   order-dependent features parallelize by range-cutting the time index:
   rolling via halo context rows (:func:`apply_global_rolling_stage`),
   expanding/cumulative via carry-in prefix states
   (:func:`apply_global_cumulative_stage`), including cumulative
   mode/median/quantile (quantile's O(rows) exact carry is size-guarded —
   above ``cumcarry.HEAVY_CARRY_MAX_ROWS`` it warns and single-tasks).
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

import logging
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

logger = logging.getLogger(__name__)


def _warn_if_oversized(table: pa.Table, partition_id: int) -> None:
    """A reduce partition materializes as one in-memory Arrow table; surface
    hot-key skew / undersized partition counts instead of OOMing silently."""
    if table.nbytes > REDUCE_MEMORY_WARN_BYTES:
        logger.warning(
            'shuffle partition %d holds %.1f GiB in one reduce task; raise '
            'num_partitions (see suggest_num_partitions) or salt the hot key',
            partition_id, table.nbytes / (1 << 30))


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
    if values.dtype.kind == 'f':
        # NaN -> null at the Arrow boundary: kernels use NaN as the in-flight
        # missing marker, but the engine's output encoding is Arrow null
        # (DuckDB / reference-Polars NULL parity — e.g. seconds-since-last at
        # each group's first row).  pa.array(from_pandas=True) maps NaN->null.
        return pa.array(values, from_pandas=True)
    return pa.array(values)


def _canonical_key_array(column: pa.ChunkedArray) -> pa.ChunkedArray:
    """Cast a join/shuffle key to its canonical physical type.

    pandas' siphash is representation-sensitive: int32(-5) != int64(-5) and
    int(7) != float(7.0), so equal keys arriving with different physical types
    on two sides of an exchange would land in different partitions (silently
    missing join matches).  Normalize: any integer -> int64, any float ->
    float64, dictionary -> decoded values.
    """
    t = column.type
    if pa.types.is_dictionary(t):
        column = column.cast(t.value_type)
        t = column.type
    if pa.types.is_integer(t) and t != pa.int64():
        return column.cast(pa.int64())
    if pa.types.is_floating(t) and t != pa.float64():
        return column.cast(pa.float64())
    return column


def hash_partition_codes(table: pa.Table, key_columns: Sequence[str], num_partitions: int) -> np.ndarray:
    """Deterministic hash of the key columns -> [0, num_partitions)."""
    acc = np.zeros(table.num_rows, dtype=np.uint64)
    for name in key_columns:
        # siphash with pandas' fixed default key: deterministic across batches,
        # processes and nodes — safe as a shuffle key.
        series = _canonical_key_array(table.column(name)).to_pandas()
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


def split_block_by_code(table: pa.Table, codes: np.ndarray, num_partitions: int):
    """Split one Arrow block into per-partition sub-tables.

    Each sub-table is materialized with ``take`` (not a slice view): pickling
    a *sliced* Arrow list array ships the entire child buffer, which would
    amplify heavy payload columns num_partitions-fold through the shuffle.
    """
    order = np.argsort(codes, kind='stable')
    sorted_codes = codes[order]
    bounds = np.searchsorted(sorted_codes, np.arange(num_partitions + 1))
    return [table.take(pa.array(order[bounds[p]:bounds[p + 1]])) for p in range(num_partitions)]


BLOCKS_PER_SPLIT_TASK = 4
TARGET_PARTITION_BYTES = 512 << 20
REDUCE_MEMORY_WARN_BYTES = 4 << 30
#: below this many rows a GLOBAL rolling feature runs as one reduce task —
#: the halo exchange's fixed cost dominates tiny inputs
GLOBAL_ROLLING_MIN_ROWS = 2_000_000
#: distinct-key count above which compute_grouped_broadcast_states warns —
#: the combined map is driver-held and broadcast whole, meant for low card
BROADCAST_KEYS_WARN = 100_000


def _coalesce_split_input(blocks) -> pa.Table:
    """Concat a split task's input blocks, dropping schema-less empties.

    Ray Data's ``map_batches`` can emit a zero-row bundle with NO schema for
    an empty input block; keying such a block would raise (the key column
    "doesn't exist").  They carry no rows, so they are simply dropped; if
    every block is schema-less the caller gets a zero-column table and must
    short-circuit."""
    real = [b for b in blocks if b.num_columns]
    if not real:
        return blocks[0]
    return real[0] if len(real) == 1 else pa.concat_tables(real, promote_options='permissive')


def _concat_slices(parts, partition_id: int) -> pa.Table:
    """Concat one partition's slices, preferring a schema-carrying empty over
    a schema-less one when the partition has no rows at all."""
    non_empty = [s for s in parts if s.num_rows]
    if not non_empty:
        with_schema = [s for s in parts if s.num_columns]
        non_empty = with_schema[:1] or list(parts[:1])
    table = pa.concat_tables(non_empty, promote_options='permissive')
    _warn_if_oversized(table, partition_id)
    return table


def suggest_num_partitions(input_bytes: int, target_partition_bytes: int = TARGET_PARTITION_BYTES,
                           minimum: int = 8, maximum: int = 65536) -> int:
    """Partition count sized to the data, not a constant: ~target bytes per
    reduce partition so one partition's concat stays well inside a worker's
    heap at any input scale (the round-1 default of 64 was a constant)."""
    return int(np.clip(-(-int(input_bytes) // target_partition_bytes), minimum, maximum))


def _launch_split_tasks(ds, split_task, num_partitions: int):
    """Launch coalesced split tasks as the upstream scan streams.

    Blocks are consumed from the streaming executor via ref bundles and
    handed to a split task every BLOCKS_PER_SPLIT_TASK blocks, so split work
    overlaps the scan and finished input blocks can be released instead of
    all co-residing in the object store behind a to_arrow_refs() barrier
    (round-1 verdict item 5).  Coalescing keeps the B x P intermediate-object
    count bounded; per-object fetch overhead dominates when B explodes.
    """
    out = []
    group: list = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            group.append(block_ref)
            if len(group) >= BLOCKS_PER_SPLIT_TASK:
                out.append(split_task.options(num_returns=num_partitions).remote(*group))
                group = []
    if group:
        out.append(split_task.options(num_returns=num_partitions).remote(*group))
    return out


def shuffle_map_partitions(ds, key_columns: Sequence[str], num_partitions: int, partition_fn):
    """Explicit two-stage hash shuffle: map tasks split each input block by
    ``hash(keys) % P``; one reduce task per partition concatenates its slices
    and runs ``partition_fn`` on the complete partition.

    Ray Data's built-in sort-based ``groupby`` pays a sampling + sort barrier
    whose fixed overhead dominates at high parallelism; this exchange is the
    classic map/reduce shuffle on raw Ray tasks — measured several times
    faster and scaling with CPUs — while both ends stay ``ray.data.Dataset``s
    (``to_arrow_refs`` -> tasks -> ``from_arrow_refs``).  Like any all-to-all,
    one shuffle's worth of blocks lives in the object store (spilling to disk
    under pressure).
    """
    import ray
    import ray.data

    key_columns = list(key_columns)

    @ray.remote
    def split_task(*blocks: pa.Table):
        block = _coalesce_split_input(blocks)
        if block.num_columns == 0:
            return tuple(block.slice(0, 0) for _ in range(num_partitions))
        codes = hash_partition_codes(block, key_columns, num_partitions)
        return tuple(split_block_by_code(block, codes, num_partitions))

    @ray.remote
    def reduce_task(partition_id: int, *slices: pa.Table) -> pa.Table:
        table = _concat_slices(slices, partition_id)
        if table.num_columns == 0:
            # every input block was a schema-less empty bundle — there is no
            # schema to key or reduce on; propagate the empty
            return table
        return partition_fn(table, partition_id)

    if num_partitions == 1 or not key_columns:
        block_refs = ds.to_arrow_refs()
        if not block_refs:
            return ds
        out_refs = [reduce_task.remote(0, *block_refs)]
    else:
        # coalesced split tasks launched while upstream blocks stream in: the
        # shuffle creates B x P intermediate objects and per-object fetch
        # overhead dominates when B explodes, so ~4 blocks go to one map task
        split_refs = _launch_split_tasks(ds, split_task, num_partitions)
        if not split_refs:
            return ds
        out_refs = [reduce_task.remote(p, *[splits[p] for splits in split_refs])
                    for p in range(num_partitions)]
    return ray.data.from_arrow_refs(out_refs)


def cogroup_launch_splits(left_ds, right_ds, key_columns: Sequence[str], num_partitions: int):
    """Phase 1 of the co-grouped exchange: launch both sides' split tasks.

    Returns an opaque handle for :func:`cogroup_reduce_from_splits`.  Split
    work proceeds in the background, so driver-side work that must finish
    before the reduce closure exists (e.g. computing broadcast lookup states)
    can overlap the scan+split instead of serializing in front of it.
    """
    import ray

    key_columns = list(key_columns)

    @ray.remote
    def split_task(*blocks: pa.Table):
        block = _coalesce_split_input(blocks)
        if block.num_columns == 0:
            return tuple(block.slice(0, 0) for _ in range(num_partitions))
        codes = hash_partition_codes(block, key_columns, num_partitions)
        return tuple(split_block_by_code(block, codes, num_partitions))

    @ray.remote
    def read_split_task(*paths: str):
        import pyarrow.parquet as pq
        block = pa.concat_tables([pq.read_table(p) for p in paths], promote_options='permissive')
        codes = hash_partition_codes(block, key_columns, num_partitions)
        return tuple(split_block_by_code(block, codes, num_partitions))

    def splits_for(side):
        if isinstance(side, (list, tuple)):  # parquet shard paths: fused scan+split
            groups = np.array_split(np.arange(len(side)), max(1, min(len(side), 32)))
            return [read_split_task.options(num_returns=num_partitions).remote(
                *[side[i] for i in group]) for group in groups if len(group)]
        return _launch_split_tasks(side, split_task, num_partitions)

    def refs_for(side):
        if isinstance(side, (list, tuple)):
            import ray.data as rd
            return rd.read_parquet(list(side)).to_arrow_refs()
        return side.to_arrow_refs()

    if num_partitions == 1:
        left_refs = refs_for(left_ds)
        right_refs = refs_for(right_ds)
        return {'mode': 'single', 'left': left_refs, 'right': right_refs,
                'num_partitions': num_partitions}
    return {'mode': 'split', 'left': splits_for(left_ds), 'right': splits_for(right_ds),
            'num_partitions': num_partitions}


def cogroup_reduce_from_splits(handle: dict, partition_fn):
    """Phase 2: launch one reduce task per co-located partition pair."""
    import ray
    import ray.data

    num_partitions = handle['num_partitions']

    @ray.remote
    def reduce_task(partition_id: int, n_left: int, *slices: pa.Table) -> pa.Table:
        left = _concat_slices(slices[:n_left], partition_id)
        if left.num_columns == 0:
            # schema-less empty left side: nothing to join/filter against
            return left
        return partition_fn(left, _concat_slices(slices[n_left:], partition_id), partition_id)

    if handle['mode'] == 'single':
        left_refs, right_refs = handle['left'], handle['right']
        out_refs = [reduce_task.remote(0, len(left_refs), *left_refs, *right_refs)]
    else:
        left_splits, right_splits = handle['left'], handle['right']
        out_refs = [
            reduce_task.remote(p, len(left_splits),
                               *[s[p] for s in left_splits], *[s[p] for s in right_splits])
            for p in range(num_partitions)
        ]
    return ray.data.from_arrow_refs(out_refs)


def cogroup_map_partitions(left_ds, right_ds, key_columns: Sequence[str], num_partitions: int,
                           partition_fn):
    """Co-partition two datasets on the same key and reduce pairwise.

    ``partition_fn(left_table, right_table, partition_id)`` receives the
    complete co-located partitions of both sides — the primitive behind the
    as-of join (and any partitioned join): one exchange, no union/schema
    alignment, each side's blocks ride through untouched.

    Either side may be given as a list of parquet file paths instead of a
    Dataset: the split tasks then read the shards directly (fused scan+split),
    skipping one full object-store round-trip of the raw input.
    """
    handle = cogroup_launch_splits(left_ds, right_ds, key_columns, num_partitions)
    return cogroup_reduce_from_splits(handle, partition_fn)


def apply_window_stage(ds, transformers: Sequence[AggregatingTransformer], key_columns: Sequence[str],
                       order_by: Sequence[str], num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Hash-partition by ``key_columns`` and run all aggregates in one pass."""
    fn = make_partition_fn(transformers, key_columns, order_by)
    effective = num_partitions if key_columns else 1
    return shuffle_map_partitions(ds, key_columns, effective, lambda table, _pid: fn(table))


def _sample_time_cuts(ds, index_column: str, num_partitions: int):
    """(cut points, total row count) for the index column.  Cuts are sampled
    quantiles: a strided per-batch sample (≤16 values per block) collected on
    the driver — tiny at any corpus size — then P-1 quantiles weighted by each
    block's row count (a block's sampled values stand in for all its rows, so
    uneven block sizes would otherwise skew the cuts).  Weighting affects
    partition BALANCE only; results are bit-identical for any cut choice.
    The exact row total rides along for the size-based plan choice."""
    from auto_featurs_ray.engine.aggframe import AggFrame

    def sample(batch: pa.Table) -> pa.Table:
        ts = AggFrame(batch).timestamps_us(index_column)
        if len(ts) == 0:
            return pa.table({'s': pa.array([], pa.int64()), 'n': pa.array([], pa.int64())})
        # <=16 values per batch bounds the driver-side sample at ~16 x
        # num_blocks rows (a 10^6-block corpus ships ~128 MB, not the data)
        stride = max(1, len(ts) // 16)
        picked = ts[::stride][:16]
        # each picked value represents len(ts)/len(picked) rows of its block
        n = np.full(len(picked), len(ts) // len(picked), dtype=np.int64)
        n[0] += len(ts) - int(n.sum())
        return pa.table({'s': pa.array(picked), 'n': pa.array(n)})

    rows = ds.map_batches(sample, batch_format='pyarrow').take_all()
    total = int(sum(r['n'] for r in rows))
    vals = np.array([r['s'] for r in rows], dtype=np.int64)
    wts = np.array([r['n'] for r in rows], dtype=np.int64)
    if len(vals) < 2 or num_partitions <= 1:
        return np.array([], dtype=np.int64), total
    order = np.argsort(vals, kind='stable')
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    targets = np.linspace(0, 1, num_partitions + 1)[1:-1] * cum[-1]
    qs = vals[np.minimum(np.searchsorted(cum, targets, side='left'), len(vals) - 1)]
    return np.unique(qs), total


def apply_global_rolling_stage(ds, transformers: Sequence[AggregatingTransformer],
                               order_by: Sequence[str],
                               num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Range-partitioned GLOBAL rolling windows with halo context rows.

    An ungrouped rolling feature previously funneled the whole dataset
    through ONE reduce task (global trailing windows need their time
    neighborhood) — a single-core wall at scale.  Trailing windows are
    window-local: the anchor at time t only reads rows in ``(t - period,
    t]``, so the index range is cut into ``num_partitions`` sampled-quantile
    spans and every row whose timestamp falls within ``max(period)`` BEFORE a
    cut is ALSO shipped to the next span as a context row (computed over,
    never emitted).  Each reduce then evaluates the full transformer group
    over its span + halo and emits only its own rows — bit-identical to the
    single-task result, P-way parallel.  Rows sharing a timestamp land in
    one span by construction (cuts compare on the timestamp), preserving the
    anchor-at-last-duplicate window semantics.
    """
    from auto_featurs_ray.engine.aggframe import AggFrame

    index_column = transformers[0].index_column_name
    window_us = np.int64(max(t._period_us for t in transformers))
    cuts, total_rows = _sample_time_cuts(ds, index_column, num_partitions)
    if len(cuts) == 0 or total_rows < GLOBAL_ROLLING_MIN_ROWS:
        # size-based plan choice: below this, the halo exchange's fixed cost
        # exceeds the single reduce task's whole runtime (measured ~2x slower
        # at 10^5 rows); at scale the single task is the wall instead
        fn = make_partition_fn(transformers, [], order_by)
        return shuffle_map_partitions(ds, [], 1, lambda table, _pid: fn(table))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({})
        ts = AggFrame(batch).timestamps_us(index_column)
        part = np.searchsorted(cuts, ts, side='right').astype(np.int64)
        pieces = [batch.append_column('__rw_part', pa.array(part))
                       .append_column('__rw_ctx', pa.array(np.zeros(len(ts), dtype=bool)))]
        for j, cut in enumerate(cuts):
            # context for span j+1: rows inside (cut - window, cut); the
            # window is open on the left so ts == cut - window is never read
            mask = (ts > cut - window_us) & (ts < cut)
            if mask.any():
                halo = batch.filter(pa.array(mask))
                n = halo.num_rows
                pieces.append(halo.append_column('__rw_part', pa.array(np.full(n, j + 1)))
                                  .append_column('__rw_ctx', pa.array(np.ones(n, dtype=bool))))
        return pa.concat_tables(pieces, promote_options='permissive')

    sort_keys = [('__rw_part', 'ascending')] + [(c, 'ascending') for c in order_by]

    def run(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({})
        keys = [(c, d) for c, d in sort_keys if c in table.column_names]
        table = table.take(pc.sort_indices(table, sort_keys=keys))
        parts = table.column('__rw_part').to_numpy(zero_copy_only=False)
        ctx = table.column('__rw_ctx').to_numpy(zero_copy_only=False)
        body = table.drop_columns(['__rw_part', '__rw_ctx'])
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(parts) != 0) + 1, [len(parts)]))
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = body.slice(s, e - s)
            frame = AggFrame(seg)
            out = seg
            for t in transformers:
                out = out.append_column(t.output_name, _to_arrow_column(t.compute(frame, None)))
            keep = ~ctx[s:e]
            outs.append(out.filter(pa.array(keep)))
        return pa.concat_tables(outs, promote_options='permissive')

    assigned = ds.map_batches(assign, batch_format='pyarrow')
    return shuffle_map_partitions(assigned, ['__rw_part'], num_partitions, run)


#: below this many rows an UNGROUPED cumulative/order-aware group runs as one
#: reduce task — the range exchange's fixed cost dominates tiny inputs
GLOBAL_CUM_MIN_ROWS = 2_000_000


def apply_global_cumulative_stage(ds, transformers: Sequence[AggregatingTransformer],
                                  order_by: Sequence[str],
                                  num_partitions: int = DEFAULT_NUM_PARTITIONS,
                                  min_rows: Optional[int] = None):
    """Range-partitioned UNGROUPED expanding/cumulative aggregates with
    carry-in prefix states (see :mod:`auto_featurs_ray.engine.cumcarry`).

    The order column is cut into ``P`` sampled-quantile spans (rows sharing an
    order value land in one span); pass 1 sorts each span once and emits a
    tiny combinable state per transformer; the driver folds the states into
    per-span carries (prefix for cumulative, suffix for leads, global for
    NONE-mode whole-frame values — plus a second tiny state round for the std
    quirk and cumulative arg-extremes, whose carry-out depends on their
    carry-in); pass 2 re-reads each span's SORTED table from the object store
    (pass 1 returns it as a second object, so the sort happens once) and
    computes the output columns seeded with the carries.  Every transformer
    in ``transformers`` must have a carry handler
    (:func:`auto_featurs_ray.engine.cumcarry.handler_for`).
    """
    import ray
    import ray.data

    from auto_featurs_ray.engine import cumcarry

    order_by = list(order_by)
    handlers = [cumcarry.handler_for(t) for t in transformers]
    assert all(handlers), 'apply_global_cumulative_stage requires carry handlers'
    threshold = GLOBAL_CUM_MIN_ROWS if min_rows is None else min_rows

    try:
        cuts, total_rows = _sample_time_cuts(ds, order_by[0], num_partitions)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, KeyError):
        cuts, total_rows = np.array([], dtype=np.int64), 0
    if len(cuts) == 0 or total_rows < threshold:
        fn = make_partition_fn(transformers, [], order_by)
        return shuffle_map_partitions(ds, [], 1, lambda table, _pid: fn(table))

    heavy_idx = [i for i, h in enumerate(handlers) if getattr(h, 'heavy', False)]
    if heavy_idx and total_rows > cumcarry.HEAVY_CARRY_MAX_ROWS:
        # exact running quantile/median state is O(rows): above the cap the
        # parallel plan would fold the whole column on the driver and ship it
        # to every span — the single-task plan is the honest fallback
        heavy_ts = [transformers[i] for i in heavy_idx]
        logger.warning(
            'ungrouped cumulative order statistics (%s) need the FULL value '
            'prefix as carried state; at %d rows (> HEAVY_CARRY_MAX_ROWS=%d) '
            'they run as ONE reduce task — group the feature (over columns) '
            'or window it to parallelize at this scale',
            [type(t).__name__ for t in heavy_ts], total_rows,
            cumcarry.HEAVY_CARRY_MAX_ROWS)
        light = [t for i, t in enumerate(transformers) if i not in heavy_idx]
        if light:
            ds = apply_global_cumulative_stage(ds, light, order_by,
                                               num_partitions, min_rows)
        fn = make_partition_fn(heavy_ts, [], order_by)
        return shuffle_map_partitions(ds, [], 1, lambda table, _pid: fn(table))

    order_col = order_by[0]
    num_spans = len(cuts) + 1

    @ray.remote
    def split_task(*blocks: pa.Table):
        block = _coalesce_split_input(blocks)
        if block.num_columns == 0:
            return tuple(block.slice(0, 0) for _ in range(num_spans))
        ts = AggFrame(block).timestamps_us(order_col)
        codes = np.searchsorted(cuts, ts, side='right').astype(np.int64)
        return tuple(split_block_by_code(block, codes, num_spans))

    split_refs = _launch_split_tasks(ds, split_task, num_spans)
    if not split_refs:
        return ds

    sort_columns = list(order_by)
    # transformers hold expression lambdas (filtering conditions) — plain
    # pickle rejects them; cloudpickle is what Ray ships closures with anyway
    from ray import cloudpickle
    pickled = cloudpickle.dumps((transformers, handlers))

    @ray.remote(num_returns=2)
    def sort_and_state(partition_id: int, *slices: pa.Table):
        table = _concat_slices(slices, partition_id)
        if table.num_columns == 0 or table.num_rows == 0:
            return table, None
        table = sort_partition(table, [c for c in sort_columns if c in table.column_names])
        ts_list, hs = pickle.loads(pickled)
        frame = AggFrame(table)
        states = [h.span_state(t, frame) for t, h in zip(ts_list, hs)]
        return table, pickle.dumps(states)

    pairs = [sort_and_state.remote(p, *[splits[p] for splits in split_refs])
             for p in range(num_spans)]
    sorted_refs = [p[0] for p in pairs]
    raw_states = ray.get([p[1] for p in pairs])
    span_states = [pickle.loads(s) if s is not None else None for s in raw_states]

    def fold(idx: int, handler) -> list:
        """Per-span carry for transformer ``idx`` under the handler's scope."""
        t = transformers[idx]
        states = [ss[idx] if ss is not None else None for ss in span_states]
        scope = handler.scope(t)
        carries = [None] * num_spans
        if scope == 'prefix':
            acc = handler.identity(t)
            for p in range(num_spans):
                carries[p] = acc
                if states[p] is not None:
                    acc = handler.combine(t, acc, states[p])
        elif scope == 'suffix':
            acc = handler.identity(t)
            for p in range(num_spans - 1, -1, -1):
                carries[p] = acc
                if states[p] is not None:
                    acc = handler.combine(t, states[p], acc)
        else:  # global
            acc = handler.identity(t)
            for p in range(num_spans):
                if states[p] is not None:
                    acc = handler.combine(t, acc, states[p])
            carries = [acc] * num_spans
        return carries

    carries0 = [fold(i, h) for i, h in enumerate(handlers)]

    second = [i for i, h in enumerate(handlers) if h.rounds == 2]
    if second:
        sub = cloudpickle.dumps(([transformers[i] for i in second], [handlers[i] for i in second]))

        @ray.remote
        def state2_task(partition_id: int, table: pa.Table, carry_blob: bytes):
            if table.num_columns == 0 or table.num_rows == 0:
                return None
            ts_list, hs = pickle.loads(sub)
            frame = AggFrame(table)
            return pickle.dumps([h.span_state2(t, frame, c)
                                 for t, h, c in zip(ts_list, hs, pickle.loads(carry_blob))])

        blobs = [pickle.dumps([carries0[i][p] for i in second]) for p in range(num_spans)]
        raw2 = ray.get([state2_task.remote(p, sorted_refs[p], blobs[p]) for p in range(num_spans)])
        states2 = [pickle.loads(s) if s is not None else None for s in raw2]
        for j, i in enumerate(second):
            t, h = transformers[i], handlers[i]
            acc = h.identity2(t)
            carry2 = [None] * num_spans
            for p in range(num_spans):
                carry2[p] = acc
                if states2[p] is not None:
                    acc = h.combine2(t, acc, states2[p][j])
            carries0[i] = [(carries0[i][p], carry2[p]) for p in range(num_spans)]

    @ray.remote
    def finalize(partition_id: int, table: pa.Table, carry_blob: bytes) -> pa.Table:
        if table.num_columns == 0:
            return table
        ts_list, hs = pickle.loads(pickled)
        frame = AggFrame(table)
        out = table
        for t, h, carry in zip(ts_list, hs, pickle.loads(carry_blob)):
            out = out.append_column(t.output_name, _to_arrow_column(h.with_carry(t, frame, carry)))
        return out

    carry_blobs = [pickle.dumps([carries0[i][p] for i in range(len(transformers))])
                   for p in range(num_spans)]
    out_refs = [finalize.remote(p, sorted_refs[p], carry_blobs[p]) for p in range(num_spans)]
    return ray.data.from_arrow_refs(out_refs)


def apply_row_local_stage(ds, transformers: Sequence[RowLocalTransformer]):
    names = [t.output_name for t in transformers]

    def fused(batch: pa.Table) -> pa.Table:
        for transformer, name in zip(transformers, names):
            batch = batch.append_column(name, transformer.apply(batch))
        return batch

    return ds.map_batches(fused, batch_format='pyarrow', zero_copy_batch=True)


def compute_grouped_broadcast_states(ds, key_columns: Sequence[str], inners: Sequence) -> dict:
    """Partial-per-key pass + driver combine -> ``{key_tuple: [state, ...]}``.

    Feed a column-pruned dataset (just the key + value columns) — the partial
    pass is then a cheap scan regardless of how wide the full table is.

    CARDINALITY CONTRACT: the combined map lives on the driver and is
    broadcast whole to every consumer task, so this path is only correct to
    use for LOW-CARDINALITY keys (callers opt keys in explicitly, e.g. the
    flagship's ``broadcast_agg_keys`` for the zipf-hot ``source`` column).
    For high-cardinality keys use the shuffle path
    (:func:`apply_window_stage`) instead; a warning fires above
    ``BROADCAST_KEYS_WARN`` distinct keys.
    """
    key_columns = list(key_columns)

    def partials(batch: pa.Table) -> pa.Table:
        frame_codes = _batch_key_codes(batch, key_columns)
        states: dict = {}
        for key_value, sub in _iter_key_groups(batch, frame_codes, key_columns):
            states[key_value] = [pickle.dumps(inner.global_partial(sub)) for inner in inners]
        return pa.table({'state': [pickle.dumps(states)]})

    combined: dict = {}
    for row in ds.map_batches(partials, batch_format='pyarrow').take_all():
        for key_value, states in pickle.loads(row['state']).items():
            states = [pickle.loads(s) for s in states]
            if key_value not in combined:
                combined[key_value] = states
            else:
                combined[key_value] = [inner.global_combine(acc, s)
                                       for inner, acc, s in zip(inners, combined[key_value], states)]
    if len(combined) > BROADCAST_KEYS_WARN:
        logger.warning(
            'compute_grouped_broadcast_states combined %d distinct keys on the '
            'driver; the broadcast path is meant for low-cardinality keys — '
            'route this key set through the shuffle path (apply_window_stage) '
            'instead', len(combined))
    return combined


class BroadcastLookupFeature:
    """Row-local-style appender: per-key combined state -> per-row column.

    Quacks like a RowLocalTransformer (``output_name`` + ``apply``) so it can
    fuse into any map stage / reduce task; the (small) key->state map rides in
    the closure.
    """

    def __init__(self, over_transformer, states: dict, key_columns: Sequence[str],
                 which: int) -> None:
        self._transformer = over_transformer
        self._inner = over_transformer.inner_transformer
        self._states = states
        self._key_columns = list(key_columns)
        self._which = which

    @property
    def output_name(self) -> str:
        return self._transformer.output_name

    @property
    def output_column_specification(self):
        return self._transformer.output_column_specification

    def apply(self, batch: pa.Table):
        # prune to key + value columns before per-key takes: the finalize only
        # reads those, and taking the full (payload-carrying) table per key
        # would copy the heavy columns once per distinct key
        value_column = getattr(self._inner, '_column', None)
        needed = list(self._key_columns) + ([value_column] if value_column in batch.column_names else [])
        narrow = batch.select(needed)
        frame_codes = _batch_key_codes(narrow, self._key_columns)
        out = np.empty(batch.num_rows, dtype=object)
        for key_value, sub, mask in _iter_key_groups(narrow, frame_codes, self._key_columns,
                                                     with_mask=True):
            state = self._states[key_value][self._which]
            out[mask] = np.asarray(self._inner.global_finalize(state, sub))
        return pa.Array.from_pandas(pd.Series(out))


def apply_grouped_broadcast_stage(ds, transformers: Sequence, key_columns: Sequence[str]):
    """Skew-immune grouped NONE-mode aggregates: partial-per-key per batch ->
    driver combine -> broadcast key->value map into a second map_batches.

    This is what replaces "salting" for algebraic aggregates over hot keys
    (zipf-distributed ``source``): raw rows are never shuffled at all — each
    batch emits one partial per key it contains, the combine handles any skew
    in O(num_keys), and the hot key costs the same as a cold one.  Use only
    for LOW-cardinality keys (the key->state map is broadcast); entity-level
    keys belong on the partitioned window path.

    ``transformers`` are OverWrapper(inner) where every inner supports the
    global two-pass protocol.
    """
    import ray

    key_columns = list(key_columns)
    inners = [t.inner_transformer for t in transformers]

    def partials(batch: pa.Table) -> pa.Table:
        frame_codes = _batch_key_codes(batch, key_columns)
        states: dict = {}
        for key_value, sub in _iter_key_groups(batch, frame_codes, key_columns):
            states[key_value] = [pickle.dumps(inner.global_partial(sub)) for inner in inners]
        return pa.table({'state': [pickle.dumps(states)]})

    rows = ds.map_batches(partials, batch_format='pyarrow').take_all()
    combined: dict = {}
    for row in rows:
        for key_value, states in pickle.loads(row['state']).items():
            states = [pickle.loads(s) for s in states]
            if key_value not in combined:
                combined[key_value] = states
            else:
                combined[key_value] = [inner.global_combine(acc, s)
                                       for inner, acc, s in zip(inners, combined[key_value], states)]

    lookup_ref = ray.put(combined)

    def finalize(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        frame_codes = _batch_key_codes(batch, key_columns)
        outputs = {t.output_name: np.empty(batch.num_rows, dtype=object) for t in transformers}
        for key_value, sub, mask in _iter_key_groups(batch, frame_codes, key_columns, with_mask=True):
            states = lookup[key_value]
            for transformer, inner, state in zip(transformers, inners, states):
                values = np.asarray(inner.global_finalize(state, sub))
                outputs[transformer.output_name][mask] = values
        for name, values in outputs.items():
            batch = batch.append_column(name, pa.Array.from_pandas(pd.Series(values)))
        return batch

    return ds.map_batches(finalize, batch_format='pyarrow', zero_copy_batch=True)


def _batch_key_codes(batch: pa.Table, key_columns: Sequence[str]):
    frame = {c: batch.column(c).to_pandas() for c in key_columns}
    df = pd.DataFrame(frame)
    codes = df.groupby(key_columns, sort=False, dropna=False).ngroup().to_numpy()
    return df, codes


def _iter_key_groups(batch: pa.Table, frame_codes, key_columns, with_mask: bool = False):
    df, codes = frame_codes
    for code in np.unique(codes):
        mask = codes == code
        idx = np.flatnonzero(mask)
        first = df.iloc[idx[0]]
        key_value = tuple(first[c] for c in key_columns)
        key_value = tuple(None if (isinstance(v, float) and np.isnan(v)) else v for v in key_value)
        sub = batch.take(pa.array(idx))
        if with_mask:
            yield key_value, sub, mask
        else:
            yield key_value, sub


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


def _is_broadcast_over(transformer) -> bool:
    if not isinstance(transformer, OverWrapper):
        return False
    inner = transformer.inner_transformer
    return (not isinstance(inner, OverWrapper)
            and type(inner).__name__ != 'RollingWrapper'
            and getattr(inner, 'supports_global_two_pass', False)
            and getattr(inner, 'cumulative', CumulativeOptions.NONE) == CumulativeOptions.NONE)


def apply_layer(ds, transformers: Sequence[Transformer], order_by: Sequence[str],
                num_partitions: int = DEFAULT_NUM_PARTITIONS, allow_two_pass: bool = True,
                broadcast_agg_keys: frozenset = frozenset()):
    """Execute one pipeline layer: window stages, global stats, fused row-local map."""
    row_local = [t for t in transformers if isinstance(t, RowLocalTransformer)]
    aggregating = [t for t in transformers if isinstance(t, AggregatingTransformer)]

    two_pass = [t for t in aggregating if allow_two_pass and _is_global_two_pass(t)]
    partitioned = [t for t in aggregating if t not in two_pass]

    stages: dict = {}
    for t in partitioned:
        stages.setdefault(_stage_key(t), []).append(t)
    for key, group in stages.items():
        if key and set(key) <= set(broadcast_agg_keys) and all(_is_broadcast_over(t) for t in group):
            ds = apply_grouped_broadcast_stage(ds, group, list(key))
            continue
        if (not key and num_partitions > 1
                and all(type(t).__name__ == 'RollingWrapper' for t in group)
                and len({t.index_column_name for t in group}) == 1):
            # ungrouped rolling is window-local: range-partition with halo
            # context rows instead of one global reduce task
            ds = apply_global_rolling_stage(ds, group, order_by, num_partitions)
            continue
        if not key and num_partitions > 1 and order_by:
            # ungrouped expanding/cumulative and whole-frame order-aware
            # aggregates: range-partition with carry-in prefix states
            # (cumulative mode/median/quantile included — quantile's O(rows)
            # exact carry is size-guarded inside the stage)
            from auto_featurs_ray.engine import cumcarry
            supported = [t for t in group if cumcarry.handler_for(t) is not None
                         and type(t).__name__ != 'RollingWrapper']
            rest = [t for t in group if t not in supported]
            if supported:
                ds = apply_global_cumulative_stage(ds, supported, order_by, num_partitions)
            if rest:
                ds = apply_window_stage(ds, rest, [], order_by, num_partitions)
            continue
        ds = apply_window_stage(ds, group, list(key), order_by, num_partitions)
    if two_pass:
        ds = apply_global_two_pass_stage(ds, two_pass)
    if row_local:
        ds = apply_row_local_stage(ds, row_local)
    return ds
