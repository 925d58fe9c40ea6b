"""Token-payload operations for pre-tokenized training sequences.

The engine's input table carries ``tokens: list<int32>`` (BASELINE.json
``input_hint``); these are the data-pipeline operations that act on that
payload at 100 TB scale — all vectorized over the Arrow list layout (offsets +
flat values), no per-row Python in the hot path:

* :func:`token_array_hashes` — 64-bit content hash per row (polynomial over
  the flat values with per-row position powers, one ``reduceat``), suitable as
  an exact-dedup / shuffle key.
* :func:`exact_token_dedup` — drop rows whose token arrays are exact
  duplicates (min-id representative), one hash exchange.
* :func:`add_length_buckets` — length-bucket column for bucketed batching.
* :func:`truncate_tokens` — cap sequences at ``max_tokens`` (offset surgery,
  values gathered once).
* :class:`SequencePacker` — greedy batch-local packing of short sequences
  into fixed-size training contexts (map_batches actor stage).
* :func:`token_pair_counts` — corpus-wide adjacent-pair frequency table (the
  BPE merge-candidate counting step); map-side partials bound the exchange
  by pair cardinality, not token count.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HASH_BASE = np.uint64(0x100000001b3)
_HASH_SEED = np.uint64(0xcbf29ce484222325)
# independent second polynomial (different base+seed): dedup drops only on
# 126-bit agreement — a single 63-bit hash would collide (and silently delete
# non-duplicate sequences) at multi-billion-row scale
_HASH_BASE_2 = np.uint64(0x00000100000001B5)
_HASH_SEED_2 = np.uint64(0x84222325cbf29ce4)


def _list_layout(column: pa.ChunkedArray):
    """(flat_values, offsets) of a list<int32> column as NumPy arrays."""
    combined = column.combine_chunks()
    if isinstance(combined, pa.ChunkedArray):
        combined = combined.chunk(0) if combined.num_chunks else pa.array([], pa.list_(pa.int32()))
    offsets = combined.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = combined.values.to_numpy(zero_copy_only=False)
    return values, offsets


def token_array_hashes(column: pa.ChunkedArray, *, base: np.uint64 = _HASH_BASE,
                       seed: np.uint64 = _HASH_SEED) -> np.ndarray:
    """Deterministic 64-bit hash of each row's token array (vectorized).

    Polynomial hash ``seed + sum(v_i * B^pos_i) mod 2^64`` with the position
    reset per row, mixed with the row length — computed with one reduceat over
    the flat values buffer.
    """
    values, offsets = _list_layout(column)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    if len(values) == 0:
        return (seed + lengths.astype(np.uint64) * base).astype(np.int64)
    positions = np.arange(len(values), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    powers = base ** positions.astype(np.uint64)  # wraps mod 2^64
    terms = (values.astype(np.uint64) + np.uint64(1)) * powers
    sums = np.zeros(n, dtype=np.uint64)
    non_empty = lengths > 0
    starts = offsets[:-1][non_empty]
    sums[non_empty] = np.add.reduceat(terms, starts)
    mixed = (seed + sums) * base + lengths.astype(np.uint64)
    return (mixed & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def add_token_hash(batch: pa.Table, tokens_column: str = 'tokens',
                   out_column: str = 'token_hash') -> pa.Table:
    return batch.append_column(out_column, pa.array(token_array_hashes(batch.column(tokens_column))))


def exact_token_dedup(ds, *, tokens_column: str = 'tokens', id_column: str = 'doc_id',
                      num_partitions: int = 32):
    """Drop rows with exactly-duplicate token arrays (keep the min-id row).

    Rows are dropped only when TWO independent 63-bit polynomial hashes agree
    (~126 collision bits): hash-only equality on one 63-bit key is
    statistically expected to collide at multi-billion-row scale and would
    silently delete non-duplicate sequences.
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions, sort_partition

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(tokens_column)
        batch = batch.append_column('__tok_hash', pa.array(token_array_hashes(col)))
        return batch.append_column('__tok_hash2', pa.array(
            token_array_hashes(col, base=_HASH_BASE_2, seed=_HASH_SEED_2)))

    def keep_first(table: pa.Table, _pid: int) -> pa.Table:
        table = sort_partition(table, ['__tok_hash', '__tok_hash2', id_column])
        h1 = table.column('__tok_hash').to_numpy(zero_copy_only=False)
        h2 = table.column('__tok_hash2').to_numpy(zero_copy_only=False)
        if len(h1):
            first = np.concatenate(([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])))
        else:
            first = np.array([], bool)
        return table.filter(pa.array(first)).drop_columns(['__tok_hash', '__tok_hash2'])

    hashed = ds.map_batches(add_hash, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(hashed, ['__tok_hash'], num_partitions, keep_first)


def token_pair_counts(ds, *, tokens_column: str = 'tokens', min_count: int = 1,
                      num_partitions: int = 16):
    """Corpus-wide adjacent-token-pair frequency table — the merge-candidate
    counting step of BPE/WordPiece vocabulary training, shaped for any corpus
    size: every batch pre-aggregates its pairs to ONE row per distinct pair
    (bijective 64-bit pair codes + ``np.unique``), so the only exchange moves
    ``(t1, t2, partial_count)`` rows bounded by pair cardinality x blocks —
    never by token count — and one reduce task per partition sums partials.
    Pairs never cross row boundaries.  Output: ``(t1, t2, pair_count)``
    int64, pruned to ``pair_count >= min_count``.
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    if min_count < 1:
        raise ValueError(f'min_count must be >= 1, got {min_count}')

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({'t1': pa.array([], pa.int64()), 't2': pa.array([], pa.int64()),
                          'c': pa.array([], pa.int64())})
        values, offsets = _list_layout(batch.column(tokens_column))
        base = offsets[0]
        values = values[base:offsets[-1]]
        offsets = offsets - base
        if len(values) < 2:
            return empty
        left = values[:-1].astype(np.int64)
        right = values[1:].astype(np.int64)
        mask = np.ones(len(values) - 1, dtype=bool)
        bounds = offsets[1:-1] - 1          # position i where i+1 starts a new row
        mask[bounds[bounds >= 0]] = False
        codes = ((left << 32) | (right & np.int64(0xFFFFFFFF)))[mask]
        if len(codes) == 0:
            return empty
        uniq, counts = np.unique(codes, return_counts=True)
        t1 = uniq >> 32
        t2 = (uniq & np.int64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
        return pa.table({'t1': pa.array(t1), 't2': pa.array(t2),
                         'c': pa.array(counts.astype(np.int64))})

    def combine(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({'t1': pa.array([], pa.int64()), 't2': pa.array([], pa.int64()),
                             'pair_count': pa.array([], pa.int64())})
        grouped = table.group_by(['t1', 't2']).aggregate([('c', 'sum')])
        out = pa.table({'t1': grouped.column('t1'), 't2': grouped.column('t2'),
                        'pair_count': grouped.column('c_sum').cast(pa.int64())})
        if min_count > 1:
            out = out.filter(pc.greater_equal(out.column('pair_count'), min_count))
        return out

    partials = ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(partials, ['t1', 't2'], num_partitions, combine)


def add_length_buckets(ds, *, length_column: str = 'n_tok',
                       boundaries: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
                       out_column: str = 'length_bucket'):
    """Bucket index per row (``searchsorted`` over ``boundaries``) for
    length-bucketed training batches."""
    bounds = np.asarray(sorted(boundaries), dtype=np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        lengths = batch.column(length_column).cast(pa.int64()).to_numpy(zero_copy_only=False)
        buckets = np.searchsorted(bounds, lengths, side='right').astype(np.int32)
        return batch.append_column(out_column, pa.array(buckets))

    return ds.map_batches(bucketize, batch_format='pyarrow', zero_copy_batch=True)


def truncate_tokens(ds, *, tokens_column: str = 'tokens', length_column: Optional[str] = 'n_tok',
                    max_tokens: int = 512):
    """Cap every sequence at ``max_tokens`` (vectorized offset surgery)."""

    def truncate(batch: pa.Table) -> pa.Table:
        values, offsets = _list_layout(batch.column(tokens_column))
        lengths = np.diff(offsets)
        new_lengths = np.minimum(lengths, max_tokens)
        if (new_lengths == lengths).all():
            return batch
        keep = np.zeros(len(values), dtype=bool)
        row_of = np.repeat(np.arange(len(lengths)), lengths)
        positions = np.arange(len(values)) - np.repeat(offsets[:-1], lengths)
        keep = positions < max_tokens
        new_values = values[keep]
        new_offsets = np.concatenate(([0], np.cumsum(new_lengths))).astype(np.int32)
        arr = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()),
                                       pa.array(new_values, pa.int32()))
        batch = batch.set_column(batch.column_names.index(tokens_column), tokens_column, arr)
        if length_column and length_column in batch.column_names:
            batch = batch.set_column(batch.column_names.index(length_column), length_column,
                                     pa.array(new_lengths.astype(np.int32), pa.int32()))
        return batch

    return ds.map_batches(truncate, batch_format='pyarrow', zero_copy_batch=True)


class SequencePacker:
    """Greedy batch-local packing of sequences into fixed training contexts.

    Emits one row per packed context: concatenated ``tokens`` (<=
    ``context_len``), the member doc ids and the boundary offsets.  Packing is
    batch-local (first-fit in arrival order) — cross-batch carryover is
    deliberately avoided so the stage stays stateless and resumable; feed
    length-bucketed, shuffled batches for high fill rates.  Use as
    ``ds.map_batches(SequencePacker, fn_constructor_kwargs=..., concurrency=N,
    batch_format='pyarrow')``.
    """

    def __init__(self, context_len: int = 2048, tokens_column: str = 'tokens',
                 id_column: str = 'doc_id') -> None:
        self.context_len = context_len
        self.tokens_column = tokens_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, offsets = _list_layout(batch.column(self.tokens_column))
        lengths = np.minimum(np.diff(offsets), self.context_len).astype(np.int64)
        ids = batch.column(self.id_column)

        packs: List[List[int]] = []
        fill: List[int] = []
        for row, length in enumerate(lengths):
            for target in range(len(packs)):  # first-fit in arrival order
                if fill[target] + length <= self.context_len:
                    packs[target].append(row)
                    fill[target] += int(length)
                    break
            else:
                packs.append([row])
                fill.append(int(length))

        # token payloads move as ONE flat gather over the values buffer —
        # never through Python ints
        member_rows = np.array([r for members in packs for r in members], dtype=np.int64)
        member_lens = lengths[member_rows] if len(member_rows) else np.zeros(0, np.int64)
        gather = (np.concatenate([np.arange(offsets[r], offsets[r] + lengths[r])
                                  for r in member_rows])
                  if len(member_rows) else np.zeros(0, np.int64))
        pack_sizes = np.array([len(m) for m in packs], dtype=np.int64)
        tokens_per_pack = (np.add.reduceat(member_lens, np.concatenate(
            ([0], np.cumsum(pack_sizes)[:-1]))) if len(packs) else np.zeros(0, np.int64))
        tok_offsets = np.concatenate(([0], np.cumsum(tokens_per_pack))).astype(np.int32)
        tokens_arr = pa.ListArray.from_arrays(pa.array(tok_offsets, pa.int32()),
                                              pa.array(values[gather], pa.int32()))
        id_offsets = np.concatenate(([0], np.cumsum(pack_sizes))).astype(np.int32)
        member_ids = pa.ListArray.from_arrays(pa.array(id_offsets, pa.int32()),
                                              ids.take(pa.array(member_rows)).combine_chunks())
        # per-pack member boundary offsets (small control data)
        bounds = [np.concatenate(([0], np.cumsum(member_lens[id_offsets[i]:id_offsets[i + 1]])))
                  for i in range(len(packs))]
        return pa.table({
            'tokens': tokens_arr,
            'member_ids': member_ids,
            'boundaries': pa.array([b.tolist() for b in bounds], pa.list_(pa.int32())),
            'fill_ratio': pa.array(tokens_per_pack / self.context_len, pa.float64()),
        })


def concat_chunk_tokens(ds, *, tokens_column: str = 'tokens', id_column: str = 'doc_id',
                        context_len: int = 2048, eod_token: int = -1,
                        num_parts: int = 8, num_partitions: int = 16):
    """GPT-style concat-and-chunk packing: documents are deterministically
    assigned to ``num_parts`` streams (non-negative modulo, SQL
    ``((id % n) + n) % n`` — an EXPLICIT, SQL-replayable rule rather than
    the engine's siphash partitioner,
    because chunk contents depend on the assignment), each stream
    concatenates its docs in id order with ``eod_token`` appended after
    every document, and the concatenation slices into fixed
    ``context_len`` chunks; each stream's tail remainder (< context_len
    tokens) is dropped — the standard LM pre-training trade.  Identical
    output on any cluster shape or block layout.

    Contrast with :class:`SequencePacker` (first-fit whole-document bin
    packing, no document splits): concat-chunk splits documents across
    chunk boundaries but wastes zero tokens except the per-stream tail.

    Returns ``(part, chunk_id, tokens: list<int32>, n_tok)`` where every
    ``n_tok == context_len``.
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    if context_len < 1:
        raise ValueError(f'context_len must be >= 1, got {context_len}')
    if num_parts < 1:
        raise ValueError(f'num_parts must be >= 1, got {num_parts}')

    def assign(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_column), pa.int64()).to_numpy(zero_copy_only=False)
        # true non-negative modulo (numpy/Python sign semantics): negative ids
        # land in the same stream as SQL's ((id % n) + n) % n — the previous
        # 2^63-1 mask silently re-routed negative ids off the documented rule
        part = pa.array((ids % np.int64(num_parts)).astype(np.int64))
        return batch.append_column('part', part)

    def chunk(table: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'part': pa.array([], pa.int64()),
                          'chunk_id': pa.array([], pa.int64()),
                          'tokens': pa.array([], pa.list_(pa.int32())),
                          'n_tok': pa.array([], pa.int32())})
        if table.num_rows == 0 or table.num_columns == 0:
            return empty
        table = table.take(pc.sort_indices(table, sort_keys=[('part', 'ascending'),
                                                             (id_column, 'ascending')]))
        col = table.column(tokens_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        flat = col.values.to_numpy(zero_copy_only=False)[base:offsets[-1]].astype(np.int32)
        lens = np.diff(offsets)
        # EOD after each doc: insert before each doc-end position
        flat = np.insert(flat, (offsets[1:] - base), np.int32(eod_token))
        lens_e = lens + 1
        parts = table.column('part').to_numpy(zero_copy_only=False)
        run_start = np.r_[True, parts[1:] != parts[:-1]]
        doc_starts = np.flatnonzero(run_start)
        part_vals = parts[doc_starts]
        tok_counts = np.add.reduceat(lens_e, doc_starts)
        tok_starts = np.r_[0, np.cumsum(tok_counts)[:-1]]
        n_chunks = tok_counts // context_len
        total_chunks = int(n_chunks.sum())
        if total_chunks == 0:
            return empty
        # gather indices: for each part, tok_starts[p] + arange(n_chunks[p]*CL)
        chunk_part = np.repeat(part_vals, n_chunks)
        chunk_id = np.concatenate([np.arange(k, dtype=np.int64) for k in n_chunks if k > 0])
        spans = np.repeat(tok_starts, n_chunks * context_len)
        within = np.concatenate([np.arange(k * context_len, dtype=np.int64)
                                 for k in n_chunks if k > 0])
        gathered = flat[spans + within]
        list_offsets = np.arange(0, (total_chunks + 1) * context_len, context_len,
                                 dtype=np.int32)
        tokens = pa.ListArray.from_arrays(pa.array(list_offsets),
                                          pa.array(gathered, pa.int32()))
        return pa.table({'part': pa.array(chunk_part.astype(np.int64)),
                         'chunk_id': pa.array(chunk_id),
                         'tokens': tokens,
                         'n_tok': pa.array(np.full(total_chunks, context_len, np.int32))})

    assigned = ds.map_batches(assign, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(assigned, ['part'], num_partitions, chunk)
