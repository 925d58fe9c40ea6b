"""Deterministic synthesis of the tokenized-sequence input table (FIXTURES.md F6).

Shape mandated by BASELINE.json ``input_hint``:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)`` plus
``ts`` (event time) for the window/as-of machinery.  Generation is seeded and
sharded: each shard is an independent deterministic function of
``(seed, shard_id)`` so bench-scale data can be produced by parallel Ray tasks
and regenerated reproducibly.

Skew knobs built in: zipf-ish token lengths, zipf source distribution
(hot-key salting fixture), a few pathological high-row-count entities.
A companion per-entity sparse ``doc_events`` table (quality scores at random
times) gives every as-of-join lookup a known oracle answer.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_257
NUM_SOURCES = 50
BASE_TS_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

SEQUENCE_SCHEMA = pa.schema([
    pa.field('doc_id', pa.string()),
    pa.field('tokens', pa.list_(pa.int32())),
    pa.field('n_tok', pa.int32()),
    pa.field('source', pa.string()),
    pa.field('ts', pa.timestamp('us')),
])

EVENTS_SCHEMA = pa.schema([
    pa.field('doc_id', pa.string()),
    pa.field('ts', pa.timestamp('us')),
    pa.field('quality', pa.float64()),
    pa.field('label', pa.int32()),
])


def _segment_cumsum(values: np.ndarray, seg_sizes: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum of ``values`` given contiguous segment sizes."""
    total = np.cumsum(values)
    starts = np.concatenate(([0], np.cumsum(seg_sizes)[:-1]))
    offsets = np.repeat(total[starts] - values[starts], seg_sizes)
    return total - offsets


def generate_sequence_shard(shard_id: int, docs_per_shard: int = 1000, *, seed: int = 42,
                            max_tokens: int = 256, pathological_docs: int = 2,
                            pathological_rows: int = 5000) -> pa.Table:
    rng = np.random.default_rng(seed * 1_000_003 + shard_id)

    rows_per_doc = np.clip(rng.geometric(0.15, size=docs_per_shard), 1, 64)
    if shard_id == 0 and pathological_docs:
        rows_per_doc = np.concatenate([rows_per_doc, np.full(pathological_docs, pathological_rows)])
    num_docs = len(rows_per_doc)
    n = int(rows_per_doc.sum())

    doc_index = np.repeat(np.arange(num_docs), rows_per_doc)
    doc_ids = np.array([f'doc{shard_id:05d}{i:07d}' for i in range(num_docs)], dtype=object)[doc_index]

    lengths = np.clip((rng.pareto(1.2, size=n) + 1.0) * 8.0, 1, max_tokens).astype(np.int64)
    flat = rng.integers(0, VOCAB_SIZE, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int32()))

    source_idx = np.clip(rng.zipf(1.5, size=num_docs), 1, NUM_SOURCES)[doc_index]
    sources = np.array([f'src{k:02d}' for k in range(NUM_SOURCES + 1)], dtype=object)[source_idx]

    # per-entity increasing event time: exponential gaps (mean 10 min), ~5% of
    # gaps exceed a 30-minute session threshold
    start = rng.integers(0, 30 * 86_400_000_000, size=num_docs)[doc_index]
    gaps = (rng.exponential(600.0, size=n) * 1_000_000).astype(np.int64) + 1
    ts = BASE_TS_US + start + _segment_cumsum(gaps, rows_per_doc)

    return pa.table({
        'doc_id': pa.array(doc_ids, pa.string()),
        'tokens': tokens,
        'n_tok': pa.array(lengths.astype(np.int32), pa.int32()),
        'source': pa.array(sources, pa.string()),
        'ts': pa.array(ts, pa.timestamp('us')),
    })


def generate_events_shard(shard_id: int, docs_per_shard: int = 1000, *, seed: int = 42,
                          mean_events: float = 2.0) -> pa.Table:
    """Sparse per-entity right-side table for as-of-join features."""
    rng = np.random.default_rng(seed * 2_000_003 + shard_id)
    counts = rng.poisson(mean_events, size=docs_per_shard)
    n = int(counts.sum())
    doc_index = np.repeat(np.arange(docs_per_shard), counts)
    doc_ids = np.array([f'doc{shard_id:05d}{i:07d}' for i in range(docs_per_shard)], dtype=object)[doc_index]
    ts = BASE_TS_US + rng.integers(0, 40 * 86_400_000_000, size=n)
    return pa.table({
        'doc_id': pa.array(doc_ids, pa.string()),
        'ts': pa.array(np.sort(ts) if n else ts, pa.timestamp('us')),
        'quality': pa.array(rng.random(n), pa.float64()),
        'label': pa.array(rng.integers(0, 2, size=n, dtype=np.int32), pa.int32()),
    })


def write_sequence_dataset(out_dir: str, *, num_shards: int = 4, docs_per_shard: int = 1000,
                           seed: int = 42, max_tokens: int = 256,
                           with_events: bool = True, force: bool = False,
                           pathological_rows: int = 5000) -> str:
    """Write the F6 fixture as one parquet file per shard (cached on disk).

    ``pathological_rows`` sizes shard 0's two skew entities (the hot-key
    stressor); the pinned-oracle fixture shrinks it so the literal stays
    compact while keeping the skew shape."""
    seq_dir = os.path.join(out_dir, 'sequences')
    ev_dir = os.path.join(out_dir, 'events')
    marker = os.path.join(out_dir, '_COMPLETE')
    fingerprint = (f'{num_shards}:{docs_per_shard}:{seed}:{max_tokens}:{with_events}'
                   f':{pathological_rows}')
    if os.path.exists(marker) and not force:
        with open(marker) as fh:
            if fh.read().strip() == fingerprint:
                return out_dir
        force = True
    os.makedirs(seq_dir, exist_ok=True)
    os.makedirs(ev_dir, exist_ok=True)
    for shard in range(num_shards):
        pq.write_table(generate_sequence_shard(shard, docs_per_shard, seed=seed, max_tokens=max_tokens,
                                               pathological_rows=pathological_rows),
                       os.path.join(seq_dir, f'shard-{shard:05d}.parquet'))
        if with_events:
            pq.write_table(generate_events_shard(shard, docs_per_shard, seed=seed),
                           os.path.join(ev_dir, f'shard-{shard:05d}.parquet'))
    with open(marker, 'w') as fh:
        fh.write(fingerprint)
    return out_dir
