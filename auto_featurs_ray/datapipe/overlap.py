"""Cross-document exact-substring overlap detection via winnowing.

The training-data problem (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better"): find document pairs sharing long verbatim
substrings (boilerplate, licenses, templated spans) that near-dup methods
keyed on whole-document similarity miss.  The published solution is a
corpus-wide suffix array — inherently sequential to build.  This module
gets the same *detection* guarantee scalably from winnowing fingerprints
(Schleimer et al. 2003, MOSS): by the winnowing locality property, any two
documents sharing a normalized substring of at least ``k + window - 1``
characters are guaranteed to share at least one fingerprint, so fingerprint
buckets are a complete candidate generator for long-substring overlap.

Distributed shape (everything stays a Dataset; nothing driver-side):

1. ``map_batches``: per-doc winnowing sketch (the batch-vectorized kernel
   shared with :class:`~auto_featurs_ray.datapipe.textstats.Fingerprinter`),
   exploded to ``(fingerprint, doc)`` rows.
2. One hash exchange on ``fingerprint``: every bucket lands whole in one
   reduce task, which emits intra-bucket pairs (vectorized offset
   arithmetic, no per-bucket Python loop) and pre-aggregates pair counts
   within the partition.  Buckets larger than ``max_bucket`` are skipped
   with a warning — at corpus scale an oversized bucket is a stop-phrase,
   not an overlap signal — and the cap is deterministic on any cluster
   shape because bucket membership is global per fingerprint.
3. A second exchange on ``(doc_a, doc_b)`` sums the partial counts and
   keeps pairs sharing at least ``min_shared`` fingerprints.

No counterpart exists in the reference repo (LLM-datapipe surface).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)


def _intra_run_pairs(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered index pairs (a < b) inside each run of a run-partitioned
    array, without a per-run Python loop.  ``sizes`` are the run lengths;
    returns global (a_idx, b_idx) into the concatenated layout."""
    n = int(sizes.sum())
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1])).astype(np.int64)
    start_of = np.repeat(starts, sizes)
    local = np.arange(n, dtype=np.int64) - start_of  # position within run
    # element at local position L pairs with the L elements before it
    b_idx = np.repeat(np.arange(n, dtype=np.int64), local)
    shift = np.cumsum(local) - local
    within = np.arange(int(local.sum()), dtype=np.int64) - np.repeat(shift, local)
    a_idx = np.repeat(start_of, local) + within
    return a_idx, b_idx


def substring_overlap_pairs(ds, *, text_column: str = 'text', id_column: str = 'doc_id',
                            k: int = 16, window: int = 8, min_shared: int = 2,
                            max_bucket: int = 200, num_partitions: int = 16):
    """Dataset -> Dataset of ``(doc_a, doc_b, shared_fingerprints)`` pairs.

    Detection guarantee: any pair sharing a normalized substring of at least
    ``k + window - 1`` characters shares >= 1 winnowing fingerprint (and is
    emitted when it shares >= ``min_shared`` and no shared fingerprint's
    bucket exceeds ``max_bucket`` for all of them).
    """
    from auto_featurs_ray.datapipe.textstats import winnowing_fingerprints_batch
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        sketches = winnowing_fingerprints_batch(batch.column(text_column).to_pylist(),
                                                k=k, window=window)
        counts = np.diff(sketches.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({'fp': sketches.values,
                         'doc': pa.array(np.repeat(ids, counts), pa.int64())})

    def partition_pairs(table: pa.Table, pid: int) -> pa.Table:
        empty = pa.table({'doc_a': pa.array([], pa.int64()), 'doc_b': pa.array([], pa.int64()),
                          'shared': pa.array([], pa.int64())})
        if table.num_rows == 0 or table.num_columns == 0:
            return empty
        fp = table.column('fp').to_numpy(zero_copy_only=False)
        doc = table.column('doc').to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, fp))
        f, d = fp[order], doc[order]
        # sketches are distinct per doc, but stay safe under duplicate input rows
        keep = np.concatenate(([True], (f[1:] != f[:-1]) | (d[1:] != d[:-1])))
        f, d = f[keep], d[keep]
        starts = np.concatenate(([0], np.flatnonzero(f[1:] != f[:-1]) + 1))
        sizes = np.diff(np.append(starts, len(f))).astype(np.int64)
        skipped = int(np.count_nonzero(sizes > max_bucket))
        if skipped:
            logger.warning('substring-overlap partition %d: skipped %d fingerprint buckets '
                           'larger than max_bucket=%d (stop-phrase fingerprints); raise '
                           'max_bucket to cover them', pid, skipped, max_bucket)
        ok = (sizes >= 2) & (sizes <= max_bucket)
        sel = np.repeat(ok, sizes)
        d2, sizes2 = d[sel], sizes[ok]
        if not len(sizes2):
            return empty
        a_idx, b_idx = _intra_run_pairs(sizes2)
        a, b = d2[a_idx], d2[b_idx]  # a < b: runs are id-sorted and deduped
        # pre-aggregate pair counts inside the partition (combiner before the
        # (doc_a, doc_b) exchange)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        run_starts = np.flatnonzero(first)
        cnt = np.diff(np.append(run_starts, len(a))).astype(np.int64)
        return pa.table({'doc_a': pa.array(a[first]), 'doc_b': pa.array(b[first]),
                         'shared': pa.array(cnt)})

    def combine(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({'doc_a': pa.array([], pa.int64()), 'doc_b': pa.array([], pa.int64()),
                             'shared_fingerprints': pa.array([], pa.int64())})
        a = table.column('doc_a').to_numpy(zero_copy_only=False)
        b = table.column('doc_b').to_numpy(zero_copy_only=False)
        s = table.column('shared').to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, s = a[order], b[order], s[order]
        first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        run_id = np.cumsum(first) - 1
        total = np.bincount(run_id, weights=s.astype(np.float64)).astype(np.int64)
        keep = total >= min_shared
        return pa.table({'doc_a': pa.array(a[first][keep]), 'doc_b': pa.array(b[first][keep]),
                         'shared_fingerprints': pa.array(total[keep])})

    exploded = ds.map_batches(explode, batch_format='pyarrow')
    partial = shuffle_map_partitions(exploded, ['fp'], num_partitions, partition_pairs)
    return shuffle_map_partitions(partial, ['doc_a', 'doc_b'], num_partitions, combine)


def substring_overlap_clusters(ds, *, cc: str = 'auto', num_partitions: int = 16, **kwargs):
    """Connected components over the overlap pair graph: ``(id, cluster_id)``
    pandas frame (or Dataset above the CC threshold machinery's cutoff —
    same routing as minhash dedup)."""
    from auto_featurs_ray.datapipe.dedup import _cluster_frame
    pairs = substring_overlap_pairs(ds, num_partitions=num_partitions, **kwargs)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({'left': batch.column('doc_a'), 'right': batch.column('doc_b')})

    return _cluster_frame(pairs.map_batches(rename, batch_format='pyarrow'),
                          cc=cc, num_partitions=num_partitions)
