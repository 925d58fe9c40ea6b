"""Deduplication at training-data scale: exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Patterns (all Ray-Data-first):

* exact — content hash per batch (vectorized) -> ``groupby(hash)`` -> keep the
  min-id row per group.  One shuffle keyed on the 64-bit hash.
* MinHash-LSH — shingle -> minhash signature per batch (NumPy universal
  hashing) -> explode to (band, band_hash, id) rows -> ``groupby(band,
  band_hash)`` buckets -> candidate pairs -> exact Jaccard verify ->
  connected components (union-find over the verified pair set, which is small
  relative to the corpus; the scale path iterates min-label propagation).
* SimHash — 64-bit simhash per batch -> bucket by 4x16-bit bands -> verify
  Hamming distance <= ``max_hamming``.
* embedding cosine — random-hyperplane LSH buckets -> in-bucket cosine verify.

Every function keeps the survivors deterministic: the representative of a
duplicate cluster is its minimum id.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_MERSENNE = (1 << 61) - 1
# second siphash key for the independent content hash (collision guard):
# 128 combined bits make a false merge statistically impossible even at
# 10^12 rows (~2^80 candidate pairs vs 2^-128 per-pair collision odds)
_HASH_KEY_2 = 'afr2-dedup-k7q9x1'[:16]


def _content_hash_batch(texts, normalize: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized 64-bit content hashes per row.

    Uses pandas' siphash (C-vectorized, deterministic across processes) with
    two fixed keys; whitespace normalization collapses any run of whitespace
    to one space, matching ``' '.join(s.split())``.
    """
    s = pd.Series(texts, dtype=object).fillna('')
    if normalize:
        s = s.str.replace(r'\s+', ' ', regex=True).str.strip()
    h1 = pd.util.hash_pandas_object(s, index=False).to_numpy().view(np.int64)
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY_2).to_numpy().view(np.int64)
    return h1, h2


def exact_dedup(ds, *, text_column: str, id_column: str, normalize: bool = True,
                num_partitions: int = 32):
    """Keep the min-``id_column`` row per exact (whitespace-normalized) content.

    One hash exchange keyed on a 64-bit content hash; a second independent
    64-bit hash rides along so rows are only dropped on 128-bit agreement
    (single-hash equality would silently delete non-duplicates at scale).
    Inside each partition a vectorized sort + run-boundary diff keeps the
    first row per (h1, h2).
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = _content_hash_batch(batch.column(text_column).to_pandas(), normalize)
        return (batch.append_column('__content_hash', pa.array(h1))
                .append_column('__content_hash2', pa.array(h2)))

    def keep_first(table: pa.Table, _pid: int) -> pa.Table:
        idx = pc.sort_indices(table, sort_keys=[('__content_hash', 'ascending'),
                                                ('__content_hash2', 'ascending'),
                                                (id_column, 'ascending')])
        table = table.take(idx)
        h1 = table.column('__content_hash').to_numpy(zero_copy_only=False)
        h2 = table.column('__content_hash2').to_numpy(zero_copy_only=False)
        if len(h1):
            first = np.concatenate(([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])))
        else:
            first = np.array([], bool)
        return table.filter(pa.array(first)).drop_columns(['__content_hash', '__content_hash2'])

    hashed = ds.map_batches(add_hash, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(hashed, ['__content_hash'], num_partitions, keep_first)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Vectorized k-gram (character shingle) polynomial hashes of a document."""
    normalized = ' '.join((text or '').split()).lower()
    data = np.frombuffer(normalized.encode('utf-8'), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=0)
    powers = np.full(k, 0x100000001b3, dtype=np.uint64) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    grams = (np.lib.stride_tricks.sliding_window_view(data, k) * powers).sum(axis=1)
    return np.unique(grams)


class MinHasher:
    """Minhash signatures: ``a*h + b mod p`` universal hashing, computed for a
    whole batch of documents in one vectorized pass (shingle hashes of every
    document share one flat buffer; per-permutation min is one ``reduceat``)."""

    def __init__(self, text_column: str, num_perm: int = 64, shingle_size: int = 5, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.text_column = text_column
        self.num_perm = num_perm
        self.shingle_size = shingle_size

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def signatures(self, texts: Sequence[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix, vectorized across docs."""
        k = self.shingle_size
        chunks, gram_counts = [], np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            normalized = ' '.join((t or '').split()).lower()
            data = np.frombuffer(normalized.encode('utf-8'), dtype=np.uint8)
            if len(data) < k:
                data = np.pad(data, (0, k - len(data)), constant_values=0)
            chunks.append(data)
            gram_counts[i] = len(data) - k + 1
        if not chunks:
            return np.zeros((0, self.num_perm), dtype=np.uint64)
        flat = np.concatenate(chunks).astype(np.uint64)
        doc_ends = np.cumsum([len(c) for c in chunks])
        doc_starts = doc_ends - np.asarray([len(c) for c in chunks])
        # polynomial k-gram hash over the concatenated buffer (wraps mod 2^64),
        # identical to _shingle_hashes; windows crossing doc boundaries are
        # excluded by gathering only each doc's in-range gram positions
        powers = np.full(k, 0x100000001b3, dtype=np.uint64) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        grams_all = np.zeros(len(flat) - k + 1, dtype=np.uint64)
        for j in range(k):
            grams_all += flat[j:len(flat) - k + 1 + j] * powers[j]
        valid = np.concatenate([np.arange(s, s + c) for s, c in zip(doc_starts, gram_counts)])
        grams = grams_all[valid]
        starts = np.concatenate(([0], np.cumsum(gram_counts)[:-1]))
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):
            prods = (grams * self.a[p] + self.b[p]) % np.uint64(_MERSENNE)
            sigs[:, p] = np.minimum.reduceat(prods, starts)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch.column(self.text_column).to_pylist())
        arr = pa.FixedSizeListArray.from_arrays(pa.array(sigs.reshape(-1).view(np.int64)), self.num_perm)
        return batch.append_column('__minhash', arr)


def minhash_lsh_duplicates(ds, *, text_column: str, id_column: str, num_perm: int = 64,
                           num_bands: int = 16, shingle_size: int = 5,
                           jaccard_threshold: float = 0.8,
                           max_bucket: int = 200) -> pd.DataFrame:
    """Near-duplicate clusters via MinHash-LSH.

    Returns a small pandas frame ``(id, cluster_id)`` for every document that
    belongs to a verified duplicate cluster (cluster_id = min member id).
    """
    rows_per_band = num_perm // num_bands
    hasher = MinHasher(text_column, num_perm, shingle_size)
    # per-position weights for the vectorized band hash: any deterministic
    # hash of the band's signature chunk preserves its equality classes
    band_weights = np.full(rows_per_band, 0x100000001b3, dtype=np.uint64) \
        ** np.arange(rows_per_band, dtype=np.uint64)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sigs = hasher.signatures(batch.column(text_column).to_pylist())
        band_hashes = np.empty((num_bands, n), dtype=np.uint64)
        for band in range(num_bands):
            chunk = sigs[:, band * rows_per_band:(band + 1) * rows_per_band]
            band_hashes[band] = (chunk * band_weights[None, :]).sum(axis=1, dtype=np.uint64) \
                * np.uint64(0x9E3779B97F4A7C15) + np.uint64(band)
        tile_idx = pa.array(np.tile(np.arange(n), num_bands))
        sig_flat = np.tile(sigs.reshape(-1).view(np.int64), num_bands)
        return pa.table({
            'band': pa.array(np.repeat(np.arange(num_bands, dtype=np.int32), n)),
            'band_hash': pa.array(band_hashes.reshape(-1).view(np.int64)),
            'doc': batch.column(id_column).take(tile_idx),
            'sig': pa.FixedSizeListArray.from_arrays(pa.array(sig_flat), num_perm),
        })

    def partition_pairs(table: pa.Table, _pid: int) -> pa.Table:
        bands = table.column('band').to_numpy(zero_copy_only=False)
        bh = table.column('band_hash').to_numpy(zero_copy_only=False)
        docs = table.column('doc').to_numpy(zero_copy_only=False)
        sig_col = table.column('sig').combine_chunks()
        sigs = np.asarray(sig_col.values).reshape(-1, num_perm)
        order = np.lexsort((bh, bands))
        sb, sh = bands[order], bh[order]
        boundaries = np.concatenate(([0], np.flatnonzero((np.diff(sb) != 0) | (np.diff(sh) != 0)) + 1,
                                     [len(order)]))
        lefts, rights, sims = [], [], []
        skipped = 0
        for s, e in zip(boundaries[:-1], boundaries[1:]):
            rows = order[s:e]
            n = len(rows)
            if n < 2:
                continue
            if n > max_bucket:
                skipped += 1
                continue
            bucket_sigs = sigs[rows]
            bucket_docs = docs[rows]
            # pairwise signature-agreement fraction, fully vectorized
            agree = (bucket_sigs[:, None, :] == bucket_sigs[None, :, :]).mean(axis=2)
            ii, jj = np.triu_indices(n, 1)
            keep = (agree[ii, jj] >= jaccard_threshold) & (bucket_docs[ii] != bucket_docs[jj])
            di, dj = bucket_docs[ii[keep]], bucket_docs[jj[keep]]
            lefts.append(np.minimum(di, dj))
            rights.append(np.maximum(di, dj))
            sims.append(agree[ii[keep], jj[keep]])
        if skipped:
            # silent truncation would read as full coverage — surface it
            logger.warning('minhash-LSH partition %d: skipped %d buckets larger than '
                           'max_bucket=%d (likely boilerplate shingles); raise max_bucket '
                           'or pre-filter templates to cover them', _pid, skipped, max_bucket)
        if not lefts:
            return pa.table({'left': pa.array([], pa.int64()), 'right': pa.array([], pa.int64()),
                             'sim': pa.array([], pa.float64())})
        return pa.table({'left': pa.array(np.concatenate(lefts).astype(np.int64)),
                         'right': pa.array(np.concatenate(rights).astype(np.int64)),
                         'sim': pa.array(np.concatenate(sims).astype(np.float64))})

    from auto_featurs_ray.engine.runtime import shuffle_map_partitions
    exploded = ds.map_batches(explode, batch_format='pyarrow')
    pairs = (shuffle_map_partitions(exploded, ['band_hash'], 16, partition_pairs)
             .to_pandas().drop_duplicates(['left', 'right']))
    return _connected_components(pairs)


def connected_components_distributed(pairs, *, num_partitions: int = 16,
                                     max_rounds: int = 25) -> pd.DataFrame:
    """Connected components by distributed min-label propagation.

    The scale path for the duplicate-pair graph: labels and (undirected)
    edges are hash-partitioned; each round co-groups edges with labels and
    reduces ``label[dst] = min(label[dst], label[src])`` on the exchange, so
    no node ever holds the whole pair set (the driver union-find in
    :func:`_connected_components` does — fine until the pair set itself is
    huge).  Labels only decrease, so an unchanged label sum certifies
    convergence; rounds needed = component diameter (small for dup clusters).

    Returns the same (id, cluster_id) frame as the driver union-find.
    """
    import ray.data as rd

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions, shuffle_map_partitions

    if isinstance(pairs, pd.DataFrame):
        pairs = pa.table({'left': pa.array(pairs['left'].to_numpy(), pa.int64()),
                          'right': pa.array(pairs['right'].to_numpy(), pa.int64())})
    if isinstance(pairs, pa.Table):
        if pairs.num_rows == 0:
            return pd.DataFrame({'id': [], 'cluster_id': []})
        pairs = rd.from_arrow(pairs)

    def undirect(batch: pa.Table) -> pa.Table:
        left = batch.column('left').combine_chunks()
        right = batch.column('right').combine_chunks()
        return pa.table({'src': pa.concat_arrays([left.cast(pa.int64()), right.cast(pa.int64())]),
                         'dst': pa.concat_arrays([right.cast(pa.int64()), left.cast(pa.int64())])})

    edges = pairs.map_batches(undirect, batch_format='pyarrow').materialize()

    def init_labels(table: pa.Table, _pid: int) -> pa.Table:
        nodes = pc.unique(table.column('src').combine_chunks())
        return pa.table({'src': nodes, 'label': nodes})

    # labels keep the column name 'src' so edges and labels co-partition on
    # the same key through every round
    labels = shuffle_map_partitions(edges, ['src'], num_partitions, init_labels).materialize()
    prev_sum = None
    for _round in range(max_rounds):
        def propagate(edge_t: pa.Table, label_t: pa.Table, _pid: int) -> pa.Table:
            # messages: each edge forwards its src's label to dst; labels
            # forward themselves (so isolated/settled nodes persist)
            merged = edge_t.join(label_t, keys=['src'], join_type='inner', use_threads=False)
            return pa.table({
                'node': pa.concat_arrays([merged.column('dst').combine_chunks(),
                                          label_t.column('src').combine_chunks()]),
                'label': pa.concat_arrays([merged.column('label').combine_chunks(),
                                           label_t.column('label').combine_chunks()]),
            })

        messages = cogroup_map_partitions(edges, labels, ['src'], num_partitions, propagate)

        def reduce_min(table: pa.Table, _pid: int) -> pa.Table:
            grouped = table.group_by('node').aggregate([('label', 'min')])
            return pa.table({'src': grouped.column('node'), 'label': grouped.column('label_min')})

        labels = shuffle_map_partitions(messages, ['node'], num_partitions, reduce_min).materialize()
        label_sum = labels.sum('label')
        if label_sum == prev_sum:
            break
        prev_sum = label_sum

    frame = labels.to_pandas().rename(columns={'src': 'id', 'label': 'cluster_id'})
    return frame.sort_values('id').reset_index(drop=True)


def _connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find over the (small) verified pair set -> (id, cluster_id)."""
    parent: Dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for left, right in zip(pairs['left'], pairs['right']):
        ra, rb = find(left), find(right)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    return pd.DataFrame({'id': members, 'cluster_id': [find(m) for m in members]})


def anti_join_ids(ds, drop_ids: np.ndarray, *, id_column: str,
                  broadcast_threshold: int = 5_000_000, num_partitions: int = 32):
    """Drop rows whose ``id_column`` appears in ``drop_ids``.

    Small drop sets broadcast once via ``ray.put`` and filter with a
    vectorized ``pc.is_in``.  Beyond ``broadcast_threshold`` ids, the drop set
    is hash-partitioned alongside the data and each co-located partition pair
    filters locally — a true anti-join on the exchange, so no node ever holds
    the full drop set.
    """
    import ray

    if len(drop_ids) <= broadcast_threshold:
        drop_ref = ray.put(pa.array(drop_ids))

        def keep(batch: pa.Table) -> pa.Table:
            drop_arr = ray.get(drop_ref)
            ids = batch.column(id_column)
            if drop_arr.type != ids.type:
                drop_arr = drop_arr.cast(ids.type)
            return batch.filter(pc.invert(pc.is_in(ids, value_set=drop_arr)))

        return ds.map_batches(keep, batch_format='pyarrow', zero_copy_batch=True)

    import ray.data as rd

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions
    drop_ds = rd.from_arrow(pa.table({id_column: pa.array(drop_ids)}))

    def filter_partition(left: pa.Table, right: pa.Table, _pid: int) -> pa.Table:
        ids = left.column(id_column)
        drop_arr = right.column(id_column).combine_chunks()
        if drop_arr.type != ids.type:
            drop_arr = drop_arr.cast(ids.type)
        return left.filter(pc.invert(pc.is_in(ids, value_set=drop_arr)))

    return cogroup_map_partitions(ds, drop_ds, [id_column], num_partitions, filter_partition)


def minhash_dedup(ds, *, text_column: str, id_column: str,
                  broadcast_threshold: int = 5_000_000, **kwargs):
    """Drop all non-representative members of near-duplicate clusters.

    The drop-id set either broadcasts once (small) or anti-joins on the hash
    exchange (large) — see :func:`anti_join_ids`; the membership test is a
    vectorized ``pc.is_in`` either way.
    """
    clusters = minhash_lsh_duplicates(ds, text_column=text_column, id_column=id_column, **kwargs)
    drop = clusters.loc[clusters['id'] != clusters['cluster_id'], 'id'].to_numpy()
    return anti_join_ids(ds, drop, id_column=id_column, broadcast_threshold=broadcast_threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash64(text: str) -> int:
    return int(_simhash64_batch([text])[0])


def _simhash64_batch(texts: Sequence[str]) -> np.ndarray:
    """64-bit SimHash per document, vectorized across the whole batch: one
    flat shingle-hash buffer, per-(doc, gram) dedup via lexsort, bit votes
    via one reduceat over the expanded bit matrix."""
    k = 4
    chunks = []
    for t in texts:
        normalized = ' '.join((t or '').split()).lower()
        data = np.frombuffer(normalized.encode('utf-8'), dtype=np.uint8)
        if len(data) < k:
            data = np.pad(data, (0, k - len(data)), constant_values=0)
        chunks.append(data)
    if not chunks:
        return np.zeros(0, dtype=np.int64)
    flat = np.concatenate(chunks).astype(np.uint64)
    lens = np.asarray([len(c) for c in chunks])
    gram_counts = lens - k + 1
    doc_starts = np.cumsum(lens) - lens
    powers = np.full(k, 0x100000001b3, dtype=np.uint64) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    grams_all = np.zeros(len(flat) - k + 1, dtype=np.uint64)
    for j in range(k):
        grams_all += flat[j:len(flat) - k + 1 + j] * powers[j]
    valid = np.concatenate([np.arange(s, s + c) for s, c in zip(doc_starts, gram_counts)])
    grams = grams_all[valid]
    doc_of = np.repeat(np.arange(len(texts)), gram_counts)
    # per-document unique grams (matches _shingle_hashes -> np.unique)
    order = np.lexsort((grams, doc_of))
    sg, sd = grams[order], doc_of[order]
    first = np.concatenate(([True], (sd[1:] != sd[:-1]) | (sg[1:] != sg[:-1])))
    sg, sd = sg[first], sd[first]
    bits = ((sg[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int8)
    signed = (2 * bits - 1).astype(np.int32)
    starts = np.concatenate(([0], np.flatnonzero(sd[1:] != sd[:-1]) + 1))
    votes = np.add.reduceat(signed, starts, axis=0)
    docs_present = sd[starts]
    out_bits = np.zeros((len(texts), 64), dtype=np.uint64)
    out_bits[docs_present] = (votes > 0).astype(np.uint64)
    packed = (out_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    # round-1 parity: the original scalar returned value - 2^63 when bit 63
    # was set (clearing the top bit, not two's-complement) — effectively a
    # 63-bit simhash; keep the same encoding for deterministic outputs
    return (packed & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def simhash_duplicates(ds, *, text_column: str, id_column: str, max_hamming: int = 3,
                       max_bucket: int = 500) -> pd.DataFrame:
    """Near-dup clusters via 64-bit SimHash, bucketed by 4x16-bit bands."""

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hashes = _simhash64_batch(batch.column(text_column).to_pylist())
        uh = hashes.view(np.uint64)
        bands = np.repeat(np.arange(4, dtype=np.int32), n)
        keys = np.concatenate([(uh >> np.uint64(16 * band)) & np.uint64(0xFFFF)
                               for band in range(4)]).view(np.int64)
        tile_idx = pa.array(np.tile(np.arange(n), 4))
        return pa.table({'band': pa.array(bands), 'key': pa.array(keys),
                         'doc': batch.column(id_column).take(tile_idx),
                         'h': pa.array(np.tile(hashes, 4))})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2 or n > max_bucket:
            return pa.table({'left': pa.array([], pa.int64()), 'right': pa.array([], pa.int64())})
        docs = group.column('doc').to_pylist()
        hs = group.column('h').to_numpy(zero_copy_only=False).astype(np.int64)
        lefts, rights = [], []
        for i in range(n):
            hamming = np.bitwise_count((hs ^ hs[i]).astype(np.uint64)) if hasattr(np, 'bitwise_count') else \
                np.array([bin((int(h) ^ int(hs[i])) & 0xFFFFFFFFFFFFFFFF).count('1') for h in hs])
            for j in range(i + 1, n):
                if docs[i] != docs[j] and hamming[j] <= max_hamming:
                    a, b = sorted((docs[i], docs[j]))
                    lefts.append(a)
                    rights.append(b)
        return pa.table({'left': pa.array(lefts, pa.int64()), 'right': pa.array(rights, pa.int64())})

    pairs = (ds.map_batches(explode, batch_format='pyarrow')
             .groupby(['band', 'key'])
             .map_groups(bucket_pairs, batch_format='pyarrow')
             .to_pandas().drop_duplicates(['left', 'right']))
    return _connected_components(pairs)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify on LSH candidates)
# ---------------------------------------------------------------------------

def ngram_jaccard_duplicates(ds, *, text_column: str, id_column: str, shingle_size: int = 5,
                             threshold: float = 0.7, **lsh_kwargs) -> pd.DataFrame:
    """MinHash-LSH candidates verified with EXACT character-n-gram Jaccard.

    Returns verified pairs ``(left, right, jaccard)``.
    """
    candidates = minhash_lsh_duplicates(ds, text_column=text_column, id_column=id_column,
                                        shingle_size=shingle_size,
                                        jaccard_threshold=max(0.5, threshold - 0.2), **lsh_kwargs)
    if candidates.empty:
        return pd.DataFrame({'left': [], 'right': [], 'jaccard': []})
    # fetch texts of candidate docs (small set) and verify exactly
    wanted = pa.array(candidates['id'].to_numpy())

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        value_set = wanted if wanted.type == ids.type else wanted.cast(ids.type)
        sub = batch.filter(pc.is_in(ids, value_set=value_set))
        return sub.select([id_column, text_column])

    texts = {r[id_column]: r[text_column] for r in ds.map_batches(project, batch_format='pyarrow').take_all()}
    # _shingle_hashes returns sorted-unique arrays: intersections are one
    # C-level merge each instead of Python set ops over substring objects
    shingle_cache = {i: _shingle_hashes(t, shingle_size) for i, t in texts.items()}
    out = {'left': [], 'right': [], 'jaccard': []}
    by_cluster: Dict = {}
    for _, row in candidates.iterrows():
        by_cluster.setdefault(row['cluster_id'], []).append(row['id'])
    for members in by_cluster.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = shingle_cache[members[i]], shingle_cache[members[j]]
                inter = len(np.intersect1d(a, b, assume_unique=True))
                union = len(a) + len(b) - inter
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    out['left'].append(members[i])
                    out['right'].append(members[j])
                    out['jaccard'].append(jac)
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_duplicates(ds, *, embedding_column: str, id_column: str,
                         threshold: float = 0.95, num_planes: int = 16,
                         seed: int = 11, max_bucket: int = 1000) -> pd.DataFrame:
    """Cosine near-dup via random-hyperplane LSH buckets + in-bucket verify."""
    state = {'planes': None, 'seed': seed, 'num_planes': num_planes}

    def explode(batch: pa.Table) -> pa.Table:
        from auto_featurs_ray.datapipe.similarity import _embedding_matrix
        emb = _embedding_matrix(batch.column(embedding_column))
        if state['planes'] is None:
            rng = np.random.default_rng(state['seed'])
            state['planes'] = rng.standard_normal((emb.shape[1], state['num_planes']))
        signs = (emb @ state['planes']) > 0
        keys = (signs * (1 << np.arange(state['num_planes']))).sum(axis=1).astype(np.int64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = emb / np.where(norms == 0, 1.0, norms)
        return pa.table({
            'key': pa.array(keys, pa.int64()),
            'doc': batch.column(id_column),
            'vec': pa.array(list(unit), pa.list_(pa.float64())),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2 or n > max_bucket:
            return pa.table({'left': pa.array([], pa.int64()), 'right': pa.array([], pa.int64()),
                             'cosine': pa.array([], pa.float64())})
        from auto_featurs_ray.datapipe.similarity import _embedding_matrix
        docs = group.column('doc').to_pylist()
        vecs = _embedding_matrix(group.column('vec'))
        sims = vecs @ vecs.T
        lefts, rights, cosines = [], [], []
        ii, jj = np.where(np.triu(sims, 1) >= threshold)
        for i, j in zip(ii, jj):
            a, b = sorted((docs[i], docs[j]))
            lefts.append(a)
            rights.append(b)
            cosines.append(float(sims[i, j]))
        return pa.table({'left': pa.array(lefts, pa.int64()), 'right': pa.array(rights, pa.int64()),
                         'cosine': pa.array(cosines, pa.float64())})

    pairs = (ds.map_batches(explode, batch_format='pyarrow')
             .groupby('key').map_groups(bucket_pairs, batch_format='pyarrow')
             .to_pandas().drop_duplicates(['left', 'right']))
    return _connected_components(pairs[['left', 'right']]) if not pairs.empty else \
        pd.DataFrame({'id': [], 'cluster_id': []})
