"""Deduplication at training-data scale: exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Patterns (all Ray-Data-first):

* exact — content hash per batch (vectorized) -> ``groupby(hash)`` -> keep the
  min-id row per group.  One shuffle keyed on the 64-bit hash.
* MinHash-LSH — shingle -> minhash signature per batch (NumPy universal
  hashing) -> explode to (band, band_hash, id) rows -> hash-exchange buckets
  -> candidate pairs -> signature-agreement verify -> connected components.
  The verified pair set stays a ``ray.data.Dataset`` end to end; components
  come from distributed min-label propagation once the pair count crosses
  ``cc_pair_threshold`` (driver union-find below it — cheaper while the pair
  set comfortably fits one heap).
* SimHash — 64-bit simhash per batch -> bucket by 4x16-bit bands on the
  engine exchange -> vectorized XOR + popcount-LUT Hamming verify.
* n-gram Jaccard — LSH candidates verified EXACTLY by co-grouping the pair
  list with the corpus on doc id (two exchanges, no driver text dict).
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

def flat_polynomial_grams(chunks, k: int):
    """Positional k-gram polynomial hashes (mod 2^64) for a batch of
    pre-normalized unit arrays (utf-8 bytes or utf-32 codepoints).

    THE shared gram kernel: one flat buffer, k shifted multiply-add passes,
    per-doc index gather so windows never cross document boundaries.  Serves
    the MinHash shingler, SimHash, winnowing and the decontamination grams —
    a boundary/hash fix lands in exactly one place.  Returns ``(flat uint64
    grams in document order, per-doc gram counts)``; documents shorter than
    ``k`` units contribute zero grams (pad upstream if padding is wanted).
    """
    lens = np.fromiter((len(c) for c in chunks), dtype=np.int64, count=len(chunks))
    counts = np.maximum(lens - k + 1, 0)
    if not len(chunks) or counts.sum() == 0:
        return np.empty(0, dtype=np.uint64), counts
    flat = np.concatenate(chunks).astype(np.uint64)
    starts = np.cumsum(lens) - lens
    powers = np.full(k, 0x100000001b3, dtype=np.uint64) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    grams_all = np.zeros(len(flat) - k + 1, dtype=np.uint64)
    for j in range(k):
        grams_all += flat[j:len(flat) - k + 1 + j] * powers[j]
    valid = np.concatenate([np.arange(s, s + c) for s, c in zip(starts, counts)])
    return grams_all[valid], counts


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
        chunks = []
        for t in texts:
            normalized = ' '.join((t or '').split()).lower()
            data = np.frombuffer(normalized.encode('utf-8'), dtype=np.uint8)
            if len(data) < k:
                data = np.pad(data, (0, k - len(data)), constant_values=0)
            chunks.append(data)
        if not chunks:
            return np.zeros((0, self.num_perm), dtype=np.uint64)
        # identical hash to _shingle_hashes; padding above guarantees >=1 gram
        # per document, so reduceat segments are never empty
        grams, gram_counts = flat_polynomial_grams(chunks, k)
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


def minhash_lsh_pairs(ds, *, text_column: str, id_column: str, num_perm: int = 64,
                      num_bands: int = 16, shingle_size: int = 5,
                      jaccard_threshold: float = 0.8,
                      max_bucket: int = 200, num_partitions: int = 16,
                      distinct: bool = True):
    """Verified near-duplicate pairs via MinHash-LSH, as a ``ray.data.Dataset``.

    Columns ``(left, right, sim)`` with ``left < right``.  With ``distinct``
    (default), a pair colliding in several bands is emitted once — one extra
    hash exchange.  The connected-components consumers pass
    ``distinct=False``: duplicate edges change neither union-find nor
    min-label propagation, so they skip that exchange.  Everything stays on
    the exchange either way; nothing is materialized on the driver.
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
    raw = shuffle_map_partitions(exploded, ['band_hash'], num_partitions, partition_pairs)
    return _distinct_pairs(raw, num_partitions) if distinct else raw


def _distinct_pairs(pairs_ds, num_partitions: int):
    """Distinct ``(left, right)`` rows via one hash exchange (a pair bucketed
    by several LSH bands arrives from several partitions); keeps the first of
    each run after an in-partition sort, so any extra columns (sim) ride
    along deterministically (they are per-pair constants anyway)."""
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    def keep_first(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0:
            return table
        idx = pc.sort_indices(table, sort_keys=[('left', 'ascending'), ('right', 'ascending')])
        table = table.take(idx)
        l = table.column('left').to_numpy(zero_copy_only=False)
        r = table.column('right').to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])))
        return table.filter(pa.array(first))

    return shuffle_map_partitions(pairs_ds, ['left', 'right'], num_partitions, keep_first)


#: pair count above which connected components switch from driver union-find
#: to distributed min-label propagation (``cc='auto'``)
CC_PAIR_THRESHOLD = 200_000


def _cluster_frame(pairs_ds, *, cc: str = 'auto', cc_pair_threshold: int = CC_PAIR_THRESHOLD,
                   num_partitions: int = 16, as_dataset: bool = False):
    """Connected components of a materialized pair Dataset.

    ``cc``: ``'auto'`` routes on pair count, ``'driver'`` / ``'distributed'``
    force a path.  The count may include band-duplicate pairs (callers pass
    ``distinct=False`` since duplicate edges don't change components) — an
    inflated count only switches to the distributed path EARLIER, which is
    the safe direction.  Returns ``(id, cluster_id)`` as pandas (default) or
    as a Dataset (``as_dataset=True`` — nothing touches the driver then)."""
    if cc not in ('auto', 'driver', 'distributed'):
        raise ValueError(f"cc must be 'auto', 'driver' or 'distributed', got {cc!r}")
    n_pairs = pairs_ds.count()
    use_dist = cc == 'distributed' or (cc == 'auto' and n_pairs > cc_pair_threshold)
    if use_dist:
        labels = connected_components_distributed(pairs_ds, num_partitions=num_partitions,
                                                  as_dataset=True)
        if as_dataset:
            return labels
        frame = labels.to_pandas()
        return frame.sort_values('id').reset_index(drop=True)
    frame = _connected_components(pairs_ds.to_pandas()) if n_pairs else \
        pd.DataFrame({'id': [], 'cluster_id': []})
    if as_dataset:
        import ray.data as rd
        return rd.from_arrow(pa.table({'id': pa.array(frame['id'].to_numpy(), pa.int64()),
                                       'cluster_id': pa.array(frame['cluster_id'].to_numpy(),
                                                              pa.int64())}))
    return frame


def minhash_lsh_duplicates(ds, *, text_column: str, id_column: str, num_perm: int = 64,
                           num_bands: int = 16, shingle_size: int = 5,
                           jaccard_threshold: float = 0.8, max_bucket: int = 200,
                           num_partitions: int = 16, cc: str = 'auto',
                           cc_pair_threshold: int = CC_PAIR_THRESHOLD,
                           as_dataset: bool = False):
    """Near-duplicate clusters via MinHash-LSH.

    Returns ``(id, cluster_id)`` for every document that belongs to a
    verified duplicate cluster (cluster_id = min member id) — a pandas frame
    by default, or a ``ray.data.Dataset`` with ``as_dataset=True`` (the
    choice when even the cluster membership is too large for one heap).  The
    pair set never lands on the driver; above ``cc_pair_threshold`` pairs
    the components are computed by distributed min-label propagation
    (:func:`connected_components_distributed`)."""
    pairs = minhash_lsh_pairs(ds, text_column=text_column, id_column=id_column,
                              num_perm=num_perm, num_bands=num_bands,
                              shingle_size=shingle_size, jaccard_threshold=jaccard_threshold,
                              max_bucket=max_bucket, num_partitions=num_partitions,
                              distinct=False).materialize()
    return _cluster_frame(pairs, cc=cc, cc_pair_threshold=cc_pair_threshold,
                          num_partitions=num_partitions, as_dataset=as_dataset)


def connected_components_distributed(pairs, *, num_partitions: int = 16,
                                     max_rounds: int = 50, as_dataset: bool = False):
    """Connected components by distributed min-label propagation.

    The scale path for the duplicate-pair graph: labels and (undirected)
    edges are hash-partitioned; each round co-groups edges with labels and
    reduces ``label[dst] = min(label[dst], label[src])`` on the exchange, so
    no node ever holds the whole pair set (the driver union-find in
    :func:`_connected_components` does — fine until the pair set itself is
    huge).  Labels only decrease, so an unchanged label sum certifies
    convergence; rounds needed = component diameter (small for dup clusters).

    Returns the same (id, cluster_id) frame as the driver union-find, or the
    labels as a ``ray.data.Dataset`` when ``as_dataset=True`` (the scale path:
    nothing ever lands on the driver).  If ``max_rounds`` ends before the
    label fixpoint (a component of diameter > max_rounds), a warning is
    logged — silently split clusters would read as converged otherwise.
    """
    import ray.data as rd

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions, shuffle_map_partitions

    if isinstance(pairs, pd.DataFrame):
        pairs = pa.table({'left': pa.array(pairs['left'].to_numpy(), pa.int64()),
                          'right': pa.array(pairs['right'].to_numpy(), pa.int64())})
    if isinstance(pairs, pa.Table):
        if pairs.num_rows == 0 and not as_dataset:
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
    else:
        # loop exhausted without an unchanged label sum: the min-label
        # fixpoint was NOT certified; a component with diameter > max_rounds
        # would be silently split into several clusters
        logger.warning('connected_components_distributed: label propagation did not '
                       'certify convergence within max_rounds=%d; a duplicate cluster '
                       'with graph diameter > %d may be split — raise max_rounds',
                       max_rounds, max_rounds)

    if as_dataset:
        return labels.map_batches(
            lambda t: t.rename_columns(['id', 'cluster_id']),
            batch_format='pyarrow', zero_copy_batch=True)
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


def anti_join_ids(ds, drop_ids, *, id_column: str,
                  broadcast_threshold: int = 5_000_000, num_partitions: int = 32):
    """Drop rows whose ``id_column`` appears in ``drop_ids``.

    ``drop_ids`` may be a numpy array (small sets broadcast once via
    ``ray.put`` and filter with a vectorized ``pc.is_in``; beyond
    ``broadcast_threshold`` ids the set is hash-partitioned alongside the
    data) or a single-column ``ray.data.Dataset`` (always the co-grouped
    path — the drop set then never lands on the driver at all).
    """
    import ray
    import ray.data as rd

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions

    if isinstance(drop_ids, rd.Dataset):
        drop_ds = drop_ids.map_batches(
            lambda t: t.rename_columns([id_column]), batch_format='pyarrow',
            zero_copy_batch=True)

        def filter_partition_ds(left: pa.Table, right: pa.Table, _pid: int) -> pa.Table:
            if right.num_rows == 0 or right.num_columns == 0:
                return left
            ids = left.column(id_column)
            drop_arr = right.column(id_column).combine_chunks()
            if drop_arr.type != ids.type:
                drop_arr = drop_arr.cast(ids.type)
            return left.filter(pc.invert(pc.is_in(ids, value_set=drop_arr)))

        return cogroup_map_partitions(ds, drop_ds, [id_column], num_partitions,
                                      filter_partition_ds)

    if len(drop_ids) <= broadcast_threshold:
        drop_ref = ray.put(pa.array(drop_ids))

        def keep(batch: pa.Table) -> pa.Table:
            drop_arr = ray.get(drop_ref)
            ids = batch.column(id_column)
            if drop_arr.type != ids.type:
                drop_arr = drop_arr.cast(ids.type)
            return batch.filter(pc.invert(pc.is_in(ids, value_set=drop_arr)))

        return ds.map_batches(keep, batch_format='pyarrow', zero_copy_batch=True)

    drop_ds = rd.from_arrow(pa.table({id_column: pa.array(drop_ids)}))

    def filter_partition(left: pa.Table, right: pa.Table, _pid: int) -> pa.Table:
        ids = left.column(id_column)
        drop_arr = right.column(id_column).combine_chunks()
        if drop_arr.type != ids.type:
            drop_arr = drop_arr.cast(ids.type)
        return left.filter(pc.invert(pc.is_in(ids, value_set=drop_arr)))

    return cogroup_map_partitions(ds, drop_ds, [id_column], num_partitions, filter_partition)


def minhash_dedup(ds, *, text_column: str, id_column: str,
                  broadcast_threshold: int = 5_000_000, cc: str = 'auto',
                  cc_pair_threshold: int = CC_PAIR_THRESHOLD,
                  num_partitions: int = 16, **kwargs):
    """Drop all non-representative members of near-duplicate clusters.

    Below ``cc_pair_threshold`` verified pairs: driver union-find, numpy drop
    set, broadcast ``pc.is_in`` filter (one heap comfortably holds it).
    Above it (or with ``cc='distributed'``): the pair set stays a Dataset,
    components come from distributed min-label propagation, and the drop-id
    set is derived and anti-joined entirely on the exchange — no
    ``to_pandas()`` anywhere on the path.
    """
    if cc not in ('auto', 'driver', 'distributed'):
        raise ValueError(f"cc must be 'auto', 'driver' or 'distributed', got {cc!r}")
    pairs = minhash_lsh_pairs(ds, text_column=text_column, id_column=id_column,
                              num_partitions=num_partitions, distinct=False,
                              **kwargs).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds
    use_dist = cc == 'distributed' or (cc == 'auto' and n_pairs > cc_pair_threshold)
    if not use_dist:
        clusters = _connected_components(pairs.to_pandas())
        drop = clusters.loc[clusters['id'] != clusters['cluster_id'], 'id'].to_numpy()
        return anti_join_ids(ds, drop, id_column=id_column,
                             broadcast_threshold=broadcast_threshold)
    labels = connected_components_distributed(pairs, num_partitions=num_partitions,
                                              as_dataset=True)
    drop_ds = labels.map_batches(
        lambda t: t.filter(pc.not_equal(t.column('id'), t.column('cluster_id')))
                   .select(['id']),
        batch_format='pyarrow', zero_copy_batch=True)
    return anti_join_ids(ds, drop_ds, id_column=id_column,
                         broadcast_threshold=broadcast_threshold,
                         num_partitions=num_partitions)


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
    grams, gram_counts = flat_polynomial_grams(chunks, k)
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


# vectorized popcount: numpy 1.26 has no np.bitwise_count, so Hamming
# distances use a 256-entry lookup over the uint8 view of the XOR matrix
_POPCOUNT8 = np.array([bin(i).count('1') for i in range(256)], dtype=np.uint8)


def _hamming_matrix(hs: np.ndarray) -> np.ndarray:
    """(n, n) pairwise Hamming distances of 64-bit hashes, no Python loop."""
    xor = np.ascontiguousarray(hs[:, None] ^ hs[None, :])
    n = len(hs)
    return _POPCOUNT8[xor.view(np.uint8)].reshape(n, n, 8).sum(axis=2, dtype=np.int32)


def simhash_pairs(ds, *, text_column: str, id_column: str, max_hamming: int = 3,
                  max_bucket: int = 500, num_partitions: int = 16,
                  distinct: bool = True):
    """Verified SimHash near-dup pairs as a Dataset ``(left, right)``.

    4x16-bit band bucketing on the engine's hash exchange (not Ray's
    sort-based groupby — its sampling+sort barrier has a high fixed cost at
    scale); the in-bucket Hamming verify is one XOR matrix + popcount LUT.
    """

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

    def partition_pairs(table: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'left': pa.array([], pa.int64()), 'right': pa.array([], pa.int64())})
        if table.num_rows == 0:
            return empty
        bands = table.column('band').to_numpy(zero_copy_only=False)
        keys = table.column('key').to_numpy(zero_copy_only=False)
        docs = table.column('doc').to_numpy(zero_copy_only=False)
        hs = table.column('h').to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((keys, bands))
        sb, sk = bands[order], keys[order]
        boundaries = np.concatenate(([0], np.flatnonzero((np.diff(sb) != 0) | (np.diff(sk) != 0)) + 1,
                                     [len(order)]))
        lefts, rights = [], []
        skipped = 0
        for s, e in zip(boundaries[:-1], boundaries[1:]):
            rows = order[s:e]
            n = len(rows)
            if n < 2:
                continue
            if n > max_bucket:
                skipped += 1
                continue
            bd = docs[rows]
            ham = _hamming_matrix(hs[rows])
            ii, jj = np.triu_indices(n, 1)
            keep = (ham[ii, jj] <= max_hamming) & (bd[ii] != bd[jj])
            di, dj = bd[ii[keep]], bd[jj[keep]]
            lefts.append(np.minimum(di, dj))
            rights.append(np.maximum(di, dj))
        if skipped:
            logger.warning('simhash partition %d: skipped %d buckets larger than '
                           'max_bucket=%d; raise max_bucket or pre-filter templates '
                           'to cover them', _pid, skipped, max_bucket)
        if not lefts:
            return empty
        return pa.table({'left': pa.array(np.concatenate(lefts).astype(np.int64)),
                         'right': pa.array(np.concatenate(rights).astype(np.int64))})

    from auto_featurs_ray.engine.runtime import shuffle_map_partitions
    exploded = ds.map_batches(explode, batch_format='pyarrow')
    raw = shuffle_map_partitions(exploded, ['band', 'key'], num_partitions, partition_pairs)
    return _distinct_pairs(raw, num_partitions) if distinct else raw


def simhash_duplicates(ds, *, text_column: str, id_column: str, max_hamming: int = 3,
                       max_bucket: int = 500, num_partitions: int = 16, cc: str = 'auto',
                       cc_pair_threshold: int = CC_PAIR_THRESHOLD,
                       as_dataset: bool = False):
    """Near-dup clusters via 64-bit SimHash, bucketed by 4x16-bit bands.

    Returns pandas by default; ``as_dataset=True`` keeps the cluster labels
    a Dataset (nothing lands on the driver)."""
    pairs = simhash_pairs(ds, text_column=text_column, id_column=id_column,
                          max_hamming=max_hamming, max_bucket=max_bucket,
                          num_partitions=num_partitions, distinct=False).materialize()
    return _cluster_frame(pairs, cc=cc, cc_pair_threshold=cc_pair_threshold,
                          num_partitions=num_partitions, as_dataset=as_dataset)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify on LSH candidates)
# ---------------------------------------------------------------------------

def _expand_cluster_pairs(table: pa.Table, _pid: int, max_cluster: int = 3000) -> pa.Table:
    """(id, cluster_id) partition -> all intra-cluster member pairs, sorted so
    the pair's smaller id lands in ``id`` (named for the downstream cogroup
    key).  Clusters are complete within a partition because the exchange
    keyed on cluster_id.  Clusters larger than ``max_cluster`` members are
    SKIPPED with a warning — expanding one is O(m^2) pairs in a single
    reduce task (a 100k-member boilerplate cluster would allocate ~10^10
    pairs), the same guard as the LSH buckets' max_bucket."""
    empty = pa.table({'id': pa.array([], pa.int64()), 'right': pa.array([], pa.int64())})
    if table.num_rows == 0 or table.num_columns == 0:
        return empty
    cid = table.column('cluster_id').to_numpy(zero_copy_only=False)
    ids = table.column('id').to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, cid))
    cid, ids = cid[order], ids[order]
    starts = np.concatenate(([0], np.flatnonzero(cid[1:] != cid[:-1]) + 1, [len(cid)]))
    lefts, rights = [], []
    skipped = 0
    for s, e in zip(starts[:-1], starts[1:]):
        members = ids[s:e]
        if len(members) < 2:
            continue
        if len(members) > max_cluster:
            skipped += 1
            continue
        ii, jj = np.triu_indices(len(members), 1)
        lefts.append(members[ii])
        rights.append(members[jj])
    if skipped:
        logger.warning('cluster-pair expansion partition %d: skipped %d clusters larger '
                       'than max_cluster=%d members (O(m^2) pairs would not fit one '
                       'reduce task); raise max_cluster or pre-filter boilerplate',
                       _pid, skipped, max_cluster)
    if not lefts:
        return empty
    return pa.table({'id': pa.array(np.concatenate(lefts).astype(np.int64)),
                     'right': pa.array(np.concatenate(rights).astype(np.int64))})


def _shingle_list_column(texts, shingle_size: int) -> pa.ListArray:
    """One Arrow list<uint64> column of sorted-unique shingle hashes per doc."""
    arrays = [_shingle_hashes(t, shingle_size) for t in texts]
    lengths = np.array([len(a) for a in arrays], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    flat = np.concatenate(arrays) if arrays else np.array([], dtype=np.uint64)
    # int32 offsets cap one partition's flat shingle buffer at 2^31 entries
    # (~16 GiB) — far beyond the ~512 MiB partition sizing; from_arrays
    # raises loudly rather than truncating if that is ever exceeded
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(flat, pa.uint64()))


def ngram_jaccard_duplicates(ds, *, text_column: str, id_column: str, shingle_size: int = 5,
                             threshold: float = 0.7, num_partitions: int = 16,
                             cc: str = 'auto',
                             cc_pair_threshold: int = CC_PAIR_THRESHOLD,
                             max_cluster: int = 3000,
                             candidate_broadcast_threshold: int = 5_000_000,
                             **lsh_kwargs) -> pd.DataFrame:
    """MinHash-LSH candidates verified with EXACT character-n-gram Jaccard.

    Candidate generation: LSH pairs at a lowered threshold -> connected
    components -> all intra-cluster member pairs (clusters over
    ``max_cluster`` members are skipped with a warning).  Verification
    co-groups the pair list with the corpus on doc id — twice, once per
    side — and computes exact shingle-set Jaccard inside the reduce tasks,
    so no driver ever holds candidate texts (the round-2 version built a
    driver text dict via ``take_all()``).  When the candidate membership is
    below ``candidate_broadcast_threshold`` ids (the overwhelmingly common
    case — candidates are a tiny fraction of the corpus), the corpus
    projection is broadcast-filtered to candidate docs FIRST, so the two
    verify exchanges ship only candidate texts instead of the whole corpus.
    Returns verified pairs ``(left, right, jaccard)``.
    """
    import ray

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions, shuffle_map_partitions

    lsh_pairs = minhash_lsh_pairs(ds, text_column=text_column, id_column=id_column,
                                  shingle_size=shingle_size,
                                  jaccard_threshold=max(0.5, threshold - 0.2),
                                  num_partitions=num_partitions, distinct=False,
                                  **lsh_kwargs).materialize()
    if lsh_pairs.count() == 0:
        return pd.DataFrame({'left': [], 'right': [], 'jaccard': []})
    clusters = _cluster_frame(lsh_pairs, cc=cc, cc_pair_threshold=cc_pair_threshold,
                              num_partitions=num_partitions, as_dataset=True).materialize()
    cand = shuffle_map_partitions(clusters, ['cluster_id'], num_partitions,
                                  lambda t, pid: _expand_cluster_pairs(t, pid, max_cluster))

    # id cast to int64 so both cogroup sides hash the key identically
    def project(t: pa.Table) -> pa.Table:
        return pa.table({'id': t.column(id_column).cast(pa.int64()),
                         '__text': t.column(text_column)})

    n_candidates = clusters.count()
    if n_candidates <= candidate_broadcast_threshold:
        cand_ids = pa.concat_tables(ray.get(clusters.to_arrow_refs()),
                                    promote_options='permissive').column('id').combine_chunks()
        ids_ref = ray.put(cand_ids.cast(pa.int64()))

        def project_filtered(t: pa.Table) -> pa.Table:
            out = project(t)
            wanted = ray.get(ids_ref)
            return out.filter(pc.is_in(out.column('id'), value_set=wanted))

        corpus = ds.map_batches(project_filtered, batch_format='pyarrow', zero_copy_batch=True)
    else:
        corpus = ds.map_batches(project, batch_format='pyarrow', zero_copy_batch=True)

    def attach_left(pair_t: pa.Table, corpus_t: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'left': pa.array([], pa.int64()), 'id': pa.array([], pa.int64()),
                          '__sh_left': pa.array([], pa.list_(pa.uint64()))})
        if pair_t.num_rows == 0:
            return empty
        need = pc.unique(pair_t.column('id').combine_chunks())
        sub = corpus_t.filter(pc.is_in(corpus_t.column('id'), value_set=need))
        sh = _shingle_list_column(sub.column('__text').to_pylist(), shingle_size)
        doc_ids = sub.column('id').combine_chunks()
        pos = pc.index_in(pair_t.column('id'), value_set=doc_ids)
        ok = pc.is_valid(pos)
        pair_t, pos = pair_t.filter(ok), pos.filter(ok)
        if pair_t.num_rows == 0:
            return empty
        return pa.table({'left': pair_t.column('id').combine_chunks().cast(pa.int64()),
                         'id': pair_t.column('right').combine_chunks().cast(pa.int64()),
                         '__sh_left': sh.take(pos)})

    def verify_right(pair_t: pa.Table, corpus_t: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'left': pa.array([], pa.int64()), 'right': pa.array([], pa.int64()),
                          'jaccard': pa.array([], pa.float64())})
        if pair_t.num_rows == 0:
            return empty
        need = pc.unique(pair_t.column('id').combine_chunks())
        sub = corpus_t.filter(pc.is_in(corpus_t.column('id'), value_set=need))
        sh_right = _shingle_list_column(sub.column('__text').to_pylist(), shingle_size)
        doc_ids = sub.column('id').combine_chunks()
        pos = pc.index_in(pair_t.column('id'), value_set=doc_ids)
        ok = pc.is_valid(pos)
        pair_t, pos = pair_t.filter(ok), pos.filter(ok)
        if pair_t.num_rows == 0:
            return empty
        right_sh = sh_right.take(pos)
        if isinstance(right_sh, pa.ChunkedArray):
            right_sh = right_sh.combine_chunks()
        left_sh = pair_t.column('__sh_left')
        if isinstance(left_sh, pa.ChunkedArray):
            left_sh = left_sh.combine_chunks()
        lv, lo = np.asarray(left_sh.values), np.asarray(left_sh.offsets)
        rv, ro = np.asarray(right_sh.values), np.asarray(right_sh.offsets)
        lefts = pair_t.column('left').to_numpy(zero_copy_only=False)
        rights = pair_t.column('id').to_numpy(zero_copy_only=False)
        # both shingle lists are unique per document, so |A∩B| for pair i is
        # the number of values appearing TWICE in concat(A_i, B_i): one
        # lexsort over (pair, value) and an adjacent-equality count replaces
        # the per-pair intersect1d loop (round-3 verdict item)
        n = pair_t.num_rows
        la = np.diff(lo.astype(np.int64))
        lb = np.diff(ro.astype(np.int64))
        segs = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), la),
                               np.repeat(np.arange(n, dtype=np.int64), lb)])
        vals = np.concatenate([lv, rv])
        order = np.lexsort((vals, segs))
        sv, ss = vals[order], segs[order]
        dup = (sv[1:] == sv[:-1]) & (ss[1:] == ss[:-1])
        inter = np.bincount(ss[1:][dup], minlength=n).astype(np.int64)
        union = la + lb - inter
        with np.errstate(divide='ignore', invalid='ignore'):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep_mask = jac >= threshold
        return pa.table({'left': pa.array(lefts[keep_mask], pa.int64()),
                         'right': pa.array(rights[keep_mask], pa.int64()),
                         'jaccard': pa.array(jac[keep_mask], pa.float64())})

    mid = cogroup_map_partitions(cand, corpus, ['id'], num_partitions, attach_left)
    verified = cogroup_map_partitions(mid, corpus, ['id'], num_partitions, verify_right)
    frame = verified.to_pandas()
    return frame.sort_values(['left', 'right']).reset_index(drop=True)


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
        if batch.num_rows == 0:
            # zero-column empty: the exchange drops it (a list-typed batch
            # yields a (0, 0) matrix here, and a FixedSizeListArray cannot be
            # built with list_size=0; initializing the hyperplanes from a
            # zero-dim batch would also poison the actor for later batches)
            return pa.table({})
        emb = _embedding_matrix(batch.column(embedding_column))
        if state['planes'] is None:
            rng = np.random.default_rng(state['seed'])
            state['planes'] = rng.standard_normal((emb.shape[1], state['num_planes']))
        signs = (emb @ state['planes']) > 0
        keys = (signs * (1 << np.arange(state['num_planes']))).sum(axis=1).astype(np.int64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = emb / np.where(norms == 0, 1.0, norms)
        # fixed-size list column straight from the flat buffer — no per-row
        # Python list rebuild
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(unit, dtype=np.float64).reshape(-1)), unit.shape[1])
        return pa.table({
            'key': pa.array(keys, pa.int64()),
            'doc': batch.column(id_column),
            'vec': vec,
        })

    def partition_pairs(table: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'left': pa.array([], pa.int64()), 'right': pa.array([], pa.int64()),
                          'cosine': pa.array([], pa.float64())})
        if table.num_rows == 0:
            return empty
        from auto_featurs_ray.datapipe.similarity import _embedding_matrix
        keys = table.column('key').to_numpy(zero_copy_only=False)
        docs = table.column('doc').to_numpy(zero_copy_only=False)
        vecs = _embedding_matrix(table.column('vec'))
        order = np.argsort(keys, kind='stable')
        sk = keys[order]
        boundaries = np.concatenate(([0], np.flatnonzero(np.diff(sk) != 0) + 1, [len(order)]))
        lefts, rights, cosines = [], [], []
        skipped = 0
        for s, e in zip(boundaries[:-1], boundaries[1:]):
            rows = order[s:e]
            n = len(rows)
            if n < 2:
                continue
            if n > max_bucket:
                skipped += 1
                continue
            bd = docs[rows]
            sims = vecs[rows] @ vecs[rows].T
            ii, jj = np.where(np.triu(sims, 1) >= threshold)
            keep = bd[ii] != bd[jj]
            ii, jj = ii[keep], jj[keep]
            di, dj = bd[ii], bd[jj]
            lefts.append(np.minimum(di, dj))
            rights.append(np.maximum(di, dj))
            cosines.append(sims[ii, jj])
        if skipped:
            logger.warning('embedding-LSH partition %d: skipped %d buckets larger than '
                           'max_bucket=%d; raise max_bucket or add hyperplanes', _pid,
                           skipped, max_bucket)
        if not lefts:
            return empty
        return pa.table({'left': pa.array(np.concatenate(lefts).astype(np.int64)),
                         'right': pa.array(np.concatenate(rights).astype(np.int64)),
                         'cosine': pa.array(np.concatenate(cosines).astype(np.float64))})

    from auto_featurs_ray.engine.runtime import shuffle_map_partitions
    exploded = ds.map_batches(explode, batch_format='pyarrow')
    # duplicate pairs across buckets are harmless to connected components, so
    # no distinct-pair exchange here
    pairs = shuffle_map_partitions(exploded, ['key'], 16, partition_pairs).materialize()
    if pairs.count() == 0:
        return pd.DataFrame({'id': [], 'cluster_id': []})
    return _cluster_frame(pairs, cc='auto')


def build_content_index(ds, *, text_column: str = 'text', index_dir: str,
                        num_buckets: int = 64, normalize: bool = True) -> int:
    """Persist the corpus's dual-64-bit content-hash set as BUCKETED parquet
    (``bucket = h1 mod num_buckets``, one directory per bucket) — the
    incremental-ingest dedup index: a later batch of NEW documents is
    filtered against the historical corpus WITHOUT touching the corpus
    itself (see :class:`IndexedDedupFilter`).  Returns the number of distinct
    hash pairs indexed.  Bucketing is what scales: a filter task reads only
    the buckets its batch actually hits, never the whole index.
    """
    import os

    import pyarrow.parquet as pq

    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    if num_buckets < 1:
        raise ValueError(f'num_buckets must be >= 1, got {num_buckets}')

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1, h2 = _content_hash_batch(batch.column(text_column).to_pandas(), normalize)
        bucket = (h1.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({'h1': pa.array(h1), 'h2': pa.array(h2),
                         'bucket': pa.array(bucket)})

    total = 0

    def write_bucket(table: pa.Table, pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({'bucket': pa.array([], pa.int64()),
                             'n': pa.array([], pa.int64())})
        out_rows = []
        # one partition may hold several buckets; dedupe and write each
        for b in pc.unique(table.column('bucket')).to_pylist():
            sub = table.filter(pc.equal(table.column('bucket'), b)).select(['h1', 'h2'])
            sub = sub.take(pc.sort_indices(sub, sort_keys=[('h1', 'ascending'),
                                                           ('h2', 'ascending')]))
            h1 = sub.column('h1').to_numpy(zero_copy_only=False)
            h2 = sub.column('h2').to_numpy(zero_copy_only=False)
            if len(h1) > 1:
                first = np.concatenate(([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])))
                sub = sub.filter(pa.array(first))
            os.makedirs(os.path.join(index_dir, f'bucket={b}'), exist_ok=True)
            pq.write_table(sub, os.path.join(index_dir, f'bucket={b}', 'part.parquet'))
            out_rows.append((int(b), sub.num_rows))
        return pa.table({'bucket': pa.array([r[0] for r in out_rows], pa.int64()),
                         'n': pa.array([r[1] for r in out_rows], pa.int64())})

    hashed = ds.map_batches(hash_batch, batch_format='pyarrow')
    counts = shuffle_map_partitions(hashed, ['bucket'], min(num_buckets, 32),
                                    write_bucket).to_pandas()
    total = int(counts['n'].sum())
    return total


class IndexedDedupFilter:
    """Actor-pool stage: drop batch rows whose content hash is in a persisted
    :func:`build_content_index` — incremental-ingest dedup of NEW documents
    against the historical corpus.  The actor lazily loads only the hash
    buckets its batches touch and CACHES them across batches (``__init__``
    holds the cache; the canonical stateful ``map_batches(Cls,
    concurrency=N)`` pattern), so a pool of K actors holds at most the
    touched fraction of the index, once each, regardless of batch count.
    """

    def __init__(self, index_dir: str, *, text_column: str = 'text',
                 num_buckets: int = 64, normalize: bool = True) -> None:
        self._dir = index_dir
        self._text = text_column
        self._buckets = num_buckets
        self._normalize = normalize
        self._cache: dict = {}

    def _bucket_set(self, b: int) -> set:
        got = self._cache.get(b)
        if got is None:
            import os

            import pyarrow.parquet as pq
            path = os.path.join(self._dir, f'bucket={b}', 'part.parquet')
            if os.path.exists(path):
                t = pq.read_table(path)
                got = set(zip(t.column('h1').to_pylist(), t.column('h2').to_pylist()))
            else:
                got = set()
            self._cache[b] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        h1, h2 = _content_hash_batch(batch.column(self._text).to_pandas(),
                                     self._normalize)
        buckets = (h1.view(np.uint64) % np.uint64(self._buckets)).astype(np.int64)
        keep = np.ones(len(h1), dtype=bool)
        for b in np.unique(buckets):
            idx = np.flatnonzero(buckets == b)
            seen = self._bucket_set(int(b))
            if seen:
                keep[idx] = [(int(h1[i]), int(h2[i])) not in seen for i in idx]
        return batch.filter(pa.array(keep))


def filter_against_index(ds, *, index_dir: str, text_column: str = 'text',
                         num_buckets: int = 64, normalize: bool = True,
                         concurrency: int = 4):
    """New-batch incremental dedup: ``map_batches`` over an
    :class:`IndexedDedupFilter` actor pool (bucket cache in ``__init__``,
    filtering in ``__call__``)."""
    return ds.map_batches(
        IndexedDedupFilter,
        fn_constructor_kwargs={'index_dir': index_dir, 'text_column': text_column,
                               'num_buckets': num_buckets, 'normalize': normalize},
        batch_format='pyarrow', concurrency=concurrency, num_cpus=1)
