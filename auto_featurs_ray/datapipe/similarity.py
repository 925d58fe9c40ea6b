"""Approximate-nearest-neighbor search over an embedding column.

* ``knn_brute_force`` — baseline: the (small) query matrix is broadcast via
  ``ray.put`` once; each batch computes a NumPy matmul against it and emits
  only its local top-k rows; a final tiny reduce merges the partial top-ks.
  Work scales linearly over the corpus with zero shuffle.
* ``knn_ivf`` — scale path: a k-means coarse quantizer (trained on a driver
  sample) assigns every row to a centroid inside ``map_batches``; queries
  probe only the ``nprobe`` nearest centroid buckets, pruning most of the
  corpus before the exact scoring pass.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _unit(matrix: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    return matrix / np.where(norms == 0, 1.0, norms)


def _embedding_matrix(column: pa.ChunkedArray) -> np.ndarray:
    """(n, dim) float64 view of a list<float> column via the Arrow list
    layout — no per-row Python."""
    combined = column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column
    if isinstance(combined, pa.ChunkedArray):
        combined = combined.chunk(0)
    values = combined.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if isinstance(combined, pa.FixedSizeListArray):
        dim = combined.type.list_size
        return values.reshape(len(combined), dim)
    offsets = np.diff(combined.offsets.to_numpy(zero_copy_only=False))
    if len(offsets) == 0:
        return values.reshape(0, 0)
    dim = int(offsets[0])
    if not (offsets == dim).all():
        raise ValueError('Embedding column has ragged dimensions')
    return values.reshape(len(offsets), dim)


def knn_brute_force(ds, *, embedding_column: str, id_column: str,
                    queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k per query row; returns (query_idx, id, cosine) sorted."""
    queries = _unit(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    query_ref = ray.put(queries)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(query_ref)
        emb = _embedding_matrix(batch.column(embedding_column))
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        sims = _unit(emb) @ q.T  # (batch, num_queries)
        take = min(k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            order = np.argpartition(-sims[:, qi], take - 1)[:take]
            out_q.extend([qi] * take)
            out_id.extend(ids[order].tolist())
            out_sim.extend(sims[order, qi].tolist())
        return pa.table({'query_idx': pa.array(out_q, pa.int32()),
                         'id': pa.array(out_id),
                         'cosine': pa.array(out_sim, pa.float64())})

    partials = ds.map_batches(partial_topk, batch_format='pyarrow').to_pandas()
    top = (partials.sort_values(['query_idx', 'cosine', 'id'], ascending=[True, False, True])
           .groupby('query_idx', sort=True).head(k).reset_index(drop=True))
    return top


class KMeansQuantizer:
    """Tiny Lloyd k-means trained on a sample — the IVF coarse quantizer."""

    def __init__(self, num_centroids: int = 16, iterations: int = 10, seed: int = 3) -> None:
        self.num_centroids = num_centroids
        self.iterations = iterations
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None

    def fit(self, sample: np.ndarray) -> 'KMeansQuantizer':
        rng = np.random.default_rng(self.seed)
        sample = _unit(np.asarray(sample, dtype=np.float64))
        idx = rng.choice(len(sample), size=min(self.num_centroids, len(sample)), replace=False)
        centroids = sample[idx].copy()
        for _ in range(self.iterations):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(len(centroids)):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _unit(centroids)
        self.centroids = centroids
        return self

    def assign(self, matrix: np.ndarray) -> np.ndarray:
        return np.argmax(_unit(matrix) @ self.centroids.T, axis=1)


def knn_ivf(ds, *, embedding_column: str, id_column: str, queries: np.ndarray,
            k: int = 10, num_centroids: int = 16, nprobe: int = 4,
            train_sample: int = 2048) -> pd.DataFrame:
    """IVF-pruned cosine top-k: probe only the ``nprobe`` closest centroid buckets."""
    sample_rows = sorted(ds.limit(train_sample).take_all(),
                         key=lambda r: r[id_column])  # block order is run-varying
    sample = np.stack([np.asarray(r[embedding_column], dtype=np.float64) for r in sample_rows])
    quantizer = KMeansQuantizer(num_centroids=num_centroids).fit(sample)

    queries = _unit(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probes = np.argsort(-(queries @ quantizer.centroids.T), axis=1)[:, :nprobe]
    probe_sets = [set(p.tolist()) for p in probes]
    handle = ray.put((quantizer.centroids, queries, probe_sets))

    def partial_topk(batch: pa.Table) -> pa.Table:
        centroids, q, probe_list = ray.get(handle)
        emb = _embedding_matrix(batch.column(embedding_column))
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        unit = _unit(emb)
        assign = np.argmax(unit @ centroids.T, axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi, probe in enumerate(probe_list):
            mask = np.isin(assign, list(probe))
            if not mask.any():
                continue
            sims = unit[mask] @ q[qi]
            take = min(k, int(mask.sum()))
            order = np.argpartition(-sims, take - 1)[:take]
            out_q.extend([qi] * take)
            out_id.extend(ids[mask][order].tolist())
            out_sim.extend(sims[order].tolist())
        return pa.table({'query_idx': pa.array(out_q, pa.int32()),
                         'id': pa.array(out_id),
                         'cosine': pa.array(out_sim, pa.float64())})

    partials = ds.map_batches(partial_topk, batch_format='pyarrow').to_pandas()
    if partials.empty:
        return partials
    return (partials.sort_values(['query_idx', 'cosine', 'id'], ascending=[True, False, True])
            .groupby('query_idx', sort=True).head(k).reset_index(drop=True))


# ---------------------------------------------------------------------------
# persisted IVF index (round-1 verdict stretch item 10)
# ---------------------------------------------------------------------------

def build_ivf_index(ds, *, embedding_column: str, id_column: str, index_dir: str,
                    num_centroids: int = 16, train_sample: int = 2048,
                    iterations: int = 10, seed: int = 3) -> 'KMeansQuantizer':
    """Train the coarse quantizer once and persist the whole index:
    ``centroids.npy`` plus centroid-partitioned parquet buckets.  Repeated
    queries then skip re-clustering AND read only the probed centroid
    directories — partition pruning at the read, the 100-TB story.
    """
    import os

    sample_rows = sorted(ds.limit(train_sample).take_all(),
                         key=lambda r: r[id_column])  # block order is run-varying
    sample = np.stack([np.asarray(r[embedding_column], dtype=np.float64) for r in sample_rows])
    quantizer = KMeansQuantizer(num_centroids=num_centroids, iterations=iterations, seed=seed).fit(sample)
    cref = ray.put(quantizer.centroids)

    def assign(batch: pa.Table) -> pa.Table:
        centroids = ray.get(cref)
        emb = _embedding_matrix(batch.column(embedding_column))
        codes = np.argmax(_unit(emb) @ centroids.T, axis=1).astype(np.int32)
        # partition col is stripped from the data files on write; keep a copy
        return (batch.append_column('centroid', pa.array(codes))
                .append_column('centroid_id', pa.array(codes)))

    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, 'centroids.npy'), quantizer.centroids)
    (ds.map_batches(assign, batch_format='pyarrow', zero_copy_batch=True)
       .write_parquet(os.path.join(index_dir, 'buckets'), partition_cols=['centroid']))
    return quantizer


def knn_ivf_from_index(index_dir: str, *, embedding_column: str, id_column: str,
                       queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
    """ANN top-k against a persisted IVF index; only the probed centroid
    partitions are read from storage."""
    import glob
    import os

    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, 'centroids.npy'))
    queries = _unit(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probes = np.argsort(-(queries @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = [set(p.tolist()) for p in probes]
    needed = sorted({int(c) for row in probes for c in row})
    paths = [p for c in needed
             for p in sorted(glob.glob(os.path.join(index_dir, 'buckets', f'centroid={c}', '*.parquet')))]
    if not paths:
        return pd.DataFrame({'query_idx': [], 'id': [], 'cosine': []})
    handle = ray.put((queries, probe_sets))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, probe_list = ray.get(handle)
        emb = _embedding_matrix(batch.column(embedding_column))
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        assign = batch.column('centroid_id').to_numpy(zero_copy_only=False)
        unit = _unit(emb)
        out_q, out_id, out_sim = [], [], []
        for qi, probe in enumerate(probe_list):
            mask = np.isin(assign, list(probe))
            if not mask.any():
                continue
            sims = unit[mask] @ q[qi]
            take = min(k, int(mask.sum()))
            order = np.argpartition(-sims, take - 1)[:take]
            out_q.extend([qi] * take)
            out_id.extend(ids[mask][order].tolist())
            out_sim.extend(sims[order].tolist())
        return pa.table({'query_idx': pa.array(out_q, pa.int32()),
                         'id': pa.array(out_id),
                         'cosine': pa.array(out_sim, pa.float64())})

    partials = (rd.read_parquet(paths, columns=[id_column, embedding_column, 'centroid_id'])
                .map_batches(partial_topk, batch_format='pyarrow').to_pandas())
    if partials.empty:
        return partials
    return (partials.sort_values(['query_idx', 'cosine', 'id'], ascending=[True, False, True])
            .groupby('query_idx', sort=True).head(k).reset_index(drop=True))


def quantize_embeddings(ds, *, embedding_column: str = 'embedding',
                        id_column: str = 'vec_id'):
    """Symmetric per-vector int8 quantization: ``scale = max(|x|)/127`` and
    ``q_i = round_even(x_i / scale)`` (so ``q * scale`` dequantizes) — the
    standard 4x memory reduction before ANN serving.  All-zero vectors keep
    ``scale = 0`` and quantize to zeros.

    Per-document and stateless: one ``map_batches`` pass over the Arrow list
    layout (``reduceat`` row maxima over the flat values buffer, one rounding
    pass), no shuffle — embarrassingly parallel at any corpus size.  Values
    are widened to float64 BEFORE the divide so a SQL oracle
    (``x::DOUBLE / scale`` + ``round_even``) replays the doubles bit-for-bit.

    Output columns: ``(id_column, scale: float64, q: list<int8>)``.
    """

    def quantize(batch: pa.Table) -> pa.Table:
        col = batch.column(embedding_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]  # sliced ListArrays share the child buffer
        flat = col.values.to_numpy(zero_copy_only=False)[base:offsets[-1]].astype(np.float64)
        counts = np.diff(offsets)
        starts = offsets[:-1] - base
        nonempty = counts > 0
        scale = np.zeros(n, dtype=np.float64)
        if nonempty.any() and len(flat):
            maxima = np.maximum.reduceat(np.abs(flat), starts[nonempty])
            scale[nonempty] = maxima / 127.0
        srep = np.repeat(scale, counts)
        with np.errstate(divide='ignore', invalid='ignore'):
            q = np.where(srep > 0, np.round(flat / srep), 0.0).astype(np.int8)
        q_list = pa.ListArray.from_arrays(pa.array(offsets - base, pa.int32()),
                                          pa.array(q, pa.int8()))
        return pa.table({id_column: batch.column(id_column),
                         'scale': pa.array(scale, pa.float64()),
                         'q': q_list})

    return ds.map_batches(quantize, batch_format='pyarrow', zero_copy_batch=True)


def truncate_normalize(ds, *, embedding_column: str = 'embedding',
                       id_column: str = 'vec_id', dims: int = 16):
    """Matryoshka-style truncation: keep the first ``dims`` dimensions and
    L2-renormalize — the standard cheap-retrieval projection for
    MRL-trained embeddings (Kusupati et al. 2022), also the honest baseline
    for any dimensionality-reduction stage.

    Per-row and stateless (one ``map_batches``, no shuffle).  Values widen
    to float64 first and the squared-norm accumulates SEQUENTIALLY over the
    kept dimensions (a Python-free loop of ``dims`` vectorized adds), so a
    SQL oracle's left-fold ``list_sum`` replays the doubles bit-for-bit —
    IEEE sqrt and divide are correctly rounded, making the whole output
    bit-exact.  Vectors shorter than ``dims`` raise; zero-norm truncations
    yield null components.

    Output: ``(id_column, t: list<float64>)`` with ``len(t) == dims``.
    """
    if dims < 1:
        raise ValueError(f'dims must be >= 1, got {dims}')

    def project(batch: pa.Table) -> pa.Table:
        col = batch.column(embedding_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({id_column: batch.column(id_column),
                             't': pa.array([], pa.list_(pa.float64()))})
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        if (counts < dims).any():
            short = int((counts < dims).sum())
            raise ValueError(f'{short} vectors shorter than dims={dims}')
        base = offsets[0]
        flat = col.values.to_numpy(zero_copy_only=False)[base:offsets[-1]].astype(np.float64)
        starts = offsets[:-1] - base
        m = flat[starts[:, None] + np.arange(dims)[None, :]]   # (n, dims) float64
        sq = np.zeros(n, dtype=np.float64)
        for j in range(dims):                                   # sequential fold = SQL list_sum
            sq = sq + m[:, j] * m[:, j]
        norm = np.sqrt(sq)
        with np.errstate(divide='ignore', invalid='ignore'):
            out = m / norm[:, None]
        mask = np.repeat(~(norm > 0), dims)
        values = pa.array(out.ravel(), mask=mask)
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dims, dims, dtype=np.int32)), values)
        return pa.table({id_column: batch.column(id_column), 't': lists})

    return ds.map_batches(project, batch_format='pyarrow', zero_copy_batch=True)


def pca_project(ds, *, embedding_column: str = 'embedding',
                id_column: str = 'vec_id', k: int = 4):
    """PCA dimensionality reduction over the embedding corpus — the learned
    counterpart of :func:`truncate_normalize` (e.g. compressing embeddings
    before IVF bucketing or near-dup LSH).

    Scale shape: ONE partial pass computes the exact global second-moment
    state — each batch emits ``(n, sum_vector, X'X)`` (size dim^2, corpus-size
    independent) — the driver folds the partials in block order, forms the
    sample covariance, takes the top-``k`` eigenvectors (``np.linalg.eigh``;
    deterministic sign convention: each component's largest-|coordinate|
    entry is made positive), and broadcasts ``(mean, components)`` once via
    ``ray.put`` into a stateless projection ``map_batches`` — no shuffle at
    any stage, the same partial->broadcast shape as the global scalers.

    Returns ``(projected_ds, fit)`` where ``projected_ds`` has columns
    ``(id_column, pc_0..pc_{k-1}: float64)`` (scalar columns, hash-gateable)
    and ``fit`` is a dict with ``mean``, ``components`` (k, dim),
    ``eigenvalues`` (descending) and ``explained_ratio``.
    """
    import pickle

    if k < 1:
        raise ValueError(f'k must be >= 1, got {k}')

    def partial(batch: pa.Table) -> pa.Table:
        emb = _embedding_matrix(batch.column(embedding_column))
        state = (emb.shape[0], emb.sum(axis=0), emb.T @ emb)
        return pa.table({'state': [pickle.dumps(state)]})

    rows = ds.map_batches(partial, batch_format='pyarrow').take_all()
    n_total = 0
    s_vec = None
    xtx = None
    for r in rows:
        n_i, s_i, x_i = pickle.loads(r['state'])
        n_total += n_i
        s_vec = s_i if s_vec is None else s_vec + s_i
        xtx = x_i if xtx is None else xtx + x_i
    if n_total < 2:
        raise ValueError(f'PCA needs >= 2 rows, got {n_total}')
    dim = len(s_vec)
    if k > dim:
        raise ValueError(f'k={k} exceeds embedding dim {dim}')
    mean = s_vec / n_total
    cov = (xtx - n_total * np.outer(mean, mean)) / (n_total - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(eigvals)[::-1][:k]
    components = eigvecs[:, order].T                # (k, dim)
    eigenvalues = eigvals[order]
    # deterministic sign: the largest-|coordinate| entry of each component
    # is positive (first occurrence wins ties)
    for i in range(k):
        j = int(np.argmax(np.abs(components[i])))
        if components[i, j] < 0:
            components[i] = -components[i]
    fit = {'mean': mean, 'components': components, 'eigenvalues': eigenvalues,
           'explained_ratio': eigenvalues / max(float(eigvals.sum()), 1e-300)}
    import ray as _ray
    handle = _ray.put((mean, components))

    def project(batch: pa.Table) -> pa.Table:
        m, w = _ray.get(handle)
        emb = _embedding_matrix(batch.column(embedding_column))
        proj = (emb - m) @ w.T
        out = {id_column: batch.column(id_column)}
        for i in range(k):
            out[f'pc_{i}'] = pa.array(proj[:, i], pa.float64())
        return pa.table(out)

    return ds.map_batches(project, batch_format='pyarrow', zero_copy_batch=True), fit


def kmeans_cluster(ds, *, embedding_column: str = 'embedding',
                   id_column: str = 'vec_id', num_clusters: int = 8,
                   iterations: int = 10, seed: int = 3,
                   train_sample: int = 2048):
    """First-class embedding clustering (SemDeDup-style bucketing, corpus
    stratification, IVF coarse quantization exposed as an operator): fit the
    deterministic Lloyd quantizer on a bounded driver sample, broadcast the
    centroids once, assign every row in a stateless ``map_batches``.

    Returns ``(assigned_ds, centroids)`` where ``assigned_ds`` has columns
    ``(id_column, cluster: int64)`` and ``centroids`` is the (k, dim) float64
    array.  Assignment is by max cosine against unit centroids — identical to
    the IVF coarse quantizer, so persisted IVF buckets and these cluster ids
    agree for the same (k, seed, sample).
    """
    import ray

    sample_rows = sorted(ds.limit(train_sample).take_all(),
                         key=lambda r: r[id_column])  # block order is run-varying
    sample = np.stack([np.asarray(r[embedding_column], dtype=np.float64)
                       for r in sample_rows])
    quantizer = KMeansQuantizer(num_centroids=num_clusters, iterations=iterations,
                                seed=seed).fit(sample)
    handle = ray.put(quantizer.centroids)

    def assign(batch: pa.Table) -> pa.Table:
        centroids = ray.get(handle)
        emb = _embedding_matrix(batch.column(embedding_column))
        cluster = np.argmax(_unit(emb) @ centroids.T, axis=1).astype(np.int64)
        return pa.table({id_column: batch.column(id_column),
                         'cluster': pa.array(cluster)})

    return ds.map_batches(assign, batch_format='pyarrow', zero_copy_batch=True), \
        quantizer.centroids


def semdedup(ds, *, embedding_column: str = 'embedding', id_column: str = 'vec_id',
             num_clusters: int = 16, threshold: float = 0.95,
             iterations: int = 10, seed: int = 3, train_sample: int = 2048,
             num_partitions: int = 16):
    """SemDeDup (Abbas et al. 2023): semantic dedup by k-means bucketing +
    WITHIN-cluster pairwise-cosine pruning — the embedding analogue of
    LSH-banded MinHash: the O(n^2) comparison collapses to O(sum c_k^2) over
    cluster sizes, and each cluster resolves inside one reduce task.

    Pipeline: the deterministic Lloyd fit (same as :func:`kmeans_cluster`)
    assigns clusters inside ``map_batches``; one cluster-keyed exchange
    co-locates each cluster; the reduce sorts by id and drops every row
    whose cosine to an EARLIER-id row of the same cluster is
    ``>= threshold`` (keep-min-id, the engine's dedup convention).  Returns
    the SURVIVING ``(id_column, cluster)`` rows.  Choose ``num_clusters`` so
    a cluster's gram matrix fits a task (SemDeDup's own knob); cross-cluster
    near-dups are out of contract exactly as in the paper.
    """
    import ray

    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    if not 0 < threshold <= 1:
        raise ValueError(f'threshold must be in (0, 1], got {threshold}')
    sample_rows = sorted(ds.limit(train_sample).take_all(),
                         key=lambda r: r[id_column])  # block order is run-varying
    sample = np.stack([np.asarray(r[embedding_column], dtype=np.float64)
                       for r in sample_rows])
    quantizer = KMeansQuantizer(num_centroids=num_clusters, iterations=iterations,
                                seed=seed).fit(sample)
    handle = ray.put(quantizer.centroids)

    def assign(batch: pa.Table) -> pa.Table:
        centroids = ray.get(handle)
        emb = _embedding_matrix(batch.column(embedding_column))
        cluster = np.argmax(_unit(emb) @ centroids.T, axis=1).astype(np.int64)
        return pa.table({id_column: batch.column(id_column),
                         'cluster': pa.array(cluster),
                         embedding_column: batch.column(embedding_column)})

    def prune(table: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({id_column: pa.array([], pa.int64()),
                          'cluster': pa.array([], pa.int64())})
        if table.num_rows == 0 or table.num_columns == 0:
            return empty
        table = table.take(pc.sort_indices(table, sort_keys=[
            ('cluster', 'ascending'), (id_column, 'ascending')]))
        clusters = table.column('cluster').to_numpy(zero_copy_only=False)
        emb = _embedding_matrix(table.column(embedding_column))
        ids = table.column(id_column)
        keep = np.ones(len(clusters), dtype=bool)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(clusters) != 0) + 1,
                                 [len(clusters)]))
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s < 2:
                continue
            u = _unit(emb[s:e])
            sims = u @ u.T
            # drop j if any EARLIER i (by id order) has cos >= threshold
            dup = (np.triu(sims, k=1) >= threshold).any(axis=0)
            keep[s:e] = ~dup
        mask = pa.array(keep)
        return pa.table({id_column: ids.filter(mask),
                         'cluster': table.column('cluster').filter(mask)})

    assigned = ds.map_batches(assign, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(assigned, ['cluster'], num_partitions, prune)
