"""Embedding int8 quantization (datapipe/similarity.py quantize_embeddings).

SQL-oracle parity at sf0.01 is gated by tools/check_correctness.py
(``quantize_embeddings``); here we pin the math, the dequantization error
bound, zero vectors, and the sliced-ListArray offset handling.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from auto_featurs_ray.datapipe.similarity import quantize_embeddings


def table_of(vectors):
    return pa.table({'vec_id': pa.array(range(len(vectors)), pa.int64()),
                     'embedding': pa.array([list(map(float, v)) for v in vectors],
                                           pa.list_(pa.float32()))})


def run(vectors, blocks=2):
    t = table_of(vectors)
    step = max(1, -(-t.num_rows // blocks))
    # slice() exercises non-zero child-buffer offsets in the kernel
    ds = rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])
    return quantize_embeddings(ds).to_pandas().sort_values('vec_id').reset_index(drop=True)


class TestQuantize:
    def test_roundtrip_error_bounded_by_half_scale(self):
        rng = np.random.default_rng(7)
        vectors = [rng.standard_normal(64) for _ in range(9)]
        got = run(vectors, blocks=3)
        for i, v in enumerate(vectors):
            v = v.astype(np.float32).astype(np.float64)  # stored as float32
            scale = got.loc[i, 'scale']
            q = np.asarray(got.loc[i, 'q'], dtype=np.int64)
            assert scale == np.abs(v).max() / 127.0
            assert np.abs(q).max() <= 127
            err = np.abs(q * scale - v)
            assert (err <= scale / 2 + 1e-12).all()

    def test_extremes_hit_plus_minus_127(self):
        got = run([[-3.0, 0.0, 3.0]])
        assert got.loc[0, 'q'].tolist() == [-127, 0, 127]

    def test_zero_vector(self):
        got = run([[0.0, 0.0], [1.0, -1.0]])
        assert got.loc[0, 'scale'] == 0.0 and got.loc[0, 'q'].tolist() == [0, 0]
        assert got.loc[1, 'q'].tolist() == [127, -127]

    def test_banker_rounding_on_exact_half_ticks(self):
        # scale = 254/127 = 2.0, so x/scale hits exact halves: 0.5 -> 0 and
        # 1.5 -> 2 under round-half-even (what both np.round and the SQL
        # oracle's round_even produce)
        got = run([[1.0, 3.0, 254.0]])
        assert got.loc[0, 'scale'] == 2.0
        assert got.loc[0, 'q'].tolist() == [0, 2, 127]


class TestPcaProject:
    def test_matches_numpy_pca(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.similarity import pca_project

        rng = np.random.default_rng(12)
        n, dim, k = 400, 8, 3
        # anisotropic data so components are well separated
        basis = rng.standard_normal((dim, dim))
        scales = np.array([8.0, 4.0, 2.0, 1.0, 0.5, 0.25, 0.1, 0.05])
        x = rng.standard_normal((n, dim)) * scales @ basis
        tbl = pa.table({'vec_id': pa.array(range(n), pa.int64()),
                        'embedding': pa.array(list(x), pa.list_(pa.float64()))})
        blocks = [tbl.slice(i, 60) for i in range(0, n, 60)]
        out, fit = pca_project(rd.from_arrow(blocks), k=k)
        df = out.to_pandas().sort_values('vec_id').reset_index(drop=True)

        mean = x.mean(axis=0)
        cov = np.cov(x, rowvar=False, ddof=1)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:k]
        np.testing.assert_allclose(fit['eigenvalues'], evals[order], rtol=1e-8)
        w = evecs[:, order].T
        for i in range(k):
            j = int(np.argmax(np.abs(w[i])))
            if w[i, j] < 0:
                w[i] = -w[i]
        want = (x - mean) @ w.T
        got = df[[f'pc_{i}' for i in range(k)]].to_numpy()
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)
        # projections are centered: column means ~ 0
        np.testing.assert_allclose(got.mean(axis=0), np.zeros(k), atol=1e-9)

    def test_validation(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.similarity import pca_project

        tbl = pa.table({'vec_id': pa.array([0], pa.int64()),
                        'embedding': pa.array([[1.0, 2.0]], pa.list_(pa.float64()))})
        with pytest.raises(ValueError, match='>= 2 rows'):
            pca_project(rd.from_arrow(tbl), k=1)


class TestKmeansCluster:
    def test_deterministic_and_agrees_with_quantizer(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.similarity import (KMeansQuantizer,
                                                          kmeans_cluster)

        rng = np.random.default_rng(15)
        n, dim = 300, 8
        emb = rng.standard_normal((n, dim))
        tbl = pa.table({'vec_id': pa.array(range(n), pa.int64()),
                        'embedding': pa.array(list(emb), pa.list_(pa.float64()))})
        blocks = [tbl.slice(i, 70) for i in range(0, n, 70)]
        a1, c1 = kmeans_cluster(rd.from_arrow(blocks), num_clusters=6)
        a2, c2 = kmeans_cluster(rd.from_arrow(blocks), num_clusters=6)
        d1 = a1.to_pandas().sort_values('vec_id').reset_index(drop=True)
        d2 = a2.to_pandas().sort_values('vec_id').reset_index(drop=True)
        assert d1.equals(d2)
        np.testing.assert_array_equal(c1, c2)
        # assignments match the quantizer applied directly
        q = KMeansQuantizer(num_centroids=6).fit(emb[:300])
        # fit sample = limit(2048) = all rows in block order == emb order
        np.testing.assert_array_equal(d1['cluster'].to_numpy(), q.assign(emb))
        assert set(d1['cluster']) == set(range(6)) or len(set(d1['cluster'])) >= 4


class TestSemDeDup:
    def test_planted_near_dups_pruned_keep_min_id(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.similarity import semdedup

        rng = np.random.default_rng(19)
        n, dim = 240, 12
        emb = rng.standard_normal((n, dim))
        ids = np.arange(n, dtype=np.int64)
        # plant: every 10th vector duplicated (tiny perturbation) under id+1000
        pick = ids % 10 == 0
        dup = emb[pick] + 0.01 * rng.standard_normal((pick.sum(), dim))
        all_ids = np.concatenate([ids, ids[pick] + 1000])
        all_emb = np.concatenate([emb, dup])
        tbl = pa.table({'vec_id': pa.array(all_ids),
                        'embedding': pa.array(list(all_emb), pa.list_(pa.float64()))})
        blocks = [tbl.slice(i, 50) for i in range(0, len(all_ids), 50)]
        out = semdedup(rd.from_arrow(blocks), num_clusters=8, threshold=0.95,
                       num_partitions=4).to_pandas()
        survivors = set(out['vec_id'])
        # every planted duplicate (id >= 1000) whose twin shares a cluster is
        # dropped and the ORIGINAL (smaller id) survives
        originals = set(ids[pick].tolist())
        assert originals <= survivors
        dropped = {i + 1000 for i in ids[pick]} - survivors
        assert len(dropped) >= 0.8 * pick.sum()  # same-cluster recall
        # no survivor pair within a cluster exceeds the threshold
        df = out.merge(
            __import__('pandas').DataFrame({'vec_id': all_ids,
                                            'i': range(len(all_ids))}), on='vec_id')
        for _, grp in df.groupby('cluster'):
            u = all_emb[grp['i'].to_numpy()]
            u = u / np.linalg.norm(u, axis=1, keepdims=True)
            sims = u @ u.T
            np.fill_diagonal(sims, 0.0)
            assert (sims < 0.95).all()

    def test_threshold_validation(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.similarity import semdedup

        tbl = pa.table({'vec_id': pa.array([0], pa.int64()),
                        'embedding': pa.array([[1.0, 0.0]], pa.list_(pa.float64()))})
        with pytest.raises(ValueError, match='threshold'):
            semdedup(rd.from_arrow(tbl), threshold=1.5)
