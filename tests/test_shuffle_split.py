"""Deterministic shuffle / hash-split operators."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from auto_featurs_ray.datapipe.shuffle import deterministic_shuffle, hash_split


def _table(n=2000):
    return pa.table({'doc_id': pa.array(np.arange(n), pa.int64()),
                     'payload': pa.array([f'p{i}' for i in range(n)])})


def test_shuffle_is_permutation_and_deterministic():
    out1 = deterministic_shuffle(rd.from_arrow(_table()), key_column='doc_id',
                                 seed=7, num_partitions=8).to_pandas()
    out2 = deterministic_shuffle(rd.from_arrow(_table()), key_column='doc_id',
                                 seed=7, num_partitions=8).to_pandas()
    assert sorted(out1['doc_id']) == list(range(2000))       # a permutation
    assert out1['doc_id'].tolist() == out2['doc_id'].tolist()  # reproducible
    assert out1['doc_id'].tolist() != sorted(out1['doc_id'])   # actually shuffled
    # a different seed gives a different order
    out3 = deterministic_shuffle(rd.from_arrow(_table()), key_column='doc_id',
                                 seed=8, num_partitions=8).to_pandas()
    assert out1['doc_id'].tolist() != out3['doc_id'].tolist()


def test_shuffle_independent_of_layout():
    # block count / partition count must not change the permutation
    a = deterministic_shuffle(rd.from_arrow(_table()).repartition(3), key_column='doc_id',
                              seed=7, num_partitions=4).to_pandas()
    b = deterministic_shuffle(rd.from_arrow(_table()).repartition(11), key_column='doc_id',
                              seed=7, num_partitions=4).to_pandas()
    assert a['doc_id'].tolist() == b['doc_id'].tolist()


def test_hash_split_fractions_and_stability():
    out = hash_split(rd.from_arrow(_table(5000)), key_column='doc_id',
                     fractions={'train': 0.8, 'val': 0.1, 'test': 0.1}, seed=3).to_pandas()
    counts = out['split'].value_counts(normalize=True)
    assert abs(counts['train'] - 0.8) < 0.03
    assert abs(counts['val'] - 0.1) < 0.02
    # membership is per-key stable: recompute on a subset, assignments agree
    sub = hash_split(rd.from_arrow(_table(1000)), key_column='doc_id',
                     fractions={'train': 0.8, 'val': 0.1, 'test': 0.1}, seed=3).to_pandas()
    merged = out.merge(sub, on='doc_id', suffixes=('_full', '_sub'))
    assert (merged['split_full'] == merged['split_sub']).all()


def test_hash_split_validates_fractions():
    with pytest.raises(ValueError):
        hash_split(rd.from_arrow(_table(10)), key_column='doc_id',
                   fractions={'train': 0.5, 'val': 0.1})


class TestTopKAndSampling:
    def test_top_k_exact(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import top_k
        rng = np.random.default_rng(4)
        vals = rng.integers(0, 100, 500)  # plenty of ties
        vals[10] = 1000
        t = pa.table({'id': pa.array(np.arange(500), pa.int64()),
                      'v': pa.array(vals, pa.int64())})
        ds = rd.from_arrow([t.slice(i, 50) for i in range(0, 500, 50)])
        out = top_k(ds, column='v', k=25, id_column='id')
        want = sorted(zip(vals, np.arange(500)), key=lambda p: (-p[0], p[1]))[:25]
        got = list(zip(out.column('v').to_pylist(), out.column('id').to_pylist()))
        assert got == [(int(v), int(i)) for v, i in want]

    def test_top_k_tie_at_partial_boundary_and_unsigned(self):
        """Round-3 ADVICE repro: a k-boundary tie inside ONE batch must keep
        the id-ascending winner (an argpartition cut drops it arbitrarily),
        and unsigned value columns must not wrap under negation."""
        import pyarrow as pa
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import top_k
        t = pa.table({'id': pa.array([5, 3], pa.int64()),
                      'v': pa.array([10, 10], pa.uint64())})
        out = top_k(rd.from_arrow(t), column='v', k=1, id_column='id')
        assert out.column('id').to_pylist() == [3]

    def test_top_k_skips_nulls(self):
        import pyarrow as pa
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import top_k
        t = pa.table({'id': pa.array([1, 2, 3], pa.int64()),
                      'v': pa.array([None, 5.0, 1.0], pa.float64())})
        out = top_k(rd.from_arrow(t), column='v', k=2, id_column='id')
        assert out.column('id').to_pylist() == [2, 3]

    def test_deterministic_sample_block_layout_invariant(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import deterministic_sample
        t = pa.table({'id': pa.array(np.arange(1000), pa.int64())})

        def run(num_slices):
            ds = rd.from_arrow([t.slice(i, 1000 // num_slices)
                                for i in range(0, 1000, 1000 // num_slices)])
            out = deterministic_sample(ds, key_column='id', rate=0.25, seed=3)
            return sorted(out.to_pandas()['id'])

        a, b = run(4), run(20)
        assert a == b
        assert 150 < len(a) < 350  # ~rate * n

    def test_stratified_sample_exact_n_and_layout_invariant(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import stratified_sample
        rng = np.random.default_rng(9)
        strata = rng.choice(['a', 'b', 'c', 'tiny'], 1200, p=[0.5, 0.3, 0.19, 0.01])
        t = pa.table({'id': pa.array(np.arange(1200), pa.int64()),
                      'g': pa.array(strata)})

        def run(num_slices):
            step = 1200 // num_slices
            ds = rd.from_arrow([t.slice(i, step) for i in range(0, 1200, step)])
            out = stratified_sample(ds, stratum_column='g', key_column='id',
                                    n_per_stratum=20, seed=2, num_partitions=4)
            return out.to_pandas().sort_values(['g', 'id']).reset_index(drop=True)

        a, b = run(3), run(24)
        assert a.equals(b)  # pure function of row identity, not block layout
        counts = a.groupby('g').size().to_dict()
        truth = {g: min(20, int((strata == g).sum())) for g in ['a', 'b', 'c', 'tiny']}
        assert counts == truth  # exactly n per stratum, capped by population

    def test_sample_rate_validation(self):
        import pyarrow as pa
        import pytest as _pytest
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import deterministic_sample
        ds = rd.from_arrow(pa.table({'id': pa.array([1], pa.int64())}))
        with _pytest.raises(ValueError):
            deterministic_sample(ds, key_column='id', rate=1.5)


class TestWeightedSample:
    def test_probability_column_drives_membership(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import weighted_sample
        n = 2000
        t = pa.table({'doc_id': pa.array(range(n), pa.int64()),
                      'p': pa.array([0.0] * (n // 2) + [1.0] * (n // 2))})
        out = weighted_sample(rd.from_arrow(t), key_column='doc_id',
                              prob_column='p', seed=5).to_pandas()
        # p=0 rows never survive, p=1 rows always do
        assert (out['p'] == 1.0).all() and len(out) == n // 2

    def test_membership_is_layout_invariant_and_seeded(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import weighted_sample
        n = 500
        t = pa.table({'doc_id': pa.array(range(n), pa.int64()),
                      'p': pa.array([0.5] * n)})
        a = weighted_sample(rd.from_arrow(t), key_column='doc_id',
                            prob_column='p', seed=5).to_pandas()
        b = weighted_sample(rd.from_arrow([t.slice(i, 100) for i in range(0, n, 100)]),
                            key_column='doc_id', prob_column='p', seed=5).to_pandas()
        c = weighted_sample(rd.from_arrow(t), key_column='doc_id',
                            prob_column='p', seed=6).to_pandas()
        assert sorted(a['doc_id']) == sorted(b['doc_id'])
        assert sorted(a['doc_id']) != sorted(c['doc_id'])
        assert 150 < len(a) < 350   # ~half survive

    def test_null_probability_drops(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.sampling import weighted_sample
        t = pa.table({'doc_id': pa.array([1, 2], pa.int64()),
                      'p': pa.array([None, 1.0], pa.float64())})
        out = weighted_sample(rd.from_arrow(t), key_column='doc_id',
                              prob_column='p').to_pandas()
        assert out['doc_id'].tolist() == [2]
