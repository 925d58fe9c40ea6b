"""Embedding int8 quantization (datapipe/similarity.py quantize_embeddings).

SQL-oracle parity at sf0.01 is gated by tools/check_correctness.py
(``quantize_embeddings``); here we pin the math, the dequantization error
bound, zero vectors, and the sliced-ListArray offset handling.
"""

import numpy as np
import pyarrow as pa
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
