"""Distributed PageRank: parity with a single-process power iteration."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from auto_featurs_ray.datapipe.graph import pagerank


def _reference(edges, n_map, damping, iterations, undirected):
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    pairs = [(idx[s], idx[d]) for s, d in edges]
    if undirected:
        pairs = pairs + [(d, s) for s, d in pairs]
    out = np.zeros(n)
    for s, _ in pairs:
        out[s] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        total = np.zeros(n)
        for s, d in pairs:
            total[d] += rank[s] / out[s]
        dangling = rank[out == 0].sum()
        rank = (1 - damping) / n + damping * (total + dangling / n)
    return nodes, rank


class TestPageRank:
    def test_matches_power_iteration(self):
        rng = np.random.default_rng(14)
        edges = [(int(rng.integers(0, 40)), int(rng.integers(0, 40))) for _ in range(300)]
        tbl = pa.table({'src': pa.array([e[0] for e in edges], pa.int64()),
                        'dst': pa.array([e[1] for e in edges], pa.int64())})
        blocks = [tbl.slice(i, 37) for i in range(0, 300, 37)]
        for undirected in (False, True):
            ds, info = pagerank(rd.from_arrow(blocks), iterations=15,
                                undirected=undirected)
            got = ds.to_pandas().sort_values('node')
            nodes, want = _reference(edges, None, 0.85, 15, undirected)
            assert got['node'].tolist() == nodes
            np.testing.assert_allclose(got['rank'].to_numpy(), want, rtol=1e-10)
            assert abs(got['rank'].sum() - 1.0) < 1e-9
            assert info['n_edges'] == 300
            # converging: L1 deltas shrink
            assert info['l1_deltas'][-1] < info['l1_deltas'][0]

    def test_dangling_nodes_redistribute(self):
        # 1 -> 2, 2 has no out-edges: mass must not leak
        tbl = pa.table({'src': pa.array([1], pa.int64()),
                        'dst': pa.array([2], pa.int64())})
        ds, info = pagerank(rd.from_arrow(tbl), iterations=30)
        out = ds.to_pandas().sort_values('node')
        assert abs(out['rank'].sum() - 1.0) < 1e-9
        assert out['rank'].iloc[1] > out['rank'].iloc[0]  # sink holds more mass

    def test_validation(self):
        tbl = pa.table({'src': pa.array([1], pa.int64()), 'dst': pa.array([2], pa.int64())})
        with pytest.raises(ValueError, match='damping'):
            pagerank(rd.from_arrow(tbl), damping=1.5)
