"""Distributed graph algorithms over edge-list Datasets.

Complements the dedup module's distributed connected components:
:func:`pagerank` ranks nodes of an edge list (document-authority weighting,
canonical-representative selection inside near-dup clusters, link-graph
quality signals).

Scale shape — the iterative raw-task pattern shared with the logistic
classifier: the edge list is materialized ONCE as block refs with
node-index-encoded endpoints; every iteration broadcasts the rank vector
(``ray.put``, one object) and each block task emits a combinable
contribution partial (``np.bincount`` over destination indices), folded on
the driver.  The rank vector is driver/broadcast-resident, so the op is
sized for node counts up to ~10^7-10^8 (the same broadcast bound the
one-hot vocabulary and k-means quantizer document); edge count is unbounded
— edges stream through block tasks.  Deterministic: fixed iterations, fold
in block order.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa


def pagerank(edges, *, src_column: str = 'src', dst_column: str = 'dst',
             damping: float = 0.85, iterations: int = 20,
             undirected: bool = False):
    """PageRank over an edge-list Dataset; returns ``(ds, info)``.

    ``ds`` has columns ``(node: int64, rank: float64)`` summing to 1;
    ``info`` carries ``n_nodes``, ``n_edges`` and the per-iteration L1
    deltas.  ``undirected=True`` mirrors every edge.  Dangling nodes (no
    out-edges) redistribute their mass uniformly (standard convention).
    Self-loops and duplicate edges count like any other edge.
    """
    import ray
    import ray.data

    if not 0 < damping < 1:
        raise ValueError(f'damping must be in (0, 1), got {damping}')
    if iterations < 1:
        raise ValueError(f'iterations must be >= 1, got {iterations}')

    edges = edges.select_columns([src_column, dst_column]).materialize()
    block_refs = edges.to_arrow_refs()

    @ray.remote
    def node_partial(block: pa.Table) -> bytes:
        s = block.column(src_column).cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = block.column(dst_column).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pickle.dumps((np.unique(np.concatenate([s, d])), len(s)))

    uniq_sets = []
    n_edges = 0
    for blob in ray.get([node_partial.remote(r) for r in block_refs]):
        u, m = pickle.loads(blob)
        uniq_sets.append(u)
        n_edges += m
    nodes = np.unique(np.concatenate(uniq_sets)) if uniq_sets else np.zeros(0, np.int64)
    n = len(nodes)
    if n == 0:
        return ray.data.from_arrow(pa.table({'node': pa.array([], pa.int64()),
                                             'rank': pa.array([], pa.float64())})), \
            {'n_nodes': 0, 'n_edges': 0, 'l1_deltas': []}
    nodes_ref = ray.put(nodes)

    @ray.remote
    def encode_block(block: pa.Table) -> pa.Table:
        ns = ray.get(nodes_ref)
        s = np.searchsorted(ns, block.column(src_column).cast(pa.int64())
                            .to_numpy(zero_copy_only=False))
        d = np.searchsorted(ns, block.column(dst_column).cast(pa.int64())
                            .to_numpy(zero_copy_only=False))
        if undirected:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        return pa.table({'s': pa.array(s.astype(np.int64)),
                         'd': pa.array(d.astype(np.int64))})

    enc_refs = [encode_block.remote(r) for r in block_refs]

    @ray.remote
    def outdeg_partial(block: pa.Table) -> np.ndarray:
        return np.bincount(block.column('s').to_numpy(zero_copy_only=False), minlength=n)

    outdeg = np.zeros(n, dtype=np.int64)
    for part in ray.get([outdeg_partial.remote(r) for r in enc_refs]):
        outdeg += part

    @ray.remote
    def contrib_partial(block: pa.Table, state) -> np.ndarray:
        share = state  # rank / outdeg, precomputed on the driver
        s = block.column('s').to_numpy(zero_copy_only=False)
        d = block.column('d').to_numpy(zero_copy_only=False)
        return np.bincount(d, weights=share[s], minlength=n)

    rank = np.full(n, 1.0 / n)
    deltas = []
    safe_out = np.maximum(outdeg, 1)
    for _ in range(iterations):
        share_ref = ray.put(rank / safe_out)
        total = np.zeros(n, dtype=np.float64)
        for part in ray.get([contrib_partial.remote(r, share_ref) for r in enc_refs]):
            total += part
        dangling = float(rank[outdeg == 0].sum())
        new_rank = (1.0 - damping) / n + damping * (total + dangling / n)
        deltas.append(float(np.abs(new_rank - rank).sum()))
        rank = new_rank

    out = ray.data.from_arrow(pa.table({'node': pa.array(nodes),
                                        'rank': pa.array(rank, pa.float64())}))
    return out, {'n_nodes': n, 'n_edges': n_edges, 'l1_deltas': deltas}
