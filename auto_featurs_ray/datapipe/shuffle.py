"""Deterministic global shuffle and train/validation splits.

Training-data pipelines need reproducible row order and reproducible holdout
membership.  ``ray.data.Dataset.random_shuffle`` is neither deterministic
across runs/cluster shapes nor cheap (full materialization); these operators
derive everything from a keyed hash, so results are identical for any block
layout, partition count or cluster size:

* :func:`deterministic_shuffle` — global pseudo-random permutation: rows are
  hash-partitioned by ``siphash(key, seed)`` and sorted by that hash within
  each partition.  One exchange, O(rows) work, stable across runs.
* :func:`hash_split` — assign each row to a named split by hash bucket
  (e.g. train/val/test); membership is a pure function of (key, seed), so it
  never changes when data is re-sharded or the pipeline re-runs.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SHUFFLE_KEY = '__afr_shuffle_hash'


def _keyed_hash(column: pa.ChunkedArray, seed: int) -> np.ndarray:
    """64-bit seed-dependent hash per key.

    pandas' siphash key only applies to object dtypes (numeric columns are
    bit-mixed without it), so the seed is folded in afterwards with a
    splitmix64 finalizer — full avalanche, so different seeds give
    independent pseudo-random orders for any key dtype.
    """
    series = column.to_pandas()
    h = pd.util.hash_pandas_object(series, index=False).to_numpy().astype(np.uint64)
    z = h ^ np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z.view(np.int64)


def deterministic_shuffle(ds, *, key_column: str, seed: int = 0, num_partitions: int = 64):
    """Reproducible global shuffle: same (key, seed) -> same position, on any
    cluster shape.  Returns a Dataset whose partition files / blocks enumerate
    rows in the permuted order."""
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(_SHUFFLE_KEY, pa.array(_keyed_hash(batch.column(key_column), seed)))

    def order_partition(table: pa.Table, _pid: int) -> pa.Table:
        idx = pc.sort_indices(table, sort_keys=[(_SHUFFLE_KEY, 'ascending'),
                                                (key_column, 'ascending')])
        return table.take(idx).drop_columns([_SHUFFLE_KEY])

    hashed = ds.map_batches(add_hash, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(hashed, [_SHUFFLE_KEY], num_partitions, order_partition)


def hash_split(ds, *, key_column: str, fractions: Dict[str, float], seed: int = 0):
    """Deterministic named splits, e.g. ``{'train': 0.98, 'val': 0.01,
    'test': 0.01}``.  Adds a ``split`` column; filter per split downstream
    (``ds.filter`` / ``pc.equal``) so one pass serves all splits.
    """
    total = sum(fractions.values())
    if not np.isclose(total, 1.0):
        raise ValueError(f'Split fractions must sum to 1.0, got {total}')
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names])

    def assign(batch: pa.Table) -> pa.Table:
        h = _keyed_hash(batch.column(key_column), seed).view(np.uint64)
        u = h / float(2 ** 64)  # uniform [0, 1) per key
        idx = np.searchsorted(bounds, u, side='right')
        idx = np.minimum(idx, len(names) - 1)
        values = np.asarray(names, dtype=object)[idx]
        return batch.append_column('split', pa.array(values, pa.string()))

    return ds.map_batches(assign, batch_format='pyarrow', zero_copy_batch=True)
