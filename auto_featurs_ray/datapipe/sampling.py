"""Distributed top-k and deterministic sampling.

* :func:`top_k` — global top-k rows by a column: each batch emits only its
  local top-k (vectorized ``argpartition``), a tiny driver merge picks the
  final k.  Work scales linearly over the corpus, zero shuffle, and the
  driver never holds more than ``k x num_batches`` rows.  Ties break on the
  id column ascending, so results are deterministic on any block layout.
* :func:`deterministic_sample` — keep each row iff its keyed splitmix64 hash
  maps below ``rate`` (the same hash family as
  :mod:`auto_featurs_ray.datapipe.shuffle`): membership is a pure function
  of (key, seed), reproducible on any cluster shape, and expressible in
  exact integer SQL for the oracle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.datapipe.shuffle import _keyed_hash


def top_k(ds, *, column: str, k: int, id_column: str, descending: bool = True,
          keep_columns: Sequence[str] = ()) -> pa.Table:
    """Global top-k rows by ``column`` (nulls never win), ties broken by
    ``id_column`` ascending.  Returns a k-row Arrow table with
    ``(id_column, column, *keep_columns)``."""
    keep = [id_column, column, *[c for c in keep_columns if c not in (id_column, column)]]

    def partial(batch: pa.Table) -> pa.Table:
        sub = batch.select([c for c in keep if c in batch.column_names])
        sub = sub.filter(pc.is_valid(sub.column(column)))
        n = sub.num_rows
        if n == 0:
            return sub
        if n > k:
            # The local top-k must apply the SAME tie-break as the driver
            # merge (value desc/asc, then id asc): an argpartition cut would
            # drop an id-winning row that ties at the k boundary, and unary
            # negation wraps on unsigned dtypes.  pc.sort_indices sidesteps
            # both; the final np.sort restores input order within the batch.
            order = pc.sort_indices(sub, sort_keys=[
                (column, 'descending' if descending else 'ascending'),
                (id_column, 'ascending')]).to_numpy(zero_copy_only=False)[:k]
            sub = sub.take(pa.array(np.sort(order)))
        return sub

    partials = ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
    import ray
    tables = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows and t.num_columns]
    if not tables:
        return pa.table({c: [] for c in keep})
    merged = pa.concat_tables(tables, promote_options='permissive')
    order = pc.sort_indices(merged, sort_keys=[
        (column, 'descending' if descending else 'ascending'), (id_column, 'ascending')])
    return merged.take(order.slice(0, k))


def deterministic_sample(ds, *, key_column: str, rate: float, seed: int = 0):
    """Keep each row iff ``hash(key, seed) / 2^64 < rate`` — a reproducible
    Bernoulli sample keyed on the row's identity, not its position: identical
    membership for any block layout, partition count or cluster size, and
    rows sharing a key are kept or dropped together."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f'rate must be within [0, 1], got {rate}')

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        u = _keyed_hash(batch.column(key_column), seed).view(np.uint64) / float(2 ** 64)
        return batch.filter(pa.array(u < rate))

    return ds.map_batches(keep, batch_format='pyarrow', zero_copy_batch=True)
