"""Distributed top-k and deterministic sampling.

* :func:`top_k` — global top-k rows by a column: each batch emits only its
  local top-k (one ``pc.sort_indices`` with the final tie-break), a tiny
  driver merge picks the final k.  Work scales linearly over the corpus,
  zero shuffle, and the driver never holds more than ``k x num_batches``
  rows.  Ties break on the id column ascending, so results are
  deterministic on any block layout.
* :func:`deterministic_sample` — keep each row iff its keyed splitmix64 hash
  maps below ``rate`` (the same hash family as
  :mod:`auto_featurs_ray.datapipe.shuffle`): membership is a pure function
  of (key, seed), reproducible on any cluster shape, and expressible in
  exact integer SQL for the oracle.
* :func:`stratified_sample` — exactly n rows per stratum by keyed-hash rank:
  per-batch best-n pre-prune (combiner) + one stratum exchange, so a hot
  stratum ships ``n x num_blocks`` candidates, never its full population.
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


def _best_n_per_stratum(table: pa.Table, stratum_column: str, n: int) -> pa.Table:
    """Keep the first ``n`` rows of each stratum after the table is sorted by
    ``(stratum, __strat_h, key)`` — vectorized run-length ranking."""
    if table.num_rows == 0:
        return table
    codes = table.column(stratum_column)
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    enc = codes.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.flatnonzero(enc[1:] != enc[:-1]) + 1))
    lengths = np.diff(np.concatenate((starts, [len(enc)])))
    rank = np.arange(len(enc), dtype=np.int64) - np.repeat(starts, lengths)
    return table.filter(pa.array(rank < n))


def stratified_sample(ds, *, stratum_column: str, key_column: str, n_per_stratum: int,
                      seed: int = 0, num_partitions: int = 16):
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum, chosen
    deterministically: rows rank by ``(hash(key, seed), key)`` within their
    stratum and the first n win — a pure function of row identity, so the
    sample is identical on any block layout or cluster shape (and expressible
    in exact integer SQL for the oracle).

    Two-stage at scale: each batch first pre-prunes to its LOCAL best-n per
    stratum (a combiner — at most ``n x strata_in_batch`` rows leave any
    batch), then one hash exchange on the stratum co-locates the candidates
    and keeps the global best n.  A hot stratum therefore ships ``n x
    num_blocks`` candidate rows, not its full population.
    """
    if n_per_stratum <= 0:
        raise ValueError(f'n_per_stratum must be positive, got {n_per_stratum}')
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions
    HASH = '__strat_h'

    def _ranked(table: pa.Table) -> pa.Table:
        idx = pc.sort_indices(table, sort_keys=[
            (stratum_column, 'ascending'), (HASH, 'ascending'), (key_column, 'ascending')])
        return _best_n_per_stratum(table.take(idx), stratum_column, n_per_stratum)

    def prune_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = _keyed_hash(batch.column(key_column), seed).view(np.uint64)
        return _ranked(batch.append_column(HASH, pa.array(h, pa.uint64())))

    def finish_partition(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return table
        return _ranked(table).drop_columns([HASH])

    pruned = ds.map_batches(prune_batch, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(pruned, [stratum_column], num_partitions, finish_partition)


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


def mixture_resample(ds, *, group_column: str, key_column: str, weight_column: str,
                     target_weights, seed: int = 0):
    """Deterministic downsampling to a target source mixture.

    Given relative target weights per group (a ``{group: weight}`` mapping or
    a ``group -> weight`` callable evaluated on the observed groups), find the
    largest total budget T reachable WITHOUT upsampling any group —
    ``T = min_g W_g / t_g`` where ``W_g`` is the group's current
    ``weight_column`` total and ``t_g`` its normalized target share — then
    keep each row iff its keyed splitmix64 hash maps below the group's rate
    ``r_g = t_g * T / W_g`` (the binding group keeps everything).  Groups with
    non-positive target weight are dropped entirely.

    Membership is a pure function of (key, seed, group totals): identical on
    any cluster shape, and exactly replayable in SQL.  Scale shape: one cheap
    column-pruned partial pass for the per-group totals (grouping column must
    be LOW-cardinality — source/domain-level, same contract as
    ``compute_grouped_broadcast_states``), rates ride into the filter stage as
    a tiny closure dict; the filter itself is embarrassingly parallel.
    """
    import ray

    def partial_totals(batch: pa.Table) -> pa.Table:
        # rows with a null group have no target weight and are dropped
        batch = batch.filter(pc.is_valid(batch.column(group_column)))
        if batch.num_rows == 0:
            return pa.table({'g': pa.array([], pa.string()), 'w': pa.array([], pa.float64())})
        enc = batch.column(group_column).combine_chunks().dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        w = batch.column(weight_column).to_numpy(zero_copy_only=False)
        # float64 partial sums: exact for integer weights below 2^53 and
        # correct (not truncated) for fractional weight columns
        sums = np.bincount(codes, weights=w.astype(np.float64), minlength=len(enc.dictionary))
        return pa.table({'g': enc.dictionary, 'w': pa.array(sums, pa.float64())})

    pruned = ds.select_columns([group_column, weight_column])
    parts = [t for t in ray.get(pruned.map_batches(
        partial_totals, batch_format='pyarrow', zero_copy_batch=True).to_arrow_refs())
        if t.num_rows and t.num_columns]
    totals: dict = {}
    for t in parts:
        for g, w in zip(t.column('g').to_pylist(), t.column('w').to_pylist()):
            totals[g] = totals.get(g, 0) + w

    weight_of = target_weights if callable(target_weights) else \
        (lambda g: target_weights.get(g, 0.0))
    eligible = {g: float(weight_of(g)) for g in totals}
    eligible = {g: v for g, v in eligible.items() if v > 0 and totals[g] > 0}
    if not eligible:
        return ds.filter(lambda row: False)
    sv = float(sum(eligible.values()))
    shares = {g: v / sv for g, v in eligible.items()}
    budget = min(float(totals[g]) / t for g, t in shares.items())
    rates = {g: shares[g] * budget / float(totals[g]) for g in shares}

    def keep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(group_column)))
        if batch.num_rows == 0:
            return batch
        enc = batch.column(group_column).combine_chunks().dictionary_encode()
        per_code = np.fromiter((rates.get(g, 0.0) for g in enc.dictionary.to_pylist()),
                               dtype=np.float64, count=len(enc.dictionary))
        r = per_code[enc.indices.to_numpy(zero_copy_only=False)]
        u = _keyed_hash(batch.column(key_column), seed).view(np.uint64) / float(2 ** 64)
        return batch.filter(pa.array(u < r))

    return ds.map_batches(keep, batch_format='pyarrow', zero_copy_batch=True)


def weighted_sample(ds, *, key_column: str, prob_column: str, seed: int = 0,
                    scale: float = 1.0):
    """Quality-weighted deterministic Bernoulli sample: keep each row iff
    ``hash(key, seed) / 2^64 < clip(prob * scale, 0, 1)`` — the per-row
    probability comes from a COLUMN (e.g. a quality score in [0, 1]), so
    high-quality documents survive preferentially while membership stays a
    pure function of (key, seed) — identical on any cluster shape, and the
    exact-integer splitmix64 inequality is SQL-replayable.  Null
    probabilities drop the row."""

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        u = _keyed_hash(batch.column(key_column), seed).view(np.uint64) / float(2 ** 64)
        p = batch.column(prob_column).cast(pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(invalid='ignore'):
            p = np.clip(p * scale, 0.0, 1.0)
        mask = u < np.where(np.isnan(p), 0.0, p)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format='pyarrow', zero_copy_batch=True)
