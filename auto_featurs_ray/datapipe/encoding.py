"""Categorical encodings over a Dataset: one-hot with an exact top-K
vocabulary (engine extension; the reference has no categorical encoders —
its nominal columns flow through aggregations only).

Vocabulary selection is exact and deterministic: a value-keyed exchange
counts each distinct category once, per-partition top-K partials merge on
the driver (<= K x partitions tiny rows) with the (count desc, value asc)
tie-break, and the final K-category list broadcasts to a single vectorized
``map_batches`` that appends one int8 indicator column per kept category
plus an ``_other`` column.  Nothing larger than K x partitions ever lands
on the driver, so the op holds at any corpus size as long as K stays
human-scale (one-hot beyond ~1000 columns is the wrong encoding — use the
hashing trick or target encoding instead)."""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _safe(name: str) -> str:
    return re.sub(r'[^A-Za-z0-9_]+', '_', name)


def one_hot_encode(ds, *, column: str, max_categories: int = 16,
                   num_partitions: int = 16, other_column: bool = True):
    """Append int8 one-hot indicator columns for the ``max_categories`` most
    frequent values of ``column`` (ties break value-ascending); remaining
    non-null values set ``{column}_is_other`` when ``other_column``.  Null
    category rows get null indicators (SQL ``CASE WHEN col = 'x'`` over a
    NULL is NULL).
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions
    import ray

    if max_categories < 1:
        raise ValueError(f'max_categories must be >= 1, got {max_categories}')

    def count_partition(table: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'v': pa.array([], pa.string()), 'c': pa.array([], pa.int64())})
        if table.num_rows == 0 or table.num_columns == 0:
            return empty
        col = table.column(column).cast(pa.string())
        keep = pc.is_valid(col)
        grouped = (pa.table({'v': col}).filter(keep)
                   .group_by('v').aggregate([('v', 'count')]))
        t = pa.table({'v': grouped.column('v'),
                      'c': grouped.column('v_count').cast(pa.int64())})
        # per-partition top-K with the merge's own tie-break
        t = t.take(pc.sort_indices(t, sort_keys=[('c', 'descending'), ('v', 'ascending')]))
        return t.slice(0, max_categories)

    partials = shuffle_map_partitions(ds, [column], num_partitions, count_partition)
    tbl = pa.concat_tables(ray.get(partials.to_arrow_refs()), promote_options='permissive')
    order = pc.sort_indices(tbl, sort_keys=[('c', 'descending'), ('v', 'ascending')])
    cats = tbl.take(order).slice(0, max_categories).column('v').to_pylist()
    cat_arr = pa.array(cats, pa.string())

    # sanitized names can collide ('a b' and 'a_b' both -> 'a_b'; a literal
    # category 'other' vs the _is_other bucket): dedupe with an index suffix,
    # the other-bucket name running through the same dedup last
    used: set = set()

    def _unique(base: str) -> str:
        name = base
        i = 1
        while name in used:
            name = f'{base}_{i}'
            i += 1
        used.add(name)
        return name

    cat_names = [_unique(f'{column}_is_{_safe(cat)}') for cat in cats]
    other_name = _unique(f'{column}_is_other') if other_column else None
    handle = ray.put(list(zip(cats, cat_names)))

    def encode(batch: pa.Table) -> pa.Table:
        kept = ray.get(handle)
        col = batch.column(column).cast(pa.string())
        null_mask = np.asarray(pc.is_null(col).combine_chunks())
        for cat, name in kept:
            flag = pc.equal(col, cat).combine_chunks()
            vals = np.asarray(pc.fill_null(flag, False)).astype(np.int8)
            batch = batch.append_column(name, pa.array(vals, mask=null_mask))
        if other_column:
            known = pc.fill_null(pc.is_in(col, value_set=cat_arr), False)
            vals = (~np.asarray(known.combine_chunks()) & ~null_mask).astype(np.int8)
            batch = batch.append_column(other_name, pa.array(vals, mask=null_mask))
        return batch

    return ds.map_batches(encode, batch_format='pyarrow', zero_copy_batch=True)


def hash_encode(ds, *, column: str, num_buckets: int = 64, signed: bool = False):
    """Feature-hashing ("hashing trick") encoding: bucket =
    ``FNV1a64(value) mod num_buckets`` as an int64 column
    ``{column}_hashbucket_{D}``, plus (``signed=True``) a ±1 sign column
    ``{column}_hashsign`` from the hash's top bit — the collision-debiasing
    convention of Weinberger et al. (2009).

    Unlike one-hot, needs NO vocabulary pass: a single stateless vectorized
    ``map_batches``, so the op is embarrassingly parallel at any corpus
    size and new categories at inference time hash consistently.  Values
    are whitespace-normalized and lowercased exactly like the corpus
    fingerprinter (``textstats.fnv1a64_batch``) so the same recursive-CTE
    SQL replay certifies it.  Null values get null outputs.
    """
    from auto_featurs_ray.datapipe.textstats import fnv1a64_batch

    if num_buckets < 1:
        raise ValueError(f'num_buckets must be >= 1, got {num_buckets}')

    def encode(batch: pa.Table) -> pa.Table:
        col = batch.column(column).cast(pa.string())
        null_mask = np.asarray(pc.is_null(col).combine_chunks())
        h = fnv1a64_batch(col.to_pylist()).view(np.uint64)
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        batch = batch.append_column(f'{column}_hashbucket_{num_buckets}',
                                    pa.array(bucket, mask=null_mask))
        if signed:
            sign = np.where((h >> np.uint64(63)).astype(bool), -1, 1).astype(np.int64)
            batch = batch.append_column(f'{column}_hashsign',
                                        pa.array(sign, mask=null_mask))
        return batch

    return ds.map_batches(encode, batch_format='pyarrow', zero_copy_batch=True)


def pivot_aggregate(ds, *, by: Sequence[str], category_column: str,
                    categories: Sequence[str], value_column: str = None,
                    aggs: Sequence[str] = ('count',), num_partitions: int = 16,
                    other_bucket: bool = True):
    """Wide per-category aggregation (pivot): one output row per ``by``
    entity with a ``{category_column}_{cat}_count`` (and, with
    ``value_column``, ``{value_column}_{cat}_sum``) column per declared
    category — the aggregate cross-tab feature block.

    ``categories`` must be DECLARED so the output schema is static on any
    cluster shape (auto-discovery would make the schema data-dependent);
    undeclared values fold into ``_other`` columns when ``other_bucket``.
    One entity-keyed exchange; each reduce task factorizes its entities
    once and fills every cell with ``np.bincount`` — no Python per row.
    Null categories count as undeclared.
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    cats = list(dict.fromkeys(categories))
    if not cats:
        raise ValueError('categories must be non-empty')
    unknown = [a for a in aggs if a not in ('count', 'sum')]
    if unknown:
        raise ValueError(f'unsupported pivot aggs {unknown}; supported: count/sum')
    if 'sum' in aggs and value_column is None:
        raise ValueError("agg 'sum' needs value_column")
    by = list(by)

    def colname(agg: str, cat: str) -> str:
        src = category_column if agg == 'count' else value_column
        return f'{src}_{_safe(cat)}_{agg}' if agg == 'count' \
            else f'{value_column}_{_safe(cat)}_{agg}'

    def pivot(table: pa.Table, _pid: int) -> pa.Table:
        import pandas as pd
        names = cats + (['other'] if other_bucket else [])
        if table.num_rows == 0 or table.num_columns == 0:
            empty = {k: pa.array([], pa.int64()) for k in by}
            for a in aggs:
                for c in names:
                    empty[colname(a, c)] = pa.array(
                        [], pa.int64() if a == 'count' else pa.float64())
            return pa.table(empty)
        key_frame = pd.DataFrame({k: table.column(k).to_pandas() for k in by})
        codes, uniques = pd.factorize(pd.MultiIndex.from_frame(key_frame)
                                      if len(by) > 1 else key_frame[by[0]],
                                      use_na_sentinel=False)
        n_ent = len(uniques)
        cat_col = table.column(category_column).cast(pa.string())
        cat_codes = pc.index_in(cat_col, value_set=pa.array(cats, pa.string()))
        cat_np = cat_codes.to_numpy(zero_copy_only=False).astype(np.float64)
        cat_np = np.where(np.isnan(cat_np), len(cats), cat_np).astype(np.int64)
        vals = None
        if value_column is not None:
            v = table.column(value_column).cast(pa.float64()).to_numpy(zero_copy_only=False)
            vals = np.where(np.isnan(v), 0.0, v)
        if len(by) > 1:
            out = {k: pa.array([u[i] for u in uniques]) for i, k in enumerate(by)}
        else:
            out = {by[0]: pa.array(pd.Series(uniques))}
        for ci, cname in enumerate(names):
            if not other_bucket and ci >= len(cats):
                break
            mask = cat_np == ci
            if 'count' in aggs:
                out[colname('count', cname)] = pa.array(
                    np.bincount(codes[mask], minlength=n_ent).astype(np.int64))
            if 'sum' in aggs:
                out[colname('sum', cname)] = pa.array(
                    np.bincount(codes[mask], weights=vals[mask], minlength=n_ent))
        return pa.table(out)

    return shuffle_map_partitions(ds, by, num_partitions, pivot)
