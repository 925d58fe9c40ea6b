"""Relational aggregate tables: SQL ``GROUP BY`` with map-side partial
aggregation.

The scale-correct two-phase groupby the engine's guidance prescribes:
every input batch pre-aggregates to at most one row per key it contains
(Arrow ``group_by`` — C-speed), so the ONLY all-to-all exchange moves
partial states (bounded by distinct keys x blocks, not by input rows),
and one reduce task per partition combines them.  count/sum/min/max are
combinable partials; mean finalizes as sum/count."""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_COMBINABLE = ('count', 'sum', 'mean', 'min', 'max', 'count_distinct',
               'approx_count_distinct', 'var', 'std', 'median', 'collect_set')


def _quantile_of(agg: str):
    """``median`` -> 0.5, ``quantile_<pct>`` -> pct/100, else ``None``."""
    if agg == 'median':
        return 0.5
    if agg.startswith('quantile_'):
        pct = agg[len('quantile_'):]
        if pct.isdigit() and 0 < int(pct) < 100:
            return int(pct) / 100.0
    return None


def _valid_agg(agg: str) -> bool:
    return agg in _COMBINABLE or _quantile_of(agg) is not None


def _joint_codes(left: pa.Table, right: pa.Table, by: Sequence[str]):
    """One shared ``pd.factorize`` over both tables' key columns: null keys
    get ONE consistent code on both sides (the Arrow->pandas null encodings
    differ between paths, so separate factorizes would mis-align).  Returns
    ``(codes_left, codes_right, num_uniques)``."""
    import pandas as pd
    lf = pd.DataFrame({k: left.column(k).to_pandas() for k in by})
    rf = pd.DataFrame({k: right.column(k).to_pandas() for k in by})
    both = pd.concat([lf, rf], ignore_index=True)
    codes, uniq = pd.factorize(pd.MultiIndex.from_frame(both) if len(by) > 1
                               else both[by[0]], use_na_sentinel=False)
    return (codes[:len(lf)].astype(np.int64), codes[len(lf):].astype(np.int64),
            len(uniq))


def groupby_aggregate(ds, *, by: Sequence[str], aggs: Mapping[str, Sequence[str]],
                      num_partitions: int = 16, count_all_column: str = 'n_rows',
                      kmv_k: int = 64):
    """``SELECT by..., aggs... GROUP BY by`` as an aggregate table.

    ``aggs`` maps value columns to aggregate names from
    ``count/sum/mean/min/max/count_distinct`` (SQL semantics: nulls
    excluded; empty-group sum/mean/min/max are impossible — a key only
    exists with rows).  The special key ``'*'`` with ``['count']`` adds a
    ``n_rows`` total row count.  Output columns: ``{col}_{agg}`` (count /
    count_distinct as int64, sum/mean as float64, min/max in the input
    type).  ``count_distinct`` is EXACT: partials carry each batch's
    per-key distinct-value list (bounded by per-key cardinality, not row
    count) and the reduce deduplicates the union.  ``approx_count_distinct``
    is the scale path: a per-key KMV (k-minimum-values) sketch of
    ``kmv_k`` 64-bit hashes — partial size is bounded by k per key
    regardless of cardinality; exact below k distinct values, and for
    int64 columns the pandas hash IS the splitmix64 finalizer, so a SQL
    oracle replays the estimate bit-for-bit.

    ``var`` / ``std`` are SAMPLE variance/stddev (``n-1``; SQL
    ``var_samp``/``stddev_samp``): partials carry per-key (count, sum, M2)
    and the reduce applies the one-shot Chan-et-al. parallel-variance
    combine — numerically stable, state bounded like count/sum.
    ``collect_set`` emits the per-key SORTED distinct-value list (nulls
    excluded; ``list_sort(list(DISTINCT ...))`` parity) — partials are the
    same per-key distinct lists ``count_distinct`` carries, so the exchange
    stays bounded by per-key cardinality.
    ``median`` / ``quantile_<pct>`` are EXACT linear-interpolated quantiles
    (``quantile_cont`` parity): order statistics have no small exact state,
    so partials carry per-key SORTED value lists — the exchange is bounded
    by the column's valid-value count (the same bytes a plain groupby
    ships); for bounded-memory approximation at extreme per-key cardinality
    use the ``QuantileTransformer`` sketch path instead.
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    by = list(by)
    plain = {c: [a for a in al] for c, al in aggs.items() if c != '*'}
    want_count_all = '*' in aggs and 'count' in aggs['*']
    for c, al in plain.items():
        unknown = [a for a in al if not _valid_agg(a)]
        if unknown:
            raise ValueError(f'unsupported aggs {unknown} for {c}; supported: '
                             f'{_COMBINABLE} + quantile_<pct>')
    if not plain and not want_count_all:
        raise ValueError('aggs must request at least one aggregate')

    # partial-state plan: which arrow aggregations each phase needs
    partial_spec = []
    distinct_cols = []
    kmv_cols = []
    var_cols = []
    qspec: dict = {}
    for c, al in plain.items():
        if 'count' in al or 'mean' in al:
            partial_spec.append((c, 'count'))
        if 'sum' in al or 'mean' in al:
            partial_spec.append((c, 'sum'))
        if 'min' in al:
            partial_spec.append((c, 'min'))
        if 'max' in al:
            partial_spec.append((c, 'max'))
        if 'count_distinct' in al or 'collect_set' in al:
            partial_spec.append((c, 'distinct'))
            distinct_cols.append(c)
        if 'approx_count_distinct' in al:
            kmv_cols.append(c)
        if 'var' in al or 'std' in al:
            var_cols.append(c)
        quants = [(a, _quantile_of(a)) for a in al if _quantile_of(a) is not None]
        if quants:
            qspec[c] = quants
    partial_spec = list(dict.fromkeys(partial_spec))

    def _kmv_lists(batch: pa.Table, keys: pa.Table, c: str):
        """Per-key list of the k smallest distinct value hashes, aligned
        with ``keys`` (the batch's grouped key table).

        The batch rows and the grouped key table factorize TOGETHER in one
        ``pd.factorize`` call: null keys round-trip differently through the
        two Arrow->pandas paths (NaN vs None), so probing a dict built from
        one side with values from the other raised ``KeyError: None`` — a
        shared factorize gives both sides the same integer code for null."""
        import pandas as pd
        kf = pd.DataFrame({k: batch.column(k).to_pandas() for k in by})
        gk = pd.DataFrame({k: keys.column(k).to_pandas() for k in by})
        both = pd.concat([kf, gk], ignore_index=True)
        codes_all, uniques = pd.factorize(pd.MultiIndex.from_frame(both) if len(by) > 1
                                          else both[by[0]], use_na_sentinel=False)
        codes = codes_all[:len(kf)]
        want_codes = codes_all[len(kf):].astype(np.int64)
        col = batch.column(c)
        if pa.types.is_floating(col.type):
            col = pc.add(col, 0.0)   # -0.0 -> +0.0: SQL equality semantics
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(col.to_pandas(), index=False).to_numpy().astype(np.uint64)
        codes_v, h_v = codes[valid], h[valid]
        order = np.lexsort((h_v, codes_v))
        codes_s, h_s = codes_v[order], h_v[order]
        if len(codes_s):
            keep = np.r_[True, (codes_s[1:] != codes_s[:-1]) | (h_s[1:] != h_s[:-1])]
            codes_s, h_s = codes_s[keep], h_s[keep]
        starts = np.r_[0, np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1]
        lengths = np.diff(np.r_[starts, len(codes_s)])
        rank = np.arange(len(codes_s)) - np.repeat(starts, lengths)
        sel = rank < kmv_k
        codes_s, h_s = codes_s[sel], h_s[sel]
        counts = np.bincount(codes_s, minlength=len(uniques))
        offs = np.r_[0, np.cumsum(counts)]
        out_offsets = [0]
        out_values = []
        for wc in want_codes:
            out_values.append(h_s[offs[wc]:offs[wc + 1]])
            out_offsets.append(out_offsets[-1] + counts[wc])
        flat = np.concatenate(out_values) if out_values else np.empty(0, np.uint64)
        return pa.ListArray.from_arrays(pa.array(np.asarray(out_offsets, np.int32)),
                                        pa.array(flat.view(np.int64), pa.int64()))

    def partial(batch: pa.Table) -> pa.Table:
        spec = [(c, a) for c, a in partial_spec]
        drop_count_all = False
        if want_count_all or not spec:
            spec.append(([], 'count_all'))  # Arrow needs >=1 agg; drop if synthetic
            drop_count_all = not want_count_all
        grouped = batch.group_by(by).aggregate(spec)
        if drop_count_all:
            grouped = grouped.drop_columns(['count_all'])
        for c in kmv_cols:
            grouped = grouped.append_column(f'{c}_kmv', _kmv_lists(batch, grouped, c))
        if var_cols or qspec:
            codes, want, nuni = _joint_codes(batch, grouped, by)
        for c in var_cols:
            # Welford-combinable per-key partials: valid count, sum, and the
            # within-batch squared deviation total M2 (Chan et al. one-shot
            # parallel-variance combine in the reduce)
            x = batch.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
            valid = ~np.isnan(x)
            n = np.bincount(codes[valid], minlength=nuni).astype(np.float64)
            s = np.bincount(codes[valid], weights=x[valid], minlength=nuni)
            with np.errstate(divide='ignore', invalid='ignore'):
                mean = s / n
            dev = x - mean[codes]
            m2 = np.bincount(codes[valid], weights=dev[valid] ** 2, minlength=nuni)
            grouped = grouped.append_column(f'{c}_vn', pa.array(n[want].astype(np.int64)))
            grouped = grouped.append_column(f'{c}_vs', pa.array(s[want]))
            grouped = grouped.append_column(f'{c}_vm2', pa.array(m2[want]))
        for c in qspec:
            # per-key SORTED valid-value list (quantiles are order statistics:
            # the exact partial is the value multiset itself)
            x = batch.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
            valid = ~np.isnan(x)
            cv, xv = codes[valid], x[valid]
            order = np.lexsort((xv, cv))
            cs, xs = cv[order], xv[order]
            counts = np.bincount(cs, minlength=nuni)
            offs = np.concatenate(([0], np.cumsum(counts)))
            out_offsets = [0]
            out_values = []
            for wc in want:
                out_values.append(xs[offs[wc]:offs[wc + 1]])
                out_offsets.append(out_offsets[-1] + counts[wc])
            flat = np.concatenate(out_values) if out_values else np.empty(0, np.float64)
            grouped = grouped.append_column(
                f'{c}_qv', pa.ListArray.from_arrays(
                    pa.array(np.asarray(out_offsets, np.int32), pa.int32()),
                    pa.array(flat, pa.float64())))
        return grouped

    def combine(table: pa.Table, _pid: int) -> pa.Table:
        names = {}
        out_fields = []
        for c, al in plain.items():
            for a in al:
                out_fields.append((c, a))
        if table.num_rows == 0 or table.num_columns == 0:
            # derive the empty partition's schema from the incoming partial
            # table (0-row slices carry it) — hardcoded int64/float64 emitted
            # schema-inconsistent blocks for string keys / typed min/max
            def _field(name, fallback):
                idx = table.schema.get_field_index(name)
                return table.schema.field(idx).type if idx >= 0 else fallback
            cols = {k: pa.array([], _field(k, pa.int64())) for k in by}
            for c, a in out_fields:
                if a in ('min', 'max'):
                    t = _field(f'{c}_{a}', pa.float64())
                elif a in ('count', 'count_distinct'):
                    t = pa.int64()
                elif a == 'collect_set':
                    t = _field(f'{c}_distinct', pa.list_(pa.float64()))
                else:
                    t = pa.float64()
                cols[f'{c}_{a}'] = pa.array([], t)
            if want_count_all:
                cols[count_all_column] = pa.array([], pa.int64())
            return pa.table(cols)
        respec = []
        for c, a in partial_spec:
            if a == 'distinct':
                continue
            col = f'{c}_{a}'
            re_agg = 'sum' if a in ('count', 'sum') else a
            respec.append((col, re_agg))
            names[(c, a)] = f'{col}_{re_agg}'
        drop_count_all = False
        if want_count_all or not respec:
            respec.append(('count_all', 'sum') if want_count_all else ([], 'count_all'))
            drop_count_all = not want_count_all
        grouped = table.group_by(by).aggregate(respec)
        if drop_count_all:
            grouped = grouped.drop_columns(['count_all'])
        if var_cols or qspec:
            pcodes, pwant, pnuni = _joint_codes(table, grouped, by)
        for c in var_cols:
            # one-shot parallel-variance combine (Chan et al.): M2_total =
            # sum(M2_i) + sum(n_i * (mean_i - mean_total)^2)
            vn = table.column(f'{c}_vn').to_numpy(zero_copy_only=False).astype(np.float64)
            vs = table.column(f'{c}_vs').to_numpy(zero_copy_only=False)
            vm2 = table.column(f'{c}_vm2').to_numpy(zero_copy_only=False)
            n_tot = np.bincount(pcodes, weights=vn, minlength=pnuni)
            s_tot = np.bincount(pcodes, weights=vs, minlength=pnuni)
            with np.errstate(divide='ignore', invalid='ignore'):
                mean_tot = s_tot / n_tot
                mean_i = np.where(vn > 0, vs / np.maximum(vn, 1.0), 0.0)
            corr = np.where(vn > 0, vn * (mean_i - mean_tot[pcodes]) ** 2, 0.0)
            m2_tot = (np.bincount(pcodes, weights=vm2, minlength=pnuni)
                      + np.bincount(pcodes, weights=corr, minlength=pnuni))
            with np.errstate(divide='ignore', invalid='ignore'):
                var = np.where(n_tot > 1, m2_tot / (n_tot - 1.0), np.nan)
            av = var[pwant]
            grouped = grouped.append_column(f'__var_{c}', pa.array(av, mask=np.isnan(av)))
        for c in qspec:
            # merge the per-partial sorted value lists, then every requested
            # quantile evaluates vectorized over key runs (type-7 linear
            # interpolation, quantile_cont parity)
            lists = table.column(f'{c}_qv')
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            loffsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            row_of = np.repeat(np.arange(table.num_rows), np.diff(loffsets))
            pairs_t = pa.table({**{k: table.column(k).take(pa.array(row_of)) for k in by},
                                '__v': lists.values})
            codes2, want2, nuni2 = _joint_codes(pairs_t, grouped, by)
            xv = pairs_t.column('__v').to_numpy(zero_copy_only=False)
            order = np.lexsort((xv, codes2))
            cs, xs = codes2[order], xv[order]
            counts = np.bincount(cs, minlength=nuni2).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(counts)))
            has = counts > 0
            for aggname, q in qspec[c]:
                t = q * (counts - 1.0)
                lo = np.maximum(np.floor(t).astype(np.int64), 0)
                frac = np.where(has, t - lo, 0.0)
                lo_idx = np.where(has, offs[:-1] + lo, 0)
                hi_idx = np.where(has, np.minimum(lo_idx + 1, np.maximum(offs[1:] - 1, 0)), 0)
                if len(xs):
                    val = xs[lo_idx] + frac * (xs[hi_idx] - xs[lo_idx])
                else:
                    val = np.zeros(nuni2)
                val = np.where(has, val, np.nan)
                av = val[want2]
                grouped = grouped.append_column(f'__q_{c}_{aggname}',
                                                pa.array(av, mask=np.isnan(av)))
        for c in kmv_cols:
            lists = table.column(f'{c}_kmv')
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            row_of = np.repeat(np.arange(table.num_rows), np.diff(offsets))
            pairs = {k: table.column(k).take(pa.array(row_of)) for k in by}
            pairs['__h'] = lists.values
            pt = pa.table(pairs)
            import pandas as pd
            # joint factorize with the grouped key table (same null-code
            # rationale as _kmv_lists): pcode indexes pair rows, want indexes
            # grouped rows, both in one code space
            pf = pd.DataFrame({k: pt.column(k).to_pandas() for k in by})
            gk = pd.DataFrame({k: grouped.column(k).to_pandas() for k in by})
            both = pd.concat([pf, gk], ignore_index=True)
            codes_all, puniq = pd.factorize(pd.MultiIndex.from_frame(both) if len(by) > 1
                                            else both[by[0]], use_na_sentinel=False)
            pcode = codes_all[:len(pf)]
            want = codes_all[len(pf):].astype(np.int64)
            hv = pt.column('__h').to_numpy(zero_copy_only=False).view(np.uint64)
            order = np.lexsort((hv, pcode))
            cs, hs = pcode[order], hv[order]
            if len(cs):
                keep = np.r_[True, (cs[1:] != cs[:-1]) | (hs[1:] != hs[:-1])]
                cs, hs = cs[keep], hs[keep]
            starts = np.r_[0, np.flatnonzero(cs[1:] != cs[:-1]) + 1]
            lengths = np.diff(np.r_[starts, len(cs)])
            # scatter estimates into the full code space: a key whose values
            # are all null has NO hashes (empty kmv lists) and so no run here;
            # its estimate is 0 — SQL count(DISTINCT) excludes nulls
            est_full = np.zeros(len(puniq), dtype=np.float64)
            for s, l in zip(starts, lengths) if len(cs) else ():
                if l < kmv_k:
                    est_full[cs[s]] = float(l)
                else:
                    kth = hs[s + kmv_k - 1] / float(2 ** 64)
                    est_full[cs[s]] = (kmv_k - 1) / kth
            grouped = grouped.append_column(f'__kmv_{c}', pa.array(est_full[want]))
        for c in distinct_cols:
            # explode each partial's distinct list, dedupe the union per key.
            # Alignment back to the grouped table goes through ONE shared
            # pd.factorize (not an Arrow join: hash joins never match null
            # keys, which silently zeroed the null group's distinct count).
            lists = table.column(f'{c}_distinct')
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            row_of = np.repeat(np.arange(table.num_rows), np.diff(offsets))
            pairs = {k: table.column(k).take(pa.array(row_of)) for k in by}
            vals_arr = lists.values
            if pa.types.is_floating(vals_arr.type):
                vals_arr = pc.add(vals_arr, 0.0)   # -0.0 -> +0.0 (SQL equality)
            pairs[c] = vals_arr
            pairs_t = pa.table(pairs)
            pairs_t = pairs_t.filter(pc.is_valid(pairs_t.column(c)))
            kcode, want_k, nuni_k = _joint_codes(pairs_t, grouped, by)
            # sort by (key code, value), dedupe adjacent runs: one pass gives
            # both the per-key distinct COUNT and (for collect_set) the
            # per-key SORTED distinct-value list
            keyed = pa.table({'__k': pa.array(kcode), c: pairs_t.column(c)})
            keyed = keyed.take(pc.sort_indices(
                keyed, sort_keys=[('__k', 'ascending'), (c, 'ascending')]))
            if keyed.num_rows > 1:
                from auto_featurs_ray.engine.asof import _null_safe_run_diff
                dup = _null_safe_run_diff(keyed, ['__k', c])
                keyed = keyed.filter(pa.array(np.concatenate(([True], dup))))
            ks = keyed.column('__k').to_numpy(zero_copy_only=False)
            per_key = np.bincount(ks, minlength=nuni_k)
            grouped = grouped.append_column(
                f'__dc_{c}', pa.array(per_key[want_k].astype(np.int64)))
            if 'collect_set' in plain[c]:
                offs = np.concatenate(([0], np.cumsum(per_key))).astype(np.int32)
                full_lists = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()),
                    keyed.column(c).combine_chunks())
                grouped = grouped.append_column(
                    f'__cs_{c}', full_lists.take(pa.array(want_k)))
        cols = {k: grouped.column(k) for k in by}
        for c, al in plain.items():
            for a in al:
                if a == 'mean':
                    s = grouped.column(names[(c, 'sum')]).cast(pa.float64())
                    n = grouped.column(names[(c, 'count')]).cast(pa.float64())
                    cols[f'{c}_mean'] = pc.divide(s, n)
                elif a == 'count':
                    cols[f'{c}_count'] = grouped.column(names[(c, a)]).cast(pa.int64())
                elif a == 'count_distinct':
                    cols[f'{c}_count_distinct'] = pc.fill_null(
                        grouped.column(f'__dc_{c}'), 0).cast(pa.int64())
                elif a == 'approx_count_distinct':
                    cols[f'{c}_approx_count_distinct'] = grouped.column(f'__kmv_{c}')
                elif a == 'collect_set':
                    cols[f'{c}_collect_set'] = grouped.column(f'__cs_{c}')
                elif a == 'var':
                    cols[f'{c}_var'] = grouped.column(f'__var_{c}')
                elif a == 'std':
                    cols[f'{c}_std'] = pc.sqrt(grouped.column(f'__var_{c}').cast(pa.float64()))
                elif _quantile_of(a) is not None:
                    cols[f'{c}_{a}'] = grouped.column(f'__q_{c}_{a}')
                elif a == 'sum':
                    cols[f'{c}_sum'] = grouped.column(names[(c, a)]).cast(pa.float64())
                else:
                    cols[f'{c}_{a}'] = grouped.column(names[(c, a)])
        if want_count_all:
            cols[count_all_column] = grouped.column('count_all_sum').cast(pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format='pyarrow')
    return shuffle_map_partitions(partials, by, num_partitions, combine)


def sort_by(ds, *, keys: Sequence, num_partitions: int = 16,
            position_column: Optional[str] = None):
    """Distributed GLOBAL sort: range-partition on the leading key with
    sampled-quantile cuts (the same driver-tiny sampling the halo/carry
    stages use), sort each partition once with Arrow, and emit partitions in
    cut order — the classic sample-sort exchange, O(rows log rows / P) per
    task and never a whole-dataset materialization anywhere.

    ``keys``: column names or ``(name, 'ascending'|'descending')`` pairs;
    the LEADING key drives the range cuts (descending leading keys reverse
    the cut assignment).  ``position_column`` optionally appends the 0-based
    GLOBAL rank of each row (offsets folded from the per-partition counts —
    a handful of ints on the driver), making the total order verifiable by
    an order-insensitive hash (SQL ``row_number() OVER (ORDER BY ...) - 1``).
    Pass a unique tiebreak column for a deterministic total order.  The
    leading key may be numeric, string or timestamp (timestamps cut on
    int64 microseconds — the engine's shared convention).
    """
    import ray
    import ray.data

    from auto_featurs_ray.engine.runtime import (
        _concat_slices,
        _coalesce_split_input,
        _launch_split_tasks,
        split_block_by_code,
    )

    norm = [(k, 'ascending') if isinstance(k, str) else (k[0], k[1]) for k in keys]
    if not norm:
        raise ValueError('keys must name at least one sort column')
    lead, lead_dir = norm[0]

    def _cuttable(col: pa.ChunkedArray) -> pa.ChunkedArray:
        # timestamps cut on int64 microseconds (shared engine convention)
        if pa.types.is_timestamp(col.type):
            return col.cast(pa.timestamp('us', tz=col.type.tz)).cast(pa.int64())
        return col

    def sample(batch: pa.Table) -> pa.Table:
        col = _cuttable(batch.column(lead)).drop_null()
        n = len(col)
        if n == 0:
            return pa.table({'s': pa.array([], col.type)})
        stride = max(1, n // 16)
        return pa.table({'s': col.take(pa.array(range(0, n, stride)))[:16]})

    picks = pa.concat_tables(
        [pa.table({'s': pa.array([r['s']])}) for r in ds.map_batches(
            sample, batch_format='pyarrow').take_all()] or
        [pa.table({'s': pa.array([], pa.int64())})], promote_options='permissive')
    if picks.num_rows >= 2 and num_partitions > 1:
        svals = picks.column('s').take(pc.sort_indices(picks, sort_keys=[('s', 'ascending')]))
        idx = np.linspace(0, picks.num_rows - 1, num_partitions + 1)[1:-1].astype(np.int64)
        cuts = svals.take(pa.array(np.unique(idx))).to_pylist()
        cuts = sorted(set(cuts))
    else:
        cuts = []
    num_spans = len(cuts) + 1

    @ray.remote
    def split_task(*blocks: pa.Table):
        block = _coalesce_split_input(blocks)
        if block.num_columns == 0:
            return tuple(block.slice(0, 0) for _ in range(num_spans))
        col = _cuttable(block.column(lead))
        vals = col.to_pandas()
        import pandas as pd
        codes = np.searchsorted(np.asarray(cuts), vals.to_numpy(), side='right') \
            if cuts else np.zeros(block.num_rows, dtype=np.int64)
        codes = np.asarray(codes, dtype=np.int64)
        if lead_dir == 'descending':
            codes = (num_spans - 1) - codes
        # nulls sort last under either direction (Arrow null_placement at_end)
        codes[pd.isna(vals).to_numpy()] = num_spans - 1
        return tuple(split_block_by_code(block, codes, num_spans))

    @ray.remote
    def sort_partition_task(pid: int, *slices: pa.Table) -> pa.Table:
        table = _concat_slices(slices, pid)
        if table.num_columns == 0 or table.num_rows <= 1:
            return table
        return table.take(pc.sort_indices(table, sort_keys=norm))

    split_refs = _launch_split_tasks(ds, split_task, num_spans)
    if not split_refs:
        return ds
    sorted_refs = [sort_partition_task.remote(p, *[s[p] for s in split_refs])
                   for p in range(num_spans)]
    if position_column is None:
        return ray.data.from_arrow_refs(sorted_refs)

    @ray.remote
    def count_rows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([count_rows.remote(r) for r in sorted_refs])
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]

    @ray.remote
    def annotate(t: pa.Table, base: int) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.append_column(position_column,
                               pa.array(np.arange(base, base + t.num_rows, dtype=np.int64)))

    return ray.data.from_arrow_refs(
        [annotate.remote(r, int(o)) for r, o in zip(sorted_refs, offsets)])


def top_k_frequent(ds, *, by: Sequence[str], value_column: str, k: int,
                   num_partitions: int = 16):
    """Per-group heavy-hitter table: the ``k`` most frequent values of
    ``value_column`` within each ``by`` group, EXACT, with the deterministic
    ``(count desc, value asc, nulls last)`` tie-break — the corpus-analysis
    cut (most common event types per user, languages per source, ...).

    Scale shape: each batch pre-aggregates to one row per distinct
    ``(key, value)`` pair (Arrow ``group_by`` — C speed), so the ONLY
    exchange moves ``(key, value, partial_count)`` rows bounded by pair
    cardinality x blocks, hashed on ``by`` so each group's top-k resolves in
    one reduce; the reduce sums counts, sorts once and keeps run heads by
    offset arithmetic.  Output: ``by..., {value_column}, cnt, rnk``
    (``rnk`` 1-based; SQL ``QUALIFY ROW_NUMBER() <= k`` parity).  Null
    values count as a group like SQL ``GROUP BY``.
    """
    from auto_featurs_ray.engine.asof import _null_safe_run_diff
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    by = list(by)
    if value_column in by:
        raise ValueError('value_column must not be one of the by keys')
    if k < 1:
        raise ValueError(f'k must be >= 1, got {k}')

    def partial(batch: pa.Table) -> pa.Table:
        grouped = batch.group_by([*by, value_column]).aggregate([([], 'count_all')])
        return grouped.rename_columns(
            [n if n != 'count_all' else '__c' for n in grouped.column_names])

    def reduce_top(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            def _t(name):
                idx = table.schema.get_field_index(name)
                return table.schema.field(idx).type if idx >= 0 else pa.int64()
            cols = {c: pa.array([], _t(c)) for c in [*by, value_column]}
            cols['cnt'] = pa.array([], pa.int64())
            cols['rnk'] = pa.array([], pa.int64())
            return pa.table(cols)
        summed = table.group_by([*by, value_column]).aggregate([('__c', 'sum')])
        order = pc.sort_indices(summed, sort_keys=[(c, 'ascending') for c in by]
                                + [('__c_sum', 'descending'), (value_column, 'ascending')])
        summed = summed.take(order)
        m = summed.num_rows
        diff = _null_safe_run_diff(summed, by) if m > 1 else np.zeros(0, dtype=bool)
        starts = np.concatenate(([0], np.flatnonzero(diff) + 1))
        lengths = np.diff(np.concatenate((starts, [m])))
        rank = np.arange(m) - np.repeat(starts, lengths)
        keep = rank < k
        out = {c: summed.column(c).filter(pa.array(keep)) for c in [*by, value_column]}
        out['cnt'] = summed.column('__c_sum').filter(pa.array(keep)).cast(pa.int64())
        out['rnk'] = pa.array((rank[keep] + 1).astype(np.int64))
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(partials, by, num_partitions, reduce_top)


def approx_top_k_frequent(ds, *, by: Sequence[str], value_column: str, k: int,
                          capacity: int = 256, num_partitions: int = 16):
    """Bounded-state heavy hitters: like :func:`top_k_frequent` but every
    partial keeps at most ``capacity`` values per key (SpaceSaving-style
    mergeable truncated summaries) — the scale path when per-key value
    cardinality explodes (top URLs per domain at 10^12 rows), the same
    exact-below-capacity contract the KMV distinct sketch has.

    Each partial records, per key, the LARGEST truncated count; the reduce
    sums those into ``err``: any value's TRUE count is within
    ``[cnt, cnt + err]`` of its reported ``cnt`` (it can only have been
    under-counted, by at most the truncation threshold of each partial that
    dropped it).  ``err == 0`` (per-key distinct <= capacity in every
    partial) means the result is EXACT and equals :func:`top_k_frequent`.
    Output: ``by..., {value_column}, cnt, err, rnk``.
    """
    from auto_featurs_ray.engine.asof import _null_safe_run_diff
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    by = list(by)
    if value_column in by:
        raise ValueError('value_column must not be one of the by keys')
    if k < 1 or capacity < k:
        raise ValueError(f'need capacity >= k >= 1, got k={k} capacity={capacity}')

    def partial(batch: pa.Table) -> pa.Table:
        grouped = batch.group_by([*by, value_column]).aggregate([([], 'count_all')])
        grouped = grouped.rename_columns(
            [n if n != 'count_all' else '__c' for n in grouped.column_names])
        order = pc.sort_indices(grouped, sort_keys=[(c, 'ascending') for c in by]
                                + [('__c', 'descending'), (value_column, 'ascending')])
        g = grouped.take(order)
        m = g.num_rows
        if m == 0:
            return g.append_column('__err', pa.array([], pa.int64()))
        diff = _null_safe_run_diff(g, by) if m > 1 else np.zeros(0, dtype=bool)
        starts = np.concatenate(([0], np.flatnonzero(diff) + 1))
        lengths = np.diff(np.concatenate((starts, [m])))
        rank = np.arange(m) - np.repeat(starts, lengths)
        counts = g.column('__c').to_numpy(zero_copy_only=False)
        err = np.zeros(m, dtype=np.int64)
        over = lengths > capacity
        # the first kept row of a truncating key carries that partial's
        # truncation threshold (the largest dropped count)
        err[starts[over]] = counts[starts[over] + capacity]
        keep = rank < capacity
        return g.append_column('__err', pa.array(err)).filter(pa.array(keep))

    def reduce_top(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            def _t(name):
                idx = table.schema.get_field_index(name)
                return table.schema.field(idx).type if idx >= 0 else pa.int64()
            cols = {c: pa.array([], _t(c)) for c in [*by, value_column]}
            cols.update({'cnt': pa.array([], pa.int64()), 'err': pa.array([], pa.int64()),
                         'rnk': pa.array([], pa.int64())})
            return pa.table(cols)
        summed = table.group_by([*by, value_column]).aggregate([('__c', 'sum')])
        order = pc.sort_indices(summed, sort_keys=[(c, 'ascending') for c in by]
                                + [('__c_sum', 'descending'), (value_column, 'ascending')])
        summed = summed.take(order)
        m = summed.num_rows
        diff = _null_safe_run_diff(summed, by) if m > 1 else np.zeros(0, dtype=bool)
        starts = np.concatenate(([0], np.flatnonzero(diff) + 1))
        lengths = np.diff(np.concatenate((starts, [m])))
        rank = np.arange(m) - np.repeat(starts, lengths)
        keep = rank < k
        out_t = summed.filter(pa.array(keep))
        err_t = table.group_by(by).aggregate([('__err', 'sum')])
        ecode, want_e, nuni_e = _joint_codes(err_t, out_t, by)
        err_full = np.zeros(nuni_e, dtype=np.int64)
        err_full[ecode] = err_t.column('__err_sum').to_numpy(zero_copy_only=False)
        out = {c: out_t.column(c) for c in [*by, value_column]}
        out['cnt'] = out_t.column('__c_sum').cast(pa.int64())
        out['err'] = pa.array(err_full[want_e])
        out['rnk'] = pa.array((rank[keep] + 1).astype(np.int64))
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
    return shuffle_map_partitions(partials, by, num_partitions, reduce_top)


def drop_duplicates(ds, *, subset: Sequence[str], keep_order_by: Sequence[str] = (),
                    num_partitions: int = 16):
    """Relational dedup: keep ONE row per distinct ``subset`` key — the row
    that sorts first under ``keep_order_by`` (ties then resolve by the full
    sort's stability; pass a unique tiebreak column for total determinism).
    Null keys form their own group (SQL ``IS NOT DISTINCT FROM`` semantics,
    like the engine's as-of dedup helper).

    One key-hashed exchange; each reduce sorts its partition once and keeps
    run heads with a vectorized null-safe run filter — no per-row Python.
    """
    from auto_featurs_ray.engine.asof import _null_safe_run_diff
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    subset = list(subset)
    keep_order_by = list(keep_order_by)
    if not subset:
        raise ValueError('subset must name at least one key column')

    def keep_first(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return table
        keys = [(k, 'ascending') for k in subset] + [(c, 'ascending') for c in keep_order_by]
        table = table.take(pc.sort_indices(table, sort_keys=keys))
        if table.num_rows <= 1:
            return table
        diff = _null_safe_run_diff(table, subset)
        return table.filter(pa.array(np.concatenate(([True], diff))))

    return shuffle_map_partitions(ds, subset, num_partitions, keep_first)


def melt(ds, *, id_columns: Sequence[str], value_columns: Sequence[str],
         variable_name: str = 'variable', value_name: str = 'value'):
    """Wide -> long unpivot: one output row per (input row x value column),
    with the source column's name in ``variable_name`` and its value cast
    to float64 in ``value_name``.  Stateless per batch (the inverse of
    ``pivot_aggregate`` at row grain) — no shuffle, embarrassingly
    parallel."""
    id_columns = list(id_columns)
    value_columns = list(value_columns)
    if not value_columns:
        raise ValueError('value_columns must be non-empty')

    def unpivot(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = len(value_columns)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        out = {c: batch.column(c).take(idx) for c in id_columns}
        out[variable_name] = pa.array(np.tile(np.asarray(value_columns, dtype=object), n))
        vals = [batch.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
                for c in value_columns]
        stacked = np.column_stack(vals).ravel() if n else np.empty(0, np.float64)
        out[value_name] = pa.array(stacked, mask=np.isnan(stacked) if n else None)
        return pa.table(out)

    return ds.map_batches(unpivot, batch_format='pyarrow', zero_copy_batch=True)


def profile_columns(ds, *, columns: Sequence[str], num_partitions: int = 1):
    """Data-quality profile: one output row per listed column with
    ``n_rows``, ``n_null``, ``n_distinct`` (exact), ``min`` / ``max`` /
    ``mean`` over valid values cast to float64 — the schema-drift /
    ingestion-sanity table.

    Per-batch partials (count/null/sum/min/max + the batch's distinct-value
    list) reduce on the driver; distinct-set sizes are bounded by column
    cardinality.  For truly high-cardinality columns profile a sample or
    use the HLL transformer instead.
    """
    columns = list(columns)
    if not columns:
        raise ValueError('columns must be non-empty')
    import pickle

    import ray

    def partial(batch: pa.Table) -> pa.Table:
        states = []
        for c in columns:
            col = batch.column(c)
            valid = int(pc.count(col).as_py() or 0)
            n = len(col)
            fcol = col.cast(pa.float64())
            arr = fcol.to_numpy(zero_copy_only=False)
            vv = arr[~np.isnan(arr)]
            mn = float(vv.min()) if len(vv) else np.nan
            mx = float(vv.max()) if len(vv) else np.nan
            s = float(vv.sum())
            distinct = set(pc.unique(fcol.drop_null()).to_pylist())
            states.append((n, n - valid, s, mn, mx, distinct))
        return pa.table({'state': [pickle.dumps(states)]})

    rows = ds.map_batches(partial, batch_format='pyarrow').take_all()
    agg = [(0, 0, 0.0, np.nan, np.nan, set()) for _ in columns]
    for r in rows:
        for i, (n, nn, s, mn, mx, d) in enumerate(pickle.loads(r['state'])):
            an, ann, as_, amn, amx, ad = agg[i]
            agg[i] = (an + n, ann + nn, as_ + s,
                      np.nanmin([amn, mn]), np.nanmax([amx, mx]), ad | d)
    out = {'column': pa.array(columns),
           'n_rows': pa.array([a[0] for a in agg], pa.int64()),
           'n_null': pa.array([a[1] for a in agg], pa.int64()),
           'n_distinct': pa.array([len(a[5]) for a in agg], pa.int64()),
           'min': pa.array([a[3] for a in agg], pa.float64()),
           'max': pa.array([a[4] for a in agg], pa.float64()),
           'mean': pa.array([a[2] / (a[0] - a[1]) if a[0] - a[1] else np.nan
                             for a in agg], pa.float64())}
    import ray.data as rd
    return rd.from_arrow(pa.table(out))


def top_n_per_group(ds, *, by: Sequence[str], order_by: Sequence[str], n: int,
                    descending: bool = False, num_partitions: int = 16):
    """Keep the first ``n`` rows of every ``by`` group under the
    ``order_by`` sort (``descending=True`` for best-N-by-score) — the
    per-domain curation cut (e.g. N highest-quality documents per source).
    SQL ``QUALIFY ROW_NUMBER() <= n`` semantics; pass a unique tiebreak
    column in ``order_by`` for total determinism.

    One key-hashed exchange; each reduce sorts once and keeps run heads by
    offset arithmetic — no per-row Python, no per-group loop.
    """
    from auto_featurs_ray.engine.asof import _null_safe_run_diff
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    by = list(by)
    order_by = list(order_by)
    if not by or not order_by:
        raise ValueError('by and order_by must each name at least one column')
    if n < 1:
        raise ValueError(f'n must be >= 1, got {n}')
    direction = 'descending' if descending else 'ascending'

    def keep_heads(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return table
        keys = [(k, 'ascending') for k in by] + [(c, direction) for c in order_by]
        table = table.take(pc.sort_indices(table, sort_keys=keys))
        m = table.num_rows
        if m <= 1:
            return table
        diff = _null_safe_run_diff(table, by)
        starts = np.r_[0, np.flatnonzero(diff) + 1]
        lengths = np.diff(np.r_[starts, m])
        rank = np.arange(m) - np.repeat(starts, lengths)
        return table.filter(pa.array(rank < n))

    return shuffle_map_partitions(ds, by, num_partitions, keep_heads)
