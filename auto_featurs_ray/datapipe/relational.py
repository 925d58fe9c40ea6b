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

_COMBINABLE = ('count', 'sum', 'mean', 'min', 'max')


def groupby_aggregate(ds, *, by: Sequence[str], aggs: Mapping[str, Sequence[str]],
                      num_partitions: int = 16, count_all_column: str = 'n_rows'):
    """``SELECT by..., aggs... GROUP BY by`` as an aggregate table.

    ``aggs`` maps value columns to aggregate names from
    ``count/sum/mean/min/max`` (SQL semantics: nulls excluded; empty-group
    sum/mean/min/max are impossible — a key only exists with rows).  The
    special key ``'*'`` with ``['count']`` adds a ``n_rows`` total row
    count.  Output columns: ``{col}_{agg}`` (count as int64, sum/mean as
    float64, min/max in the input type).
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    by = list(by)
    plain = {c: [a for a in al] for c, al in aggs.items() if c != '*'}
    want_count_all = '*' in aggs and 'count' in aggs['*']
    for c, al in plain.items():
        unknown = [a for a in al if a not in _COMBINABLE]
        if unknown:
            raise ValueError(f'unsupported aggs {unknown} for {c}; supported: {_COMBINABLE}')
    if not plain and not want_count_all:
        raise ValueError('aggs must request at least one aggregate')

    # partial-state plan: which arrow aggregations each phase needs
    partial_spec = []
    for c, al in plain.items():
        needs = set(al)
        if 'mean' in needs:
            needs |= {'sum', 'count'}
        if 'count' in al or 'mean' in al:
            partial_spec.append((c, 'count'))
        if 'sum' in al or 'mean' in al:
            partial_spec.append((c, 'sum'))
        if 'min' in al:
            partial_spec.append((c, 'min'))
        if 'max' in al:
            partial_spec.append((c, 'max'))
    partial_spec = list(dict.fromkeys(partial_spec))

    def partial(batch: pa.Table) -> pa.Table:
        spec = [(c, a) for c, a in partial_spec]
        if want_count_all:
            spec.append(([], 'count_all'))
        grouped = batch.group_by(by).aggregate(spec)
        return grouped

    def combine(table: pa.Table, _pid: int) -> pa.Table:
        names = {}
        out_fields = []
        for c, al in plain.items():
            for a in al:
                out_fields.append((c, a))
        if table.num_rows == 0 or table.num_columns == 0:
            cols = {k: pa.array([], pa.int64()) for k in by}
            for c, a in out_fields:
                cols[f'{c}_{a}'] = pa.array(
                    [], pa.int64() if a == 'count' else pa.float64())
            if want_count_all:
                cols[count_all_column] = pa.array([], pa.int64())
            return pa.table(cols)
        respec = []
        for c, a in partial_spec:
            col = f'{c}_{a}'
            re_agg = 'sum' if a in ('count', 'sum') else a
            respec.append((col, re_agg))
            names[(c, a)] = f'{col}_{re_agg}'
        if want_count_all:
            respec.append(('count_all', 'sum'))
        grouped = table.group_by(by).aggregate(respec)
        cols = {k: grouped.column(k) for k in by}
        for c, al in plain.items():
            for a in al:
                if a == 'mean':
                    s = grouped.column(names[(c, 'sum')]).cast(pa.float64())
                    n = grouped.column(names[(c, 'count')]).cast(pa.float64())
                    cols[f'{c}_mean'] = pc.divide(s, n)
                elif a == 'count':
                    cols[f'{c}_count'] = grouped.column(names[(c, a)]).cast(pa.int64())
                elif a == 'sum':
                    cols[f'{c}_sum'] = grouped.column(names[(c, a)]).cast(pa.float64())
                else:
                    cols[f'{c}_{a}'] = grouped.column(names[(c, a)])
        if want_count_all:
            cols[count_all_column] = grouped.column('count_all_sum').cast(pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format='pyarrow')
    return shuffle_map_partitions(partials, by, num_partitions, combine)
