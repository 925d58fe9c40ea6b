"""Property-based conformance: random frames through the distributed engine
must match a driver-side pandas oracle exactly, for any block/partition split.

Hypothesis varies group-key skew, null placement, tie-heavy timestamps and the
physical layout (num_blocks x num_partitions) — the invariant is that physical
execution shape never changes results.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from auto_featurs_ray.base.column_specification import ColumnRole
from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.base.schema import Schema
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.pipeline.pipeline import Pipeline
from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations
from auto_featurs_ray.transformers.base import CumulativeOptions


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=5, max_value=80))
    keys = draw(st.lists(st.sampled_from(['a', 'b', 'c', 'hot']), min_size=n, max_size=n))
    # tie-heavy timestamps: duplicates across and within groups
    ts = np.sort(np.asarray(draw(st.lists(st.integers(0, n // 2 + 2), min_size=n, max_size=n))))
    # 3-decimal values: the rolling fast path reconstructs window sums from
    # prefix differences, which is only bit-stable away from denormal scale
    values = draw(st.lists(st.one_of(st.none(),
                                     st.floats(-100, 100, allow_nan=False)
                                     .map(lambda v: round(v, 3))),
                           min_size=n, max_size=n))
    num_blocks = draw(st.integers(1, 4))
    num_partitions = draw(st.integers(1, 5))
    table = pa.table({
        'row_id': pa.array(np.arange(n), pa.int64()),
        'ts': pa.array((np.datetime64('2024-01-01', 'us')
                        + ts * np.timedelta64(1, 'h'))),
        'g': pa.array(keys, pa.string()),
        'x': pa.array(values, pa.float64()),
    })
    return table, num_blocks, num_partitions


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(frames())
def test_window_suite_matches_pandas(case):
    table, num_blocks, num_partitions = case
    schema = Schema([
        CS.numeric(name='row_id', role=ColumnRole.IDENTIFIER),
        CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
        CS.nominal(name='g', role=ColumnRole.IDENTIFIER),
        CS.numeric(name='x'),
    ])
    ds = Dataset.from_arrow(table, schema, order_by=['ts', 'row_id'],
                            num_blocks=num_blocks, num_partitions=num_partitions)
    got = (Pipeline(ds)
           .with_count(over_columns_combinations=[['g']], cumulative=CumulativeOptions.EXCLUSIVE)
           .with_lagged('x', lags=[1], over_columns_combinations=[['g']])
           .with_arithmetic_aggregation('x', aggregations=[ArithmeticAggregations.SUM],
                                        over_columns_combinations=[['g']],
                                        cumulative=CumulativeOptions.INCLUSIVE)
           .with_num_unique('x', over_columns_combinations=[['g']])
           .collect()).sort_values('row_id').reset_index(drop=True)

    ref = table.to_pandas().sort_values(['ts', 'row_id']).reset_index(drop=True)
    grouped = ref.groupby('g', sort=False)
    expect = pd.DataFrame({
        'row_id': ref['row_id'],
        'count': grouped.cumcount(),
        'lag': grouped['x'].shift(1),
        # inclusive cumulative sum, polars-style: a null row emits null and is
        # skipped by later rows (pandas cumsum has identical semantics)
        'cumsum': ref['x'].groupby(ref['g']).cumsum(),
        'nuniq': ref.groupby('g')['x'].transform(lambda s: s.nunique(dropna=False)),
    }).sort_values('row_id').reset_index(drop=True)

    np.testing.assert_array_equal(got['exclusive_cum_count_over_g'].to_numpy(),
                                  expect['count'].to_numpy())
    np.testing.assert_allclose(got['x_lagged_1_over_g'].to_numpy(dtype=float),
                               expect['lag'].to_numpy(dtype=float), rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(got['x_inclusive_cum_sum_over_g'].to_numpy(dtype=float),
                               expect['cumsum'].to_numpy(dtype=float), rtol=1e-12, equal_nan=True)
    np.testing.assert_array_equal(got['x_num_unique_over_g'].to_numpy(),
                                  expect['nuniq'].to_numpy())


@st.composite
def asof_cases(draw):
    nl = draw(st.integers(3, 40))
    nr = draw(st.integers(0, 40))
    keys = ['k1', 'k2', 'k3']
    lk = draw(st.lists(st.sampled_from(keys), min_size=nl, max_size=nl))
    rk = draw(st.lists(st.sampled_from(keys), min_size=nr, max_size=nr))
    lt = sorted(draw(st.lists(st.integers(0, 50), min_size=nl, max_size=nl)))
    rt = sorted(draw(st.lists(st.integers(0, 50), min_size=nr, max_size=nr)))
    num_partitions = draw(st.integers(1, 4))
    return lk, lt, rk, rt, num_partitions


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(asof_cases())
def test_asof_join_matches_pandas_merge_asof(case):
    import ray.data as rd

    from auto_featurs_ray.engine.asof import asof_join
    lk, lt, rk, rt, num_partitions = case
    base = np.datetime64('2024-01-01', 'us')
    left = pa.table({'k': pa.array(lk), 'ts': pa.array(base + np.asarray(lt) * np.timedelta64(1, 'm')),
                     'lid': pa.array(np.arange(len(lk)), pa.int64())})
    # dedupe right (k, ts) so the as-of match is unambiguous for both engines
    rframe = pd.DataFrame({'k': rk, 'ts': (base + np.asarray(rt, dtype=np.int64)
                                           * np.timedelta64(1, 'm'))})
    rframe['v'] = np.arange(len(rframe), dtype=np.float64)
    rframe = rframe.drop_duplicates(['k', 'ts'], keep='last').reset_index(drop=True)
    right = pa.Table.from_pandas(rframe, preserve_index=False)

    got = (asof_join(rd.from_arrow(left), rd.from_arrow(right), by=['k'], on='ts',
                     num_partitions=num_partitions)
           .to_pandas().sort_values('lid').reset_index(drop=True))
    if len(rframe) == 0:
        assert got['v'].isna().all()
        return
    lsorted = left.to_pandas().sort_values('ts', kind='stable')
    expect = pd.merge_asof(lsorted, rframe.sort_values('ts', kind='stable'),
                           on='ts', by='k').sort_values('lid').reset_index(drop=True)
    np.testing.assert_allclose(got['v'].to_numpy(dtype=float),
                               expect['v'].to_numpy(dtype=float), equal_nan=True)


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(frames())
def test_rolling_suite_matches_window_slices(case):
    table, num_blocks, num_partitions = case
    schema = Schema([
        CS.numeric(name='row_id', role=ColumnRole.IDENTIFIER),
        CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
        CS.nominal(name='g', role=ColumnRole.IDENTIFIER),
        CS.numeric(name='x'),
    ])
    ds = Dataset.from_arrow(table, schema, order_by=['ts', 'row_id'],
                            num_blocks=num_blocks, num_partitions=num_partitions)
    got = (Pipeline(ds)
           .with_arithmetic_aggregation('x', aggregations=[ArithmeticAggregations.SUM,
                                                           ArithmeticAggregations.MIN],
                                        over_columns_combinations=[['g']],
                                        time_windows=['3h'], index_column_name='ts')
           .collect()).sort_values('row_id').reset_index(drop=True)

    ref = table.to_pandas().sort_values(['ts', 'row_id']).reset_index(drop=True)
    window = pd.Timedelta(hours=3)
    exp_sum, exp_min = [], []
    for _, row in ref.iterrows():
        sub = ref[(ref['g'] == row['g']) & (ref['ts'] > row['ts'] - window) & (ref['ts'] <= row['ts'])]
        vals = sub['x'].dropna()
        exp_sum.append(vals.sum() if len(vals) else 0.0)
        exp_min.append(vals.min() if len(vals) else np.nan)
    byid = ref.sort_values('row_id').index
    got_sum = got['x_sum_in_the_last_3h_over_g'].to_numpy(dtype=float)
    got_min = got['x_min_in_the_last_3h_over_g'].to_numpy(dtype=float)
    np.testing.assert_allclose(got_sum, np.asarray(exp_sum)[np.argsort(ref['row_id'].to_numpy())],
                               rtol=1e-9, atol=1e-9, equal_nan=True)
    np.testing.assert_allclose(got_min, np.asarray(exp_min)[np.argsort(ref['row_id'].to_numpy())],
                               rtol=1e-12, equal_nan=True)


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(frames())
def test_round4_feature_suite_matches_pandas(case):
    """Target encoding / binning / rank family / diff / winsorize on random
    frames and physical layouts vs a driver-side pandas oracle."""
    table, num_blocks, num_partitions = case
    schema = Schema([
        CS.numeric(name='row_id', role=ColumnRole.IDENTIFIER),
        CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
        CS.nominal(name='g', role=ColumnRole.IDENTIFIER),
        CS.numeric(name='x'),
    ])
    from auto_featurs_ray.transformers.aggregating import Binning
    ds = Dataset.from_arrow(table, schema, order_by=['ts', 'row_id'],
                            num_blocks=num_blocks, num_partitions=num_partitions)
    got = (Pipeline(ds)
           .with_target_encoding('x', over_columns_combinations=[['g']], smoothing=5.0)
           .with_arithmetic_aggregation('x', aggregations=[ArithmeticAggregations.RANK],
                                        over_columns_combinations=[['g']])
           .with_binning('x', [Binning.QUANTILE], num_bins=[4],
                         over_columns_combinations=[['g']])
           .with_diff('x', lags=[1], over_columns_combinations=[['g']])
           .with_winsorize('x', limits=[(0.1, 0.9)], over_columns_combinations=[['g']])
           .collect()).sort_values('row_id').reset_index(drop=True)

    ref = table.to_pandas().sort_values(['ts', 'row_id']).reset_index(drop=True)
    grouped = ref.groupby('g', sort=False)['x']
    prior = ref['x'].sum() / len(ref)  # engine mean counts null rows (reference quirk)
    te = (grouped.transform('sum').fillna(0.0) + 5.0 * prior) / (grouped.transform('count') + 5.0)
    rank = grouped.rank(method='min')
    edges = grouped.transform('quantile', 0.25), grouped.transform('quantile', 0.5), \
        grouped.transform('quantile', 0.75)
    qbin = sum((ref['x'] > np.round(e, 6)).astype(float) for e in edges)
    qbin = qbin.where(~ref['x'].isna(), np.nan)
    diff = ref['x'] - grouped.shift(1)
    lo, hi = grouped.transform('quantile', 0.1), grouped.transform('quantile', 0.9)
    winsor = ref['x'].clip(lo, hi)

    order = np.argsort(ref['row_id'].to_numpy())
    for col_name, exp in [('x_target_enc_s5_over_g', te), ('x_rank_over_g', rank),
                          ('x_qbin_4_over_g', qbin), ('x_diff_1_over_g', diff),
                          ('x_winsor_10_90_over_g', winsor)]:
        np.testing.assert_allclose(
            got[col_name].to_numpy(dtype=float),
            exp.to_numpy(dtype=float)[order],
            rtol=1e-9, equal_nan=True, err_msg=col_name)


@st.composite
def event_logs(draw):
    n = draw(st.integers(4, 60))
    keys = draw(st.lists(st.sampled_from(['u1', 'u2', 'u3']), min_size=n, max_size=n))
    ts = sorted(draw(st.lists(st.integers(0, 500), min_size=n, max_size=n)))
    vals = draw(st.lists(st.floats(-50, 50, allow_nan=False).map(lambda v: round(v, 3)),
                         min_size=n, max_size=n))
    num_partitions = draw(st.integers(1, 4))
    return keys, ts, vals, num_partitions


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(event_logs())
def test_session_summary_matches_brute_force(case):
    import ray.data as rd

    from auto_featurs_ray.datapipe.sessions import session_summary
    keys, ts, vals, num_partitions = case
    n = len(keys)
    base = np.datetime64('2024-01-01', 'us')
    t = pa.table({'u': pa.array(keys), 'eid': pa.array(range(n), pa.int64()),
                  'ts': pa.array(base + np.asarray(ts) * np.timedelta64(1, 'm')),
                  'v': pa.array(vals, pa.float64())})
    gap_s = 60.0 * 30  # 30-minute session gap
    out = (session_summary(rd.from_arrow([t.slice(i, 7) for i in range(0, n, 7)]),
                           by=['u'], ts_column='ts', gap_s=gap_s,
                           tiebreak_columns=['eid'], value_column='v',
                           num_partitions=num_partitions)
           .to_pandas().sort_values(['u', 'session_id']).reset_index(drop=True))

    df = t.to_pandas().sort_values(['u', 'ts', 'eid']).reset_index(drop=True)
    expected = []
    for u, grp in df.groupby('u', sort=True):
        sid, prev = 0, None
        sessions: dict = {}
        for _, r in grp.iterrows():
            if prev is None or (r.ts - prev).total_seconds() > gap_s:
                sid += 1
                sessions[sid] = []
            sessions[sid].append(r)
            prev = r.ts
        for sid, rows in sessions.items():
            expected.append((u, sid, len(rows),
                             (rows[-1].ts - rows[0].ts).total_seconds(),
                             sum(r.v for r in rows)))
    exp = pd.DataFrame(expected, columns=['u', 'session_id', 'n_events',
                                          'duration_s', 'v_sum'])
    exp = exp.sort_values(['u', 'session_id']).reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out['session_id'].to_numpy(), exp['session_id'].to_numpy())
    np.testing.assert_array_equal(out['n_events'].to_numpy(), exp['n_events'].to_numpy())
    np.testing.assert_allclose(out['duration_s'].to_numpy(), exp['duration_s'].to_numpy())
    np.testing.assert_allclose(out['v_sum'].to_numpy(dtype=float),
                               exp['v_sum'].to_numpy(dtype=float), rtol=1e-9)


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(event_logs())
def test_range_join_matches_brute_force(case):
    import ray.data as rd

    from auto_featurs_ray.engine.asof import range_join_aggregate
    keys, ts, vals, num_partitions = case
    n = len(keys)
    left = pa.table({'k': pa.array(keys), 'ts': pa.array(ts, pa.int64()),
                     'lid': pa.array(range(n), pa.int64())})
    right = pa.table({'k': pa.array(list(reversed(keys))), 'ts': pa.array(ts, pa.int64()),
                      'v': pa.array(vals, pa.float64())})
    LO, HI = -40, 60
    out = (range_join_aggregate(rd.from_arrow(left), rd.from_arrow(right),
                                by=['k'], on='ts', lo_us=LO, hi_us=HI,
                                value_column='v', aggs=['count', 'sum'],
                                num_partitions=num_partitions)
           .to_pandas().sort_values('lid').reset_index(drop=True))
    lf, rf = left.to_pandas(), right.to_pandas()
    for _, row in lf.iterrows():
        m = rf[(rf.k == row.k) & (rf.ts >= row.ts + LO) & (rf.ts < row.ts + HI)]
        got = out[out.lid == row.lid].iloc[0]
        assert got['count'] == len(m), (row.lid, got['count'], len(m))
        if len(m):
            assert abs(got['v_sum'] - m.v.sum()) < 1e-9
        else:
            assert np.isnan(got['v_sum'])


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(event_logs())
def test_relational_layer_matches_pandas(case):
    import ray.data as rd

    from auto_featurs_ray.datapipe.relational import (drop_duplicates, groupby_aggregate,
                                                      top_n_per_group)
    keys, ts, vals, num_partitions = case
    n = len(keys)
    t = pa.table({'g': pa.array(keys), 'o': pa.array(ts, pa.int64()),
                  'id': pa.array(range(n), pa.int64()), 'v': pa.array(vals, pa.float64())})
    blocks = [t.slice(i, 5) for i in range(0, n, 5)]
    df = t.to_pandas()

    agg = (groupby_aggregate(rd.from_arrow(blocks), by=['g'],
                             aggs={'v': ['count', 'sum', 'mean', 'min', 'max',
                                         'count_distinct'], '*': ['count']},
                             num_partitions=num_partitions)
           .to_pandas().sort_values('g').reset_index(drop=True))
    exp = df.groupby('g', sort=True)['v'].agg(['count', 'sum', 'mean', 'min', 'max',
                                               'nunique']).reset_index()
    np.testing.assert_array_equal(agg['v_count'].to_numpy(), exp['count'].to_numpy())
    np.testing.assert_allclose(agg['v_sum'].to_numpy(), exp['sum'].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(agg['v_mean'].to_numpy(), exp['mean'].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(agg['v_min'].to_numpy(dtype=float), exp['min'].to_numpy())
    np.testing.assert_allclose(agg['v_max'].to_numpy(dtype=float), exp['max'].to_numpy())
    np.testing.assert_array_equal(agg['v_count_distinct'].to_numpy(),
                                  exp['nunique'].to_numpy())

    dd = (drop_duplicates(rd.from_arrow(blocks), subset=['g'], keep_order_by=['o', 'id'],
                          num_partitions=num_partitions)
          .to_pandas().sort_values('g').reset_index(drop=True))
    exp_dd = (df.sort_values(['g', 'o', 'id']).groupby('g', sort=True).head(1)
              .sort_values('g').reset_index(drop=True))
    np.testing.assert_array_equal(dd['id'].to_numpy(), exp_dd['id'].to_numpy())

    top = (top_n_per_group(rd.from_arrow(blocks), by=['g'], order_by=['o', 'id'], n=3,
                           num_partitions=num_partitions)
           .to_pandas().sort_values(['g', 'o', 'id']).reset_index(drop=True))
    exp_top = (df.sort_values(['g', 'o', 'id']).groupby('g', sort=True).head(3)
               .sort_values(['g', 'o', 'id']).reset_index(drop=True))
    np.testing.assert_array_equal(top['id'].to_numpy(), exp_top['id'].to_numpy())


@st.composite
def agg_frames(draw):
    n = draw(st.integers(min_value=3, max_value=60))
    keys = draw(st.lists(st.sampled_from(['a', 'b', None, 'hot']), min_size=n, max_size=n))
    values = draw(st.lists(st.one_of(st.none(),
                                     st.floats(-50, 50, allow_nan=False)
                                     .map(lambda v: round(v, 2))),
                           min_size=n, max_size=n))
    num_blocks = draw(st.integers(1, 4))
    num_partitions = draw(st.integers(1, 5))
    return keys, values, num_blocks, num_partitions


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])
@given(agg_frames())
def test_groupby_aggregate_property_conformance(case):
    """Random null-heavy frames through the two-phase relational aggregate
    (incl. the round-5 var/std/median/quantile/collect_set additions) must
    match a pandas oracle for ANY block x partition layout."""
    import ray.data as rd

    from auto_featurs_ray.datapipe.relational import groupby_aggregate

    keys, values, num_blocks, num_partitions = case
    n = len(keys)
    tbl = pa.table({'g': pa.array(pd.Series(keys, dtype=object)),
                    'v': pa.array(values, pa.float64())})
    step = max(1, -(-n // num_blocks))
    ds = rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)])
    out = groupby_aggregate(
        ds, by=['g'],
        aggs={'v': ['count', 'sum', 'mean', 'min', 'max', 'count_distinct',
                    'var', 'std', 'median', 'quantile_25', 'collect_set'],
              '*': ['count']},
        num_partitions=num_partitions).to_pandas()
    out = out.sort_values('g', na_position='first').reset_index(drop=True)

    df = pd.DataFrame({'g': keys, 'v': values}, dtype=object)
    df['v'] = df['v'].astype(np.float64)
    grouped = df.groupby('g', dropna=False)['v']
    want = pd.DataFrame({
        'count': grouped.count(), 'sum': grouped.sum(min_count=1),
        'mean': grouped.mean(), 'min': grouped.min(), 'max': grouped.max(),
        'nd': grouped.nunique(), 'var': grouped.var(ddof=1), 'std': grouped.std(ddof=1),
        'median': grouped.median(), 'q25': grouped.quantile(0.25),
        'n_rows': df.groupby('g', dropna=False)['v'].size(),
    }).sort_index(na_position='first').reset_index()

    assert len(out) == len(want)
    np.testing.assert_array_equal(out['v_count'].to_numpy(), want['count'].to_numpy())
    np.testing.assert_array_equal(out['n_rows'].to_numpy(), want['n_rows'].to_numpy())
    np.testing.assert_array_equal(out['v_count_distinct'].to_numpy(), want['nd'].to_numpy())
    for eng, ref in (('v_sum', 'sum'), ('v_mean', 'mean'), ('v_min', 'min'),
                     ('v_max', 'max'), ('v_var', 'var'), ('v_std', 'std'),
                     ('v_median', 'median'), ('v_quantile_25', 'q25')):
        np.testing.assert_allclose(out[eng].to_numpy(dtype=np.float64),
                                   want[ref].to_numpy(dtype=np.float64),
                                   rtol=1e-9, atol=1e-12, equal_nan=True,
                                   err_msg=eng)
    # collect_set: sorted distinct valid values per group, aligned BY KEY
    # (pandas groupby iterates NaN keys last; the output sorts them first)
    expect_by_key = {('<null>' if pd.isna(k) else k): sorted(set(sub.dropna().tolist()))
                     for k, sub in df.groupby('g', dropna=False)['v']}
    for k, lst in zip(out['g'], out['v_collect_set']):
        key = '<null>' if pd.isna(k) else k
        assert list(lst) == expect_by_key[key], key
