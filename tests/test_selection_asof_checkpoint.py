"""Feature selection (F3 goldens), as-of join, temporal ops, resumable sink."""

import json
import os
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from auto_featurs_ray import ColumnRole, CumulativeOptions, Pipeline, Schema
from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.engine.asof import asof_join
from auto_featurs_ray.engine.checkpoint import resumable_write, simulate_partial_write
from auto_featurs_ray.feature_selection.feature_selector import FeatureSelector, SelectionMethod
from auto_featurs_ray.transformers.temporal import FillStrategy

from tests.fixtures import assert_column


# F3 fixture — reference feature_selection/tests/test_feature_selector.py:19-37
F3_TABLE = pa.table({
    'x_1': [0, 0, 0, 0],
    'x2': [10, 9, 8, 7],
    'x3': [False, True, False, True],
    'x4': [2, 4, 6, 8],
    'z1': ['a', 'b', 'b', 'c'],
    'z2': ['hello', 'world', 'foo', 'bar'],
    'y': [False, True, False, True],
})
F3_SCHEMA = Schema([
    CS.numeric(name='x_1'), CS.numeric(name='x2'), CS.boolean(name='x3'), CS.numeric(name='x4'),
    CS.ordinal(name='z1'), CS.text(name='z2'),
    CS.boolean(name='y', role=ColumnRole.LABEL),
])


def f3_dataset():
    return Dataset.from_arrow(F3_TABLE, F3_SCHEMA, num_blocks=2)


class TestFeatureSelection:
    def test_correlation_goldens(self):
        report = FeatureSelector().get_report(f3_dataset(), ['x_1', 'x2', 'x3', 'x4'],
                                              SelectionMethod.CORRELATION)
        stats = dict(zip(report.feature_names, report.stat_values))
        assert stats['x_1'] == 0.0
        assert abs(stats['x2'] - 0.4472135955) < 1e-9
        assert abs(stats['x3'] - 1.0) < 1e-9
        assert abs(stats['x4'] - 0.4472135955) < 1e-9

    def test_t_test_goldens(self):
        report = FeatureSelector().get_report(f3_dataset(), ['x_1', 'x2', 'x3', 'x4'],
                                              SelectionMethod.T_TEST)
        stats = dict(zip(report.feature_names, report.stat_values))
        assert stats['x_1'] == 0.0
        assert abs(stats['x2'] - 0.7071067812) < 1e-9
        assert stats['x3'] == float('inf')
        assert abs(stats['x4'] - 0.7071067812) < 1e-9

    def test_chi_squared_goldens(self):
        report = FeatureSelector().get_report(f3_dataset(), ['x3', 'z1'], SelectionMethod.CHI_SQUARED)
        stats = dict(zip(report.feature_names, report.stat_values))
        assert abs(stats['x3'] - 4.0) < 1e-9
        assert abs(stats['z1'] - 2.0) < 1e-9

    def test_select_features_tie_break(self):
        report = FeatureSelector().get_report(f3_dataset(), ['x_1', 'x2', 'x3', 'x4'],
                                              SelectionMethod.CORRELATION)
        # x2 and x4 tie at 0.447 -> name ascending tie-break
        assert FeatureSelector().select_features(report, top_k=3) == ['x3', 'x2', 'x4']
        assert FeatureSelector().select_features(report, frac=0.5) == ['x3', 'x2']

    def test_validation(self):
        with pytest.raises(ValueError):
            FeatureSelector().get_report(f3_dataset(), ['z2'], SelectionMethod.CORRELATION)
        with pytest.raises(ValueError):
            FeatureSelector().select_features(
                FeatureSelector().get_report(f3_dataset(), ['x2'], SelectionMethod.CORRELATION))


class TestAsofJoin:
    def test_backward_join(self):
        left = pa.table({
            'k': ['a', 'a', 'b', 'c'],
            'ts': pa.array([datetime(2020, 1, d) for d in (1, 5, 2, 3)], pa.timestamp('us')),
            'payload': pa.array([[1, 2], [3], [4, 5, 6], [7]], pa.list_(pa.int32())),
        })
        right = pa.table({
            'k': ['a', 'a', 'b'],
            'ts': pa.array([datetime(2020, 1, 1), datetime(2020, 1, 4), datetime(2020, 1, 9)], pa.timestamp('us')),
            'v': [10.0, 20.0, 30.0],
        })
        out = asof_join(rd.from_arrow(left), rd.from_arrow(right), by=['k'], on='ts',
                        num_partitions=3).to_pandas().sort_values(['k', 'ts']).reset_index(drop=True)
        assert out['v'].tolist()[0] == 10.0       # a@1 matches a@1 (exact)
        assert out['v'].tolist()[1] == 20.0       # a@5 matches a@4
        assert np.isnan(out['v'].tolist()[2])     # b@2: right only at b@9
        assert np.isnan(out['v'].tolist()[3])     # c: no right rows
        # payload survives untouched
        assert [list(x) for x in out['payload']] == [[1, 2], [3], [4, 5, 6], [7]]

    def test_forward_and_suffix(self):
        left = pa.table({'k': ['a'], 'ts': [1], 'v': ['keep']})
        right = pa.table({'k': ['a'], 'ts': [5], 'v': ['right']})
        out = asof_join(rd.from_arrow(left), rd.from_arrow(right), by=['k'], on='ts',
                        direction='forward', num_partitions=2).to_pandas()
        assert out['v'].tolist() == ['keep']
        assert out['v_right'].tolist() == ['right']


class TestRangeJoinAggregate:
    """range_join_aggregate (engine extension): prefix-difference window
    aggregation of a right table per left row."""

    def _run(self, lo_us, hi_us, aggs=('count', 'sum', 'mean')):
        from auto_featurs_ray.engine.asof import range_join_aggregate
        left = pa.table({'k': ['a', 'a', 'b', 'c'], 'ts': [0, 10, 5, 1],
                         'event_id': [0, 1, 2, 3]})
        right = pa.table({'k': ['a', 'a', 'a', 'b'], 'ts': [1, 9, 12, 5],
                          'v': [1.0, 2.0, None, 4.0]})
        out = range_join_aggregate(rd.from_arrow(left), rd.from_arrow(right),
                                   by=['k'], on='ts', lo_us=lo_us, hi_us=hi_us,
                                   value_column='v', aggs=list(aggs),
                                   num_partitions=3)
        return out.to_pandas().sort_values('event_id').reset_index(drop=True)

    def test_forward_window(self):
        # [t, t+10): a@0 sees ts 1,9 -> count 2 sum 3; a@10 sees 12 (null v)
        # -> count 1 sum NaN; b@5 sees b@5 -> count 1 sum 4; c: none
        out = self._run(0, 10)
        assert out['count'].tolist() == [2, 1, 1, 0]
        v = out['v_sum'].tolist()
        assert v[0] == 3.0 and np.isnan(v[1]) and v[2] == 4.0 and np.isnan(v[3])
        m = out['v_mean'].tolist()
        assert m[0] == 1.5 and v[2] == 4.0

    def test_trailing_window_excludes_self_with_negative_bounds(self):
        # [t-10, t): a@10 sees ts 1,9 -> count 2; a@0 and others see nothing
        out = self._run(-10, 0)
        assert out['count'].tolist() == [0, 2, 0, 0]

    def test_empty_window_rejected(self):
        with pytest.raises(ValueError, match='empty window'):
            self._run(5, 5)

    def test_value_required_for_sum(self):
        from auto_featurs_ray.engine.asof import range_join_aggregate
        left = pa.table({'k': ['a'], 'ts': [0]})
        with pytest.raises(ValueError, match='value_column'):
            range_join_aggregate(rd.from_arrow(left), rd.from_arrow(left),
                                 by=['k'], on='ts', lo_us=0, hi_us=1, aggs=['sum'])

    def test_unsupported_agg_rejected(self):
        from auto_featurs_ray.engine.asof import range_join_aggregate
        left = pa.table({'k': ['a'], 'ts': [0], 'v': [1.0]})
        with pytest.raises(ValueError, match='unsupported range aggs'):
            range_join_aggregate(rd.from_arrow(left), rd.from_arrow(left),
                                 by=['k'], on='ts', lo_us=0, hi_us=1,
                                 value_column='v', aggs=['max'])


class TestTemporal:
    def _dataset(self):
        table = pa.table({
            'user': ['u1'] * 4 + ['u2'] * 2,
            'ts': pa.array([datetime(2020, 1, 1, 0, 0), datetime(2020, 1, 1, 0, 10),
                            datetime(2020, 1, 1, 2, 0), datetime(2020, 1, 1, 2, 5),
                            datetime(2020, 1, 1, 1, 0), datetime(2020, 1, 1, 1, 20)], pa.timestamp('us')),
            'x': [1.0, None, 3.0, None, None, 6.0],
        })
        schema = Schema([CS.nominal(name='user', role=ColumnRole.IDENTIFIER),
                         CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
                         CS.numeric(name='x')])
        return Dataset.from_arrow(table, schema, order_by=['user', 'ts'], num_blocks=2, num_partitions=3)

    def test_sessionization_and_recency(self):
        df = (Pipeline(self._dataset())
              .with_sessionization('ts', gaps=['30m'], over_columns_combinations=[['user']])
              .with_time_since_last('ts', over_columns_combinations=[['user']])
              .collect())
        assert_column(df, 'ts_session_id_gap_30m_over_user', [1, 1, 2, 2, 1, 1])
        assert_column(df, 'ts_seconds_since_last_over_user', [None, 600.0, 6600.0, 300.0, None, 1200.0])

    def test_fill(self):
        df = (Pipeline(self._dataset())
              .with_fill('x', strategies=[FillStrategy.FORWARD, FillStrategy.BACKWARD],
                         over_columns_combinations=[['user']])
              .collect())
        assert_column(df, 'x_forward_filled_over_user', [1.0, 1.0, 3.0, 3.0, None, 6.0])
        assert_column(df, 'x_backward_filled_over_user', [1.0, 3.0, 3.0, None, 6.0, 6.0])


class TestTimeToNext:
    def test_forward_recency(self):
        from datetime import datetime

        from auto_featurs_ray.base.column_specification import ColumnSpecification as _CS
        from auto_featurs_ray.engine.aggframe import AggFrame
        from auto_featurs_ray.transformers.temporal import TimeToNextTransformer
        t = pa.table({'ts': pa.array([datetime(2020, 1, 1, 0, 0, 0),
                                      datetime(2020, 1, 1, 0, 0, 30),
                                      datetime(2020, 1, 1, 1, 0, 0)], pa.timestamp('us'))})
        codes = np.array([0, 0, 1])
        got = TimeToNextTransformer(_CS.datetime(name='ts')).compute(AggFrame(t), codes)
        vals = np.asarray(got, dtype=np.float64)
        assert vals[0] == 30.0 and np.isnan(vals[1]) and np.isnan(vals[2])


class TestGroupImputation:
    def test_mean_and_median_fill(self):
        from auto_featurs_ray.base.column_specification import ColumnSpecification as _CS
        from auto_featurs_ray.engine.aggframe import AggFrame
        from auto_featurs_ray.transformers.temporal import FillStrategy, FillTransformer
        t = pa.table({'x': [1.0, None, 4.0, None, 10.0]})
        codes = np.array([0, 0, 0, 1, 1])
        spec = _CS.numeric(name='x')
        mean = FillTransformer(spec, FillStrategy.MEAN).compute(AggFrame(t), codes)
        med = FillTransformer(spec, FillStrategy.MEDIAN).compute(AggFrame(t), codes)
        assert list(mean) == [1.0, 2.5, 4.0, 10.0, 10.0]
        assert list(med) == [1.0, 2.5, 4.0, 10.0, 10.0]
        assert FillTransformer(spec, FillStrategy.MEAN).output_name == 'x_mean_filled'


class TestResumableWrite:
    def _make_ds(self):
        rng = np.random.default_rng(7)
        table = pa.table({
            'k': [f'k{i % 17}' for i in range(500)],
            'ts': np.arange(500, dtype=np.int64),
            'v': rng.random(500),
        })
        return rd.from_arrow(table)

    def test_resume_produces_identical_bytes(self, tmp_path):
        full_dir = str(tmp_path / 'full')
        resumed_dir = str(tmp_path / 'resumed')
        resumable_write(self._make_ds(), full_dir, key_columns=['k'], order_by=['ts'], num_partitions=8)
        # simulate a job killed after 3 partitions, then resume
        simulate_partial_write(self._make_ds(), resumed_dir, key_columns=['k'], order_by=['ts'],
                               num_partitions=8, keep_partitions=3)
        records = resumable_write(self._make_ds(), resumed_dir, key_columns=['k'], order_by=['ts'],
                                  num_partitions=8)
        assert sum(1 for r in records if r['skipped']) == 3
        for name in sorted(os.listdir(full_dir)):
            if not name.endswith('.parquet'):
                continue
            with open(os.path.join(full_dir, name), 'rb') as a, open(os.path.join(resumed_dir, name), 'rb') as b:
                assert a.read() == b.read(), f'{name} differs after resume'

    def test_manifest_lineage(self, tmp_path):
        out = str(tmp_path / 'o')
        records = resumable_write(self._make_ds(), out, key_columns=['k'], order_by=['ts'], num_partitions=4)
        assert sum(r['rows'] for r in records) == 500
        for r in records:
            assert {'partition_id', 'rows', 'bytes', 'sha256', 'wall_time_s'} <= set(r)
            manifest = json.load(open(os.path.join(out, '_manifest', f"part-{r['partition_id']:05d}.json")))
            assert manifest['sha256'] == r['sha256']


class TestHashJoin:
    def test_inner_and_left(self):
        from auto_featurs_ray.engine.join import hash_join
        left = pa.table({'k': [1, 2, 2, 3, 5], 'a': ['x', 'y', 'z', 'w', 'v']})
        right = pa.table({'kk': [1, 2, 4], 'b': [10.0, 20.0, 40.0], 'a': ['r1', 'r2', 'r4']})
        inner = (hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'], right_on=['kk'],
                           num_partitions=3).to_pandas().sort_values(['k', 'a']).reset_index(drop=True))
        assert inner['k'].tolist() == [1, 2, 2]
        assert inner['b'].tolist() == [10.0, 20.0, 20.0]
        assert inner['a_right'].tolist() == ['r1', 'r2', 'r2']
        louter = (hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'], right_on=['kk'],
                            how='left', num_partitions=3).to_pandas())
        assert len(louter) == 5
        assert louter['b'].isna().sum() == 2

    def test_semi_and_anti(self):
        from auto_featurs_ray.engine.join import hash_join
        left = pa.table({'k': [1, 2, 3, 2], 'v': ['a', 'b', 'c', 'd']})
        right = pa.table({'k': [2, 2, 4], 'w': [10, 20, 30]})
        semi = hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'],
                         how='semi', num_partitions=2).to_pandas()
        anti = hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'],
                         how='anti', num_partitions=2).to_pandas()
        assert sorted(semi['v']) == ['b', 'd']           # no row multiplication
        assert sorted(anti['v']) == ['a', 'c']
        assert 'w' not in semi.columns and 'w' not in anti.columns

    def test_broadcast_join_matches_hash_join(self):
        from auto_featurs_ray.engine.join import broadcast_join, hash_join
        left = pa.table({'k': [1, 2, 3, 2], 'v': ['a', 'b', 'c', 'd']})
        right = pa.table({'k': [2, 4], 'w': [10.0, 30.0]})
        for how in ('left', 'inner', 'semi', 'anti'):
            b = (broadcast_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'], how=how)
                 .to_pandas().sort_values('v').reset_index(drop=True))
            h = (hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'], how=how,
                           num_partitions=2)
                 .to_pandas().sort_values('v').reset_index(drop=True))
            assert b['v'].tolist() == h['v'].tolist(), how
            if 'w' in b.columns:
                np.testing.assert_allclose(b['w'].to_numpy(dtype=float),
                                           h['w'].to_numpy(dtype=float), equal_nan=True)

    def test_broadcast_join_row_guard(self):
        from auto_featurs_ray.engine.join import broadcast_join
        t = pa.table({'k': [1, 2, 3]})
        with pytest.raises(ValueError, match='hash_join'):
            broadcast_join(rd.from_arrow(t), rd.from_arrow(t), on=['k'], max_rows=2)

    def test_invalid_how(self):
        from auto_featurs_ray.engine.join import hash_join
        # 'full' became a supported join type in round 5; 'cross' is not one
        with pytest.raises(ValueError):
            hash_join(None, None, on=['k'], how='cross')

    def test_mismatched_key_widths_still_match(self):
        # int32 vs int64 keys (incl. negatives, whose two's-complement views
        # hash differently) must land in the same partition and join
        from auto_featurs_ray.engine.join import hash_join
        left = pa.table({'k': pa.array([-5, -5, 7, 9], pa.int32()), 'a': ['p', 'q', 'r', 's']})
        right = pa.table({'k': pa.array([-5, 7], pa.int64()), 'b': [1.0, 2.0]})
        out = (hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'],
                         num_partitions=4).to_pandas().sort_values(['k', 'a']))
        assert out['k'].tolist() == [-5, -5, 7]
        assert out['b'].tolist() == [1.0, 1.0, 2.0]


class TestDedupeMaxNullKeys:
    def test_null_keys_collapse_like_values(self):
        """NaN/None/NaT join keys must behave as ONE key value in
        right_dedupe_max: duplicates under a null key collapse to the
        max-value row, exactly like a non-null key."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from auto_featurs_ray.engine.asof import _dedupe_max

        # float key with NaN, object key with None, plus normal keys
        t = pa.table({
            'k': pa.array([1.0, 1.0, None, None, 2.0], pa.float64()),
            'ts': pa.array([10, 10, 10, 10, 10], pa.int64()),
            'v': pa.array([1.0, 5.0, 2.0, 7.0, 3.0], pa.float64()),
        })
        out = _dedupe_max(t, ['k'], 'ts', 'v').to_pandas()
        # one row per key incl. the null key, each keeping the max v
        got = {(None if pd.isna(k) else k): v for k, v in zip(out['k'], out['v'])}
        assert got == {1.0: 5.0, None: 7.0, 2.0: 3.0}

        t2 = pa.table({
            'k': pa.array(['a', 'a', None, None], pa.string()),
            'ts': pa.array([1, 1, 1, 1], pa.int64()),
            'v': pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        })
        out2 = _dedupe_max(t2, ['k'], 'ts', 'v').to_pandas()
        got2 = {(None if pd.isna(k) else k): v for k, v in zip(out2['k'], out2['v'])}
        assert got2 == {'a': 2.0, None: 4.0}


def test_resumable_write_job_summary(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from auto_featurs_ray.engine.checkpoint import resumable_write

    tbl = pa.table({'k': ['a', 'b', 'c', 'a'], 'v': [1.0, 2.0, 3.0, 4.0]})
    out_dir = str(tmp_path / 'sink')
    records = resumable_write(rd.from_arrow(tbl), out_dir, key_columns=['k'],
                              num_partitions=4)
    assert all('rows_per_sec' in r for r in records if not r['skipped'])
    summary = json.load(open(os.path.join(out_dir, '_manifest', '_summary.json')))
    assert summary['rows_total'] == 4
    assert summary['partitions'] == 4
    assert summary['partitions_written'] == 4 and summary['partitions_skipped'] == 0
    assert summary['run_rows_per_sec'] is not None
    # resume: everything skips, summary reflects it
    resumable_write(rd.from_arrow(tbl), out_dir, key_columns=['k'], num_partitions=4)
    summary2 = json.load(open(os.path.join(out_dir, '_manifest', '_summary.json')))
    assert summary2['partitions_skipped'] == 4 and summary2['partitions_written'] == 0
    assert summary2['rows_total'] == 4
