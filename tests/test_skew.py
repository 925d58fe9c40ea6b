"""Pathological entity skew (verdict stretch item 9).

Order-dependent window aggregates cannot split one entity across reduce tasks
(the match needs the full ordered history), so one pathological entity lands
in one partition by design.  These tests pin the behavior the engine promises
instead: the job completes, results are exactly correct, and other entities'
partitions are unaffected.
"""

import numpy as np
import pyarrow as pa

from auto_featurs_ray.base.column_specification import ColumnRole
from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.base.schema import Schema
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.pipeline.pipeline import Pipeline
from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations
from auto_featurs_ray.transformers.base import CumulativeOptions


def _skewed_table(hot_rows=30000, cold_entities=50, cold_rows=20):
    """One entity holds ~97% of all rows; many small entities fill the rest."""
    rng = np.random.default_rng(13)
    users = ['hot'] * hot_rows + [f'u{i}' for i in range(cold_entities) for _ in range(cold_rows)]
    n = len(users)
    ts = (np.datetime64('2024-01-01', 'us') + np.arange(n) * np.timedelta64(1, 's'))
    return pa.table({
        'event_id': pa.array(np.arange(n), pa.int64()),
        'ts': pa.array(ts),
        'user': pa.array(users),
        'value': pa.array(rng.random(n)),
    })


def test_suggest_num_partitions_targets_bytes():
    from auto_featurs_ray.engine.runtime import TARGET_PARTITION_BYTES, suggest_num_partitions
    assert suggest_num_partitions(0) == 8  # floor
    assert suggest_num_partitions(100 * TARGET_PARTITION_BYTES) == 100
    assert suggest_num_partitions(100 * TARGET_PARTITION_BYTES + 1) == 101
    assert suggest_num_partitions(10**18) == 65536  # ceiling


def test_flagship_derives_partition_count(tmp_path):
    from auto_featurs_ray.fixtures import write_sequence_dataset
    from auto_featurs_ray.pipelines.flagship import run_flagship
    root = write_sequence_dataset(str(tmp_path / 'f6'), num_shards=2, docs_per_shard=50, seed=3)
    import os
    result = run_flagship(os.path.join(root, 'sequences'), os.path.join(root, 'events'),
                          num_partitions=None)  # derive from shard bytes
    assert result.data.count() > 0


def test_empty_and_single_row_pipelines():
    schema = Schema([
        CS.numeric(name='id', role=ColumnRole.IDENTIFIER),
        CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
        CS.nominal(name='g', role=ColumnRole.IDENTIFIER),
        CS.numeric(name='x'),
    ])

    def run(table):
        ds = Dataset.from_arrow(table, schema, order_by=['ts', 'id'],
                                num_blocks=2, num_partitions=3)
        return (Pipeline(ds)
                .with_count(over_columns_combinations=[['g']],
                            cumulative=CumulativeOptions.EXCLUSIVE)
                .with_arithmetic_aggregation('x', aggregations=[ArithmeticAggregations.MEAN],
                                             over_columns_combinations=[['g']])
                .collect())

    single = pa.table({'id': pa.array([1], pa.int64()),
                       'ts': pa.array([np.datetime64('2024-01-01', 'us')]),
                       'g': pa.array(['a']), 'x': pa.array([2.0])})
    out = run(single)
    assert len(out) == 1
    assert out['exclusive_cum_count_over_g'].tolist() == [0]
    assert out['x_mean_over_g'].tolist() == [2.0]
    assert len(run(single.slice(0, 0))) == 0  # empty input -> empty output, no crash


def test_hot_entity_results_exact():
    table = _skewed_table()
    schema = Schema([
        CS.numeric(name='event_id', role=ColumnRole.IDENTIFIER),
        CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
        CS.nominal(name='user', role=ColumnRole.IDENTIFIER),
        CS.numeric(name='value'),
    ])
    ds = Dataset.from_arrow(table, schema, order_by=['ts', 'event_id'],
                            num_blocks=8, num_partitions=16)
    df = (Pipeline(ds)
          .with_count(over_columns_combinations=[['user']], cumulative=CumulativeOptions.EXCLUSIVE)
          .with_arithmetic_aggregation('value', aggregations=[ArithmeticAggregations.SUM],
                                       over_columns_combinations=[['user']],
                                       cumulative=CumulativeOptions.INCLUSIVE)
          .collect()).sort_values('event_id').reset_index(drop=True)

    # exact per-group oracle via pandas on the driver
    import pandas as pd
    ref = table.to_pandas().sort_values(['ts', 'event_id'])
    expect_count = ref.groupby('user').cumcount().to_numpy()
    expect_sum = ref.groupby('user')['value'].cumsum().to_numpy()
    np.testing.assert_array_equal(df['exclusive_cum_count_over_user'].to_numpy(), expect_count)
    np.testing.assert_allclose(df['value_inclusive_cum_sum_over_user'].to_numpy(), expect_sum,
                               rtol=1e-9)


class TestPathologicalEntity:
    """Verdict r2 item 7: one entity larger than a partition must complete
    (warn, not OOM), and the documented cap knob must bound it."""

    def test_oversize_warning_fires(self, caplog):
        import logging

        import numpy as np
        import pyarrow as pa

        from auto_featurs_ray.engine import runtime

        big = pa.table({'k': np.zeros(1000, np.int64), 'v': np.arange(1000)})
        old = runtime.REDUCE_MEMORY_WARN_BYTES
        runtime.REDUCE_MEMORY_WARN_BYTES = 1  # force the threshold
        try:
            with caplog.at_level(logging.WARNING, logger='auto_featurs_ray.engine.runtime'):
                runtime._warn_if_oversized(big, partition_id=3)
        finally:
            runtime.REDUCE_MEMORY_WARN_BYTES = old
        assert any('holds' in r.message and 'reduce task' in r.message for r in caplog.records)

    def test_one_hot_entity_completes_through_asof_windows(self):
        """90% of rows on one entity, pushed through as-of + a window suite:
        the hot entity streams through one reduce task and the job completes
        with correct per-entity outputs."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from auto_featurs_ray.engine.asof import asof_join

        n = 20_000
        rng = np.random.default_rng(7)
        keys = np.where(np.arange(n) % 10 == 0, rng.integers(1, 50, n), 0)  # entity 0 is hot
        ts = np.sort(rng.integers(0, 10_000_000, n)).astype('datetime64[us]')
        left = pa.table({'k': pa.array(keys, pa.int64()), 'ts': pa.array(ts),
                         'x': pa.array(rng.standard_normal(n))})
        rts = np.sort(rng.integers(0, 10_000_000, 500)).astype('datetime64[us]')
        right = pa.table({'k': pa.array(rng.integers(0, 50, 500), pa.int64()),
                          'ts': pa.array(rts),
                          'y': pa.array(rng.standard_normal(500))})
        out = asof_join(rd.from_arrow(left), rd.from_arrow(right), by=['k'], on='ts',
                        num_partitions=4).to_pandas()
        assert len(out) == n
        # spot-check: hot entity's matches equal a pandas merge_asof oracle
        lf = left.to_pandas().sort_values('ts')
        rf = right.to_pandas().sort_values('ts')
        oracle = pd.merge_asof(lf, rf, on='ts', by='k', suffixes=('', '_right'))
        got = out.sort_values(['ts', 'x']).reset_index(drop=True)
        want = oracle.sort_values(['ts', 'x']).reset_index(drop=True)
        pd.testing.assert_series_equal(got['y'], want['y'], check_names=False)

    def test_max_right_rows_per_entity_caps_history(self):
        import numpy as np
        import pyarrow as pa

        from auto_featurs_ray.engine.asof import _cap_entity_history

        t = pa.table({'k': pa.array([0] * 100 + [1] * 3, pa.int64()),
                      'ts': pa.array(list(range(100)) + [0, 1, 2], pa.int64()),
                      'v': pa.array(np.arange(103, dtype=np.float64))})
        capped = _cap_entity_history(t, ['k'], 'ts', 10, partition_id=0).to_pandas()
        assert len(capped) == 13
        # entity 0 keeps its most RECENT 10 rows; entity 1 untouched
        assert capped.loc[capped['k'] == 0, 'ts'].tolist() == list(range(90, 100))
        assert capped.loc[capped['k'] == 1, 'ts'].tolist() == [0, 1, 2]

    def test_asof_with_cap_resolves_old_matches_to_null_or_oldest(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from auto_featurs_ray.engine.asof import asof_join

        left = pa.table({'k': pa.array([0, 0], pa.int64()),
                         'ts': pa.array([5, 500], pa.int64())})
        right = pa.table({'k': pa.array([0] * 100, pa.int64()),
                          'ts': pa.array(np.arange(100), pa.int64()),
                          'y': pa.array(np.arange(100, dtype=np.float64))})
        out = (asof_join(rd.from_arrow(left), rd.from_arrow(right), by=['k'], on='ts',
                         num_partitions=2, max_right_rows_per_entity=10)
               .to_pandas().sort_values('ts'))
        # ts=500 matches the newest kept row (99); ts=5 predates the kept
        # window entirely -> null
        assert np.isnan(out.iloc[0]['y'])
        assert out.iloc[1]['y'] == 99.0
