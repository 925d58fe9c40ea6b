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
