"""Skew-immune grouped broadcast aggregates vs the row-shuffle path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from auto_featurs_ray import ColumnRole, Pipeline, Schema
from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations

from tests.fixtures import assert_column


def skewed_table(n=3000, seed=9):
    rng = np.random.default_rng(seed)
    # zipf-hot sources: ~80% of rows in one key
    sources = np.where(rng.random(n) < 0.8, 'hot',
                       rng.choice(['cold1', 'cold2', 'cold3'], n))
    return pa.table({
        'row_id': pa.array(np.arange(n), pa.int64()),
        'source': pa.array(sources, pa.string()),
        'x': pa.array(rng.normal(size=n), pa.float64()),
    })


def build(broadcast: bool):
    schema = Schema([
        CS.numeric(name='row_id', role=ColumnRole.IDENTIFIER),
        CS.nominal(name='source', role=ColumnRole.IDENTIFIER),
        CS.numeric(name='x'),
    ])
    return Dataset.from_arrow(skewed_table(), schema, order_by=['row_id'], num_blocks=5,
                              num_partitions=4,
                              broadcast_agg_keys=['source'] if broadcast else None)


class TestGroupedBroadcast:
    def test_matches_shuffle_path(self):
        def run(ds):
            return (Pipeline(ds)
                    .with_count(over_columns_combinations=[['source']])
                    .with_arithmetic_aggregation('x', aggregations=[ArithmeticAggregations.SUM,
                                                                    ArithmeticAggregations.MEAN,
                                                                    ArithmeticAggregations.MIN,
                                                                    ArithmeticAggregations.MAX,
                                                                    ArithmeticAggregations.STD,
                                                                    ArithmeticAggregations.MEDIAN],
                                                 over_columns_combinations=[['source']])
                    .collect())

        via_broadcast = run(build(broadcast=True))
        via_shuffle = run(build(broadcast=False))
        cols = [c for c in via_broadcast.columns if c.endswith('_over_source') or c == 'count_over_source']
        assert cols, via_broadcast.columns
        for c in cols:
            a = via_broadcast[c].to_numpy(dtype=float)
            b = via_shuffle[c].to_numpy(dtype=float)
            assert np.allclose(a, b, equal_nan=True), c

    def test_mixed_stage_falls_back(self):
        # cumulative agg on the same key cannot broadcast -> whole stage shuffles
        from auto_featurs_ray import CumulativeOptions
        ds = build(broadcast=True)
        df = (Pipeline(ds)
              .with_count(over_columns_combinations=[['source']])
              .with_count(over_columns_combinations=[['source']], cumulative=CumulativeOptions.INCLUSIVE)
              .collect())
        grouped = df.groupby('source')
        assert (grouped['count_over_source'].nunique() == 1).all()
        assert (df.groupby('source')['inclusive_cum_count_over_source'].max()
                == df.groupby('source')['count_over_source'].first()).all()


class TestApproxNumUnique:
    def test_estimate_within_tolerance(self):
        import ray.data as rd
        from auto_featurs_ray.engine.runtime import apply_global_two_pass_stage
        from auto_featurs_ray.transformers.aggregating import ApproxNumUniqueTransformer
        rng = np.random.default_rng(3)
        values = rng.integers(0, 20_000, size=60_000)  # ~19k distinct
        table = pa.table({'v': pa.array(values, pa.int64())})
        t = ApproxNumUniqueTransformer('v', k=1024)
        out = apply_global_two_pass_stage(rd.from_arrow(table), [t]).to_pandas()
        exact = len(np.unique(values))
        estimate = out['v_approx_num_unique'].iloc[0]
        assert abs(estimate - exact) / exact < 0.1, (estimate, exact)

    def test_exact_below_k(self):
        import ray.data as rd
        from auto_featurs_ray.engine.runtime import apply_global_two_pass_stage
        from auto_featurs_ray.transformers.aggregating import ApproxNumUniqueTransformer
        table = pa.table({'v': pa.array(list(range(100)) * 5, pa.int64())})
        t = ApproxNumUniqueTransformer('v', k=1024)
        out = apply_global_two_pass_stage(rd.from_arrow(table), [t]).to_pandas()
        assert out['v_approx_num_unique'].iloc[0] == 100.0
