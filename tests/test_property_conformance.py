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
    values = draw(st.lists(st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
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


@settings(max_examples=20, deadline=None,
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
