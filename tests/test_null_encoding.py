"""Null-encoding regression tests (round-1 verdict item 1).

Kernels use NaN as the in-flight missing marker; the engine's OUTPUT encoding
must be Arrow null (DuckDB / reference NULL parity).  The round-1
``session_events`` oracle failure was exactly this drift: a float ndarray NaN
surviving ``_to_arrow_column`` as a NaN value instead of a null.  These tests
assert at the Arrow level (``null_count``), not through pandas (where both
encodings collapse to NaN).
"""

from datetime import datetime

import numpy as np
import pyarrow as pa
import ray

from auto_featurs_ray.base.column_specification import ColumnRole
from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.base.schema import Schema
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.engine.runtime import _to_arrow_column
from auto_featurs_ray.pipeline.pipeline import Pipeline
from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations
from auto_featurs_ray.transformers.base import CumulativeOptions


def _arrow(ds) -> pa.Table:
    return pa.concat_tables(ray.get(ds.to_arrow_refs()), promote_options='permissive')


def test_to_arrow_column_maps_float_nan_to_null():
    arr = _to_arrow_column(np.array([1.0, np.nan, 3.0]))
    assert arr.null_count == 1
    assert arr.to_pylist() == [1.0, None, 3.0]


def test_window_outputs_encode_missing_as_null():
    table = pa.table({
        'user': ['u1'] * 3 + ['u2'],
        'ts': pa.array([datetime(2020, 1, 1, h) for h in (0, 1, 2)]
                       + [datetime(2020, 1, 1, 5)], pa.timestamp('us')),
        'x': [1.0, 2.0, 3.0, 4.0],
    })
    schema = Schema([CS.nominal(name='user', role=ColumnRole.IDENTIFIER),
                     CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
                     CS.numeric(name='x')])
    ds = Dataset.from_arrow(table, schema, order_by=['ts'], num_blocks=2, num_partitions=2)
    out = _arrow((Pipeline(ds)
                  .with_time_since_last('ts', over_columns_combinations=[['user']])
                  .with_arithmetic_aggregation('x', aggregations=[ArithmeticAggregations.MEAN,
                                                                  ArithmeticAggregations.STD],
                                               over_columns_combinations=[['user']],
                                               cumulative=CumulativeOptions.EXCLUSIVE)
                  .collect_plan().data))
    # first row of each group: no previous timestamp -> null (not NaN)
    col = out.column('ts_seconds_since_last_over_user')
    assert col.null_count == 2
    assert not any(v is not None and np.isnan(v) for v in col.to_pylist())
    # exclusive cumulative mean over an empty prefix: 0/0 -> null
    mean_col = out.column('x_exclusive_cum_mean_over_user')
    assert mean_col.null_count == 2
