"""Randomized conformance against a polars oracle.

polars 1.42 is installed in this environment, so combinations the reference's
golden tests don't enumerate (cumulative x filtered x grouped grids, rolling
with filters) are checked by evaluating the reference's polars expressions
(transcribed from ``aggregating_transformers.py``) on seeded random frames
and comparing to this engine's kernels.
"""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pl = pytest.importorskip('polars')

from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.engine.aggframe import AggFrame
from auto_featurs_ray.engine.runtime import sort_partition
from auto_featurs_ray.expressions import col
from auto_featurs_ray.transformers.aggregating import (
    CountTransformer,
    FirstValueTransformer,
    LaggedTransformer,
    MaxTransformer,
    MeanTransformer,
    MedianTransformer,
    MinTransformer,
    NumUniqueTransformer,
    StdTransformer,
    SumTransformer,
    ZscoreTransformer,
)
from auto_featurs_ray.transformers.base import CumulativeOptions as C
from auto_featurs_ray.transformers.over_wrapper import OverWrapper
from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper


def make_frame(seed: int, n: int = 200):
    rng = np.random.default_rng(seed)
    base = datetime(2021, 1, 1)
    ts = [base + timedelta(minutes=int(m)) for m in np.sort(rng.integers(0, 5000, n))]
    return pd.DataFrame({
        'g': rng.choice(['a', 'b', 'c', 'd'], n),
        'x': rng.normal(size=n).round(3),
        'flag': rng.random(n) > 0.4,
        'ts': ts,
    })


def engine_compute(transformer, df: pd.DataFrame) -> np.ndarray:
    table = pa.Table.from_pandas(df, preserve_index=False)
    table = table.cast(pa.schema([
        pa.field('g', pa.string()), pa.field('x', pa.float64()),
        pa.field('flag', pa.bool_()), pa.field('ts', pa.timestamp('us')),
    ]))
    result = transformer.compute(AggFrame(table), None)
    return np.asarray(result, dtype=np.float64)


def close(a, b, atol=1e-9):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    both_nan = np.isnan(a) & np.isnan(b)
    both_inf = np.isinf(a) & np.isinf(b) & (np.sign(a) == np.sign(b))
    ok = both_nan | both_inf | (np.abs(a - b) <= atol)
    assert ok.all(), f'mismatch at rows {np.flatnonzero(~ok)[:5]}: {a[~ok][:5]} vs {b[~ok][:5]}'


FLAG = col('flag')


# (engine transformer, polars expression) pairs; the polars side is transcribed
# verbatim from the reference's _transform implementations.
def reference_pairs():
    f = pl.col('flag')
    x = pl.col('x')
    pairs = [
        (CountTransformer(C.EXCLUSIVE, FLAG), f.cum_sum().shift(1, fill_value=0).over('g')),
        (CountTransformer(C.INCLUSIVE, FLAG), f.cum_sum().over('g')),
        (SumTransformer('x', C.INCLUSIVE), x.cum_sum().over('g')),
        (SumTransformer('x', C.EXCLUSIVE), x.cum_sum().shift(1, fill_value=0.0).over('g')),
        (MinTransformer('x', C.EXCLUSIVE, FLAG),
         pl.when(f).then(x).cum_min().shift(1, fill_value=np.nan).forward_fill().over('g')),
        (MaxTransformer('x', C.INCLUSIVE, FLAG),
         pl.when(f).then(x).cum_max().forward_fill().over('g')),
        (MedianTransformer('x', C.INCLUSIVE),
         x.cast(pl.Float64).cumulative_eval(pl.element().quantile(0.5, interpolation='linear')).over('g')),
        (MedianTransformer('x', C.EXCLUSIVE),
         x.cast(pl.Float64).cumulative_eval(pl.element().quantile(0.5, interpolation='linear')).shift(1).over('g')),
        (MeanTransformer('x', C.INCLUSIVE),
         (x.cum_sum() / pl.int_range(1, pl.len() + 1)).over('g')),
        (StdTransformer('x', C.INCLUSIVE),
         (x - (x.cum_sum() / pl.int_range(1, pl.len() + 1))).pow(2).fill_nan(0.0).cum_sum().sqrt().over('g')),
        (NumUniqueTransformer('g', C.INCLUSIVE, FLAG),
         (pl.col('g').is_first_distinct() & f).cum_sum().over('g')),
        (LaggedTransformer(CS.numeric(name='x'), 3), x.shift(3).over('g')),
        (FirstValueTransformer(CS.numeric(name='x'), FLAG), x.filter(f).first().over('g')),
    ]
    return [(OverWrapper(t, ['g']), expr) for t, expr in pairs]


@pytest.mark.parametrize('seed', [1, 2, 3])
def test_grouped_cumulative_vs_polars(seed):
    df = make_frame(seed)
    # canonical engine order: sorted by (g, ts); polars trusts frame order
    df = df.sort_values(['g', 'ts'], kind='stable').reset_index(drop=True)
    pldf = pl.DataFrame(df)
    for transformer, expr in reference_pairs():
        expected = pldf.select(expr.alias('out'))['out'].cast(pl.Float64, strict=False).to_numpy()
        got = engine_compute(transformer, df)
        close(got, expected)


@pytest.mark.parametrize('seed', [5, 6])
def test_rolling_vs_polars(seed):
    df = make_frame(seed).sort_values(['g', 'ts'], kind='stable').reset_index(drop=True)
    pldf = pl.DataFrame(df)
    ts_spec = CS.datetime(name='ts')
    cases = [
        (OverWrapper(RollingWrapper(SumTransformer('x'), ts_spec, '3h'), ['g']),
         pl.col('x').sum().last().rolling(index_column='ts', period='3h').over('g')),
        (OverWrapper(RollingWrapper(CountTransformer(filtering_condition=FLAG), ts_spec, '3h'), ['g']),
         pl.col('flag').sum().last().rolling(index_column='ts', period='3h').over('g')),
        (OverWrapper(RollingWrapper(MinTransformer('x'), ts_spec, '3h'), ['g']),
         pl.col('x').min().last().rolling(index_column='ts', period='3h').over('g')),
        (OverWrapper(RollingWrapper(MeanTransformer('x'), ts_spec, '12h'), ['g']),
         (pl.col('x').sum() / pl.len()).last().rolling(index_column='ts', period='12h').over('g')),
        (OverWrapper(RollingWrapper(StdTransformer('x'), ts_spec, '12h'), ['g']),
         pl.col('x').std().last().rolling(index_column='ts', period='12h').over('g')),
        (OverWrapper(RollingWrapper(MedianTransformer('x'), ts_spec, '12h'), ['g']),
         pl.col('x').cast(pl.Float64).quantile(0.5, interpolation='linear').last()
           .rolling(index_column='ts', period='12h').over('g')),
    ]
    for transformer, expr in cases:
        expected = pldf.select(expr.alias('out'))['out'].cast(pl.Float64, strict=False).to_numpy()
        got = engine_compute(transformer, df)
        close(got, expected, atol=1e-9)
