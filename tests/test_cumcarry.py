"""Parity: range-partitioned ungrouped cumulative stage vs the single task.

The carry-state protocol (engine/cumcarry.py) must reproduce the single-reduce
evaluation of every supported ungrouped order-aware aggregate — exactly for
integer-state aggregates and selections, to float tolerance for the
association-sensitive chains (sum of floats, std quirk, entropy).
Reference semantics:
/root/reference/src/auto_featurs/transformers/aggregating_transformers.py:34-69.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.expressions import col
from auto_featurs_ray.transformers.aggregating import (
    ArgMaxTransformer,
    ArgMinTransformer,
    CountTransformer,
    EntityEntropyTransformer,
    FirstValueTransformer,
    LaggedTransformer,
    MaxTransformer,
    MeanTransformer,
    MedianTransformer,
    MinTransformer,
    ModeTransformer,
    NumUniqueTransformer,
    PointwiseMutualInformationTransformer,
    QuantileTransformer,
    StdTransformer,
    SumTransformer,
    ZscoreTransformer,
)
from auto_featurs_ray.transformers.base import CumulativeOptions as C

COND = col('flag')


def _table(n=6000, seed=33):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 50_000_000, n))
    ts[200:260] = ts[200]  # duplicate-timestamp run straddling cut candidates
    ts = np.sort(ts)
    x = rng.integers(-50, 50, n).astype(np.float64)
    x[rng.random(n) < 0.03] = np.nan
    cat = rng.choice(np.array(['a', 'b', 'c', 'd', 'e', None], dtype=object), n).astype(object)
    return pa.table({
        'ts': pa.array(ts.astype('datetime64[us]')),
        'rid': pa.array(np.arange(n, dtype=np.int64)),
        'x': pa.array(x),
        'cat': pa.array(cat),
        'src': pa.array(rng.choice(['u', 'v', 'w'], n)),
        'tgt': pa.array(rng.choice(['p', 'q'], n)),
        'flag': pa.array(rng.random(n) < 0.6),
    })


def _transformers():
    return [
        CountTransformer(C.INCLUSIVE),
        CountTransformer(C.EXCLUSIVE, COND),
        SumTransformer('x', C.INCLUSIVE),
        SumTransformer('x', C.EXCLUSIVE, COND),
        MinTransformer('x', C.INCLUSIVE),
        MaxTransformer('x', C.EXCLUSIVE),
        MeanTransformer('x', C.INCLUSIVE, COND),
        StdTransformer('x', C.INCLUSIVE),
        StdTransformer('x', C.EXCLUSIVE),
        ZscoreTransformer('x', C.INCLUSIVE),
        NumUniqueTransformer('cat', C.INCLUSIVE),
        NumUniqueTransformer('cat', C.EXCLUSIVE),
        NumUniqueTransformer('cat', C.INCLUSIVE, COND),
        EntityEntropyTransformer('src', 'tgt', C.INCLUSIVE),
        EntityEntropyTransformer('src', 'tgt', C.EXCLUSIVE),
        EntityEntropyTransformer('src', 'tgt', C.NONE),
        PointwiseMutualInformationTransformer('src', 'tgt', C.INCLUSIVE),
        PointwiseMutualInformationTransformer('src', 'tgt', C.EXCLUSIVE, COND),
        PointwiseMutualInformationTransformer('src', 'tgt', C.NONE),
        ArgMinTransformer('x', CS.numeric(name='rid'), C.INCLUSIVE),
        ArgMaxTransformer('x', CS.numeric(name='rid'), C.INCLUSIVE),
        ArgMaxTransformer('x', CS.numeric(name='rid'), C.EXCLUSIVE),
        ArgMaxTransformer('x', CS.numeric(name='rid'), C.NONE),
        LaggedTransformer(CS.numeric(name='x'), 2),
        LaggedTransformer(CS.numeric(name='x'), -3),
        LaggedTransformer(CS.ordinal(name='cat'), 1, fill_value='z'),
        FirstValueTransformer(CS.numeric(name='x'), COND),
        ModeTransformer(CS.ordinal(name='cat')),
        NumUniqueTransformer('cat', C.NONE),
        # cumulative order statistics (round-4 verdict item 2): running mode
        # (two-round counter carry) and running median/quantile (exact
        # sorted-value carry)
        ModeTransformer(CS.ordinal(name='cat'), C.INCLUSIVE),
        ModeTransformer(CS.ordinal(name='cat'), C.EXCLUSIVE, COND),
        MedianTransformer('x', C.INCLUSIVE),
        QuantileTransformer('x', 0.25, C.EXCLUSIVE),
        QuantileTransformer('x', 0.9, C.INCLUSIVE, COND),
    ]


#: integer/selection outputs that must be BIT-identical, not just close
_EXACT_DTYPES = (np.int64, np.int32, object)


def test_global_cumulative_carry_matches_single_task():
    import ray.data as rd

    from auto_featurs_ray.engine import cumcarry
    from auto_featurs_ray.engine.runtime import (apply_global_cumulative_stage,
                                                 apply_window_stage)

    table = _table()
    group = _transformers()
    assert all(cumcarry.handler_for(t) is not None for t in group)

    def make_ds():
        return rd.from_arrow([table.slice(i, 800) for i in range(0, table.num_rows, 800)])

    def canon(out):
        return out.to_pandas().sort_values('rid').reset_index(drop=True)

    partitioned = canon(apply_global_cumulative_stage(
        make_ds(), group, ['ts', 'rid'], num_partitions=7, min_rows=0))
    single = canon(apply_window_stage(make_ds(), group, [], ['ts', 'rid'],
                                      num_partitions=1))
    assert list(partitioned.columns) == list(single.columns)
    pd.testing.assert_frame_equal(partitioned, single, rtol=1e-9, atol=1e-12)
    # integer-state aggregates and selections: bit-identical
    for t in group:
        name = t.output_name
        if single[name].dtype in (np.dtype(np.int64), np.dtype(object)):
            assert partitioned[name].equals(single[name]), name


def test_small_input_falls_back_to_single_task():
    """Below the row threshold the stage must not pay the range exchange."""
    import ray.data as rd

    from auto_featurs_ray.engine.runtime import apply_global_cumulative_stage

    table = _table(n=500)
    group = [CountTransformer(C.INCLUSIVE), SumTransformer('x', C.EXCLUSIVE)]
    out = apply_global_cumulative_stage(
        rd.from_arrow(table), group, ['ts', 'rid'],
        num_partitions=4, min_rows=1_000_000).to_pandas().sort_values('rid')
    expected = np.arange(1, 501, dtype=np.int64)
    np.testing.assert_array_equal(out['inclusive_cum_count'].to_numpy(), expected)


def test_handler_registry_covers_order_statistics():
    from auto_featurs_ray.engine import cumcarry

    assert cumcarry.handler_for(
        ModeTransformer(CS.ordinal(name='cat'), C.INCLUSIVE)) is cumcarry.ModeCumHandler
    for t in (MedianTransformer('x', C.INCLUSIVE),
              QuantileTransformer('x', 0.9, C.EXCLUSIVE)):
        h = cumcarry.handler_for(t)
        assert h is cumcarry.QuantileCumHandler
        assert getattr(h, 'heavy', False)  # the stage size-guards this carry


def test_heavy_carry_falls_back_above_cap(monkeypatch, caplog):
    """Above HEAVY_CARRY_MAX_ROWS cumulative quantile/median must single-task
    with a warning while the light transformers stay on the parallel plan —
    and the combined output must still equal the all-single-task result."""
    import logging

    import ray.data as rd

    from auto_featurs_ray.engine import cumcarry
    from auto_featurs_ray.engine.runtime import (apply_global_cumulative_stage,
                                                 apply_window_stage)

    monkeypatch.setattr(cumcarry, 'HEAVY_CARRY_MAX_ROWS', 1000)
    table = _table(n=3000, seed=5)
    group = [CountTransformer(C.INCLUSIVE), MedianTransformer('x', C.INCLUSIVE),
             QuantileTransformer('x', 0.25, C.EXCLUSIVE)]

    def make_ds():
        return rd.from_arrow([table.slice(i, 700) for i in range(0, table.num_rows, 700)])

    def canon(out):
        return out.to_pandas().sort_values('rid').reset_index(drop=True)

    with caplog.at_level(logging.WARNING, logger='auto_featurs_ray.engine.runtime'):
        got = canon(apply_global_cumulative_stage(make_ds(), group, ['ts', 'rid'],
                                                  num_partitions=5, min_rows=0))
    assert any('order statistics' in r.message for r in caplog.records)
    want = canon(apply_window_stage(make_ds(), group, [], ['ts', 'rid'],
                                    num_partitions=1))
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)],
                                  rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('num_partitions,block,seed', [
    (2, 5000, 1), (3, 173, 2), (13, 997, 3), (31, 64, 4),
])
def test_order_statistics_parity_across_layouts(num_partitions, block, seed):
    """Span-count / block-layout sweep for the new order-statistic carries:
    running mode must be BIT-identical, running quantile/median identical to
    float tolerance (same multiset, same pandas kernel on both paths)."""
    import ray.data as rd

    from auto_featurs_ray.engine.runtime import (apply_global_cumulative_stage,
                                                 apply_window_stage)

    table = _table(n=2500, seed=seed)
    group = [
        ModeTransformer(CS.ordinal(name='cat'), C.INCLUSIVE),
        ModeTransformer(CS.ordinal(name='cat'), C.EXCLUSIVE),
        ModeTransformer(CS.ordinal(name='cat'), C.INCLUSIVE, COND),
        MedianTransformer('x', C.INCLUSIVE),
        MedianTransformer('x', C.EXCLUSIVE),
        QuantileTransformer('x', 0.75, C.INCLUSIVE),
        QuantileTransformer('x', 0.1, C.EXCLUSIVE, COND),
    ]

    def make_ds():
        return rd.from_arrow([table.slice(i, block) for i in range(0, table.num_rows, block)])

    def canon(out):
        return out.to_pandas().sort_values('rid').reset_index(drop=True)

    got = canon(apply_global_cumulative_stage(make_ds(), group, ['ts', 'rid'],
                                              num_partitions=num_partitions, min_rows=0))
    want = canon(apply_window_stage(make_ds(), group, [], ['ts', 'rid'], num_partitions=1))
    pd.testing.assert_frame_equal(got, want, rtol=1e-12, atol=1e-12)
    for t in group[:3]:
        assert got[t.output_name].equals(want[t.output_name]), t.output_name
