"""Rolling fast paths for num_unique / mode / entity entropy (verdict item 7).

Each incremental sliding-counter kernel must produce exactly what the generic
per-window-slice fallback produced, and scale ~O(n) rather than O(n*w).
"""

import time

import numpy as np
import pandas as pd
import pyarrow as pa

from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.engine.aggframe import AggFrame
from auto_featurs_ray.transformers.aggregating import (
    EntityEntropyTransformer,
    ModeTransformer,
    NumUniqueTransformer,
)
from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper


def _frame(n=400, seed=9):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, n * 40, size=n)) * 1_000_000
    cats = rng.choice(['a', 'b', 'c', 'd', None], size=n, p=[0.3, 0.3, 0.2, 0.1, 0.1])
    srcs = rng.choice(['s1', 's2'], size=n)
    table = pa.table({
        'ts': pa.array(ts.astype('datetime64[us]')),
        'cat': pa.array(pd.Series(cats)),
        'src': pa.array(srcs),
    })
    return AggFrame(table)


def _brute(frame, lo, hi, fn):
    out = []
    for i in range(frame.num_rows):
        out.append(fn(frame.slice(lo[i], hi[i])))
    return out


def _bounds(frame, period='120s'):
    wrapper = RollingWrapper(NumUniqueTransformer('cat'), CS.datetime(name='ts'), period)
    return wrapper.window_bounds(frame, None)


def test_rolling_num_unique_matches_slice_eval():
    frame = _frame()
    lo, hi = _bounds(frame)
    fast = NumUniqueTransformer('cat').compute_windowed(frame, lo, hi)
    brute = _brute(frame, lo, hi,
                   lambda sub: sub.series('cat').nunique(dropna=False))
    assert list(fast) == brute


def test_rolling_mode_matches_slice_eval():
    frame = _frame()
    lo, hi = _bounds(frame)
    mode = ModeTransformer(CS.nominal(name='cat'))
    fast = mode.compute_windowed(frame, lo, hi).to_pylist()
    brute = [np.asarray(mode.compute(frame.slice(lo[i], hi[i]), None))[-1]
             for i in range(frame.num_rows)]
    brute = [None if v is None else v for v in brute]
    assert fast == brute


def test_rolling_entropy_matches_slice_eval():
    frame = _frame()
    lo, hi = _bounds(frame)
    ent = EntityEntropyTransformer('src', 'cat')
    fast = ent.compute_windowed(frame, lo, hi)
    brute = [np.asarray(ent.compute(frame.slice(lo[i], hi[i]), None))[-1]
             for i in range(frame.num_rows)]
    np.testing.assert_allclose(np.asarray(fast, dtype=float), np.asarray(brute, dtype=float),
                               rtol=1e-12)


def test_rolling_num_unique_is_linear():
    # doubling n with a fixed window should ~double the time, not quadruple it
    def run(n):
        frame = _frame(n=n, seed=2)
        lo, hi = _bounds(frame, period='600s')
        t0 = time.perf_counter()
        NumUniqueTransformer('cat').compute_windowed(frame, lo, hi)
        return time.perf_counter() - t0

    run(2000)  # warm
    t1 = min(run(4000) for _ in range(3))
    t2 = min(run(16000) for _ in range(3))
    assert t2 / t1 < 12  # O(n*w) would be ~16x or worse with the wider data


def _frame_with_value(n=400, seed=11):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, n * 40, size=n)) * 1_000_000
    cats = rng.choice(['a', 'b', 'c', 'd', None], size=n, p=[0.3, 0.3, 0.2, 0.1, 0.1])
    srcs = rng.choice(['s1', 's2', 's3'], size=n)
    value = rng.integers(0, 7, size=n).astype(float)  # plenty of ties for arg tie-break
    value[rng.random(n) < 0.1] = np.nan
    table = pa.table({
        'ts': pa.array(ts.astype('datetime64[us]')),
        'cat': pa.array(pd.Series(cats)),
        'src': pa.array(srcs),
        'value': pa.array(value),
        'arg': pa.array(np.arange(n, dtype=np.int64)),
    })
    return AggFrame(table)


def test_rolling_pmi_matches_slice_eval():
    from auto_featurs_ray.transformers.aggregating import PointwiseMutualInformationTransformer
    frame = _frame_with_value()
    lo, hi = _bounds(frame)
    pmi = PointwiseMutualInformationTransformer('cat', 'src')
    fast = np.asarray(pmi.compute_windowed(frame, lo, hi), dtype=float)
    brute = np.asarray([np.asarray(pmi.compute(frame.slice(lo[i], hi[i]), None))[-1]
                        for i in range(frame.num_rows)], dtype=float)
    # NaN and +-inf edge values must agree exactly too
    assert ((fast == brute) | (np.isnan(fast) & np.isnan(brute))).all()


def test_rolling_argminmax_matches_slice_eval():
    from auto_featurs_ray.base.column_specification import ColumnSpecification as CS2
    from auto_featurs_ray.transformers.aggregating import ArgMaxTransformer, ArgMinTransformer
    frame = _frame_with_value()
    lo, hi = _bounds(frame)
    for cls in (ArgMinTransformer, ArgMaxTransformer):
        tr = cls('value', CS2.numeric(name='arg'))
        fast = tr.compute_windowed(frame, lo, hi).to_pylist()
        brute = [tr.compute(frame.slice(lo[i], hi[i]), None)[-1].as_py()
                 for i in range(frame.num_rows)]
        assert fast == brute, cls.__name__


def test_rolling_bounds_cache_pins_codes_identity():
    """The bounds cache must never serve stale (lo, hi) after a codes array
    is freed and its id() recycled — the cache entry pins the codes array."""
    frame = _frame_with_value()
    wrapper = RollingWrapper(NumUniqueTransformer('cat'), CS.datetime(name='ts'), '120s')
    codes = np.zeros(frame.num_rows, dtype=np.int64)
    wrapper.window_bounds(frame, codes)
    cache = frame.__dict__['_rolling_bounds_cache']
    key = ('ts', wrapper._period_us, id(codes))
    assert key in cache
    pinned, _ = cache[key]
    assert pinned is codes  # strong reference held -> id cannot be recycled


def test_global_rolling_halo_partitioning_matches_single_task():
    """The range-partitioned global rolling stage (halo context rows) must be
    bit-identical to the single-reduce-task evaluation."""
    import pandas as pd
    import ray.data as rd

    from auto_featurs_ray.engine.runtime import (apply_global_rolling_stage,
                                                 apply_window_stage)
    from auto_featurs_ray.transformers.aggregating import (CountTransformer,
                                                           MeanTransformer,
                                                           NumUniqueTransformer)
    from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper

    rng = np.random.default_rng(21)
    n = 5000
    ts = np.sort(rng.integers(0, 10_000_000, n))
    ts[100:110] = ts[100]  # duplicate-timestamp run (anchor-at-last-dup rule)
    table = pa.table({
        'ts': pa.array(np.sort(ts).astype('datetime64[us]')),
        'rid': pa.array(np.arange(n, dtype=np.int64)),
        'cat': pa.array(rng.choice(['a', 'b', 'c'], n)),
        'x': pa.array(rng.standard_normal(n)),
    })
    idx = CS.datetime(name='ts')
    group = [RollingWrapper(CountTransformer(), idx, '600s'),
             RollingWrapper(MeanTransformer('x'), idx, '120s'),
             RollingWrapper(NumUniqueTransformer('cat'), idx, '600s')]

    def make_ds():
        return rd.from_arrow([table.slice(i, 700) for i in range(0, n, 700)])

    def canon(out):
        return out.to_pandas().sort_values('rid').reset_index(drop=True)

    from auto_featurs_ray.engine import runtime as rt
    old_min = rt.GLOBAL_ROLLING_MIN_ROWS
    rt.GLOBAL_ROLLING_MIN_ROWS = 0  # force the halo path at test size
    try:
        partitioned = canon(apply_global_rolling_stage(make_ds(), group, ['ts', 'rid'],
                                                       num_partitions=8))
    finally:
        rt.GLOBAL_ROLLING_MIN_ROWS = old_min
    single = canon(apply_window_stage(make_ds(), group, [], ['ts', 'rid'],
                                      num_partitions=1))
    pd.testing.assert_frame_equal(partitioned, single)
