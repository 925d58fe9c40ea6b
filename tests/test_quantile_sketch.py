"""Bounded-memory global quantile state (round-1 verdict item 4).

The two-pass global quantile must not concatenate every value on the driver:
the mergeable state stays an exact value list below ``EXACT_CAP`` (bit-parity
with np.quantile — the oracle path) and compresses to a fixed-size weighted
CDF summary beyond it.
"""

import numpy as np
import pyarrow as pa

from auto_featurs_ray.transformers.aggregating import MedianTransformer, QuantileTransformer


def _combine_all(t, chunks):
    states = [t.global_partial(pa.table({'x': c})) for c in chunks]
    acc = states[0]
    for s in states[1:]:
        acc = t.global_combine(acc, s)
    return acc


def test_exact_below_cap_is_bit_identical():
    rng = np.random.default_rng(11)
    data = rng.normal(100.0, 17.0, size=20000)
    t = QuantileTransformer('x', 0.75)
    acc = _combine_all(t, np.array_split(data, 7))
    assert acc['exact']
    got = t.global_finalize(acc, pa.table({'x': [0.0]}))[0]
    assert got == np.quantile(data, 0.75)


def test_state_bounded_and_estimate_close_above_cap():
    rng = np.random.default_rng(3)
    data = rng.lognormal(0.0, 2.0, size=200000)
    t = MedianTransformer('x')
    t.EXACT_CAP = 1000  # force the sketch path at test size
    acc = _combine_all(t, np.array_split(data, 40))
    assert not acc['exact']
    bound = max(t.EXACT_CAP, 2 * t.SKETCH_POINTS)
    assert len(acc['v']) <= bound
    est = t.global_finalize(acc, pa.table({'x': [0.0]}))[0]
    true = np.quantile(data, 0.5)
    assert abs(est - true) / true < 0.01


def test_merge_order_independent_enough():
    # pairwise-merge in two different orders: both stay within the error bound
    rng = np.random.default_rng(5)
    data = rng.standard_normal(60000) * 10 + 50
    t = QuantileTransformer('x', 0.9)
    t.EXACT_CAP = 2000
    fwd = _combine_all(t, np.array_split(data, 12))
    rev = _combine_all(t, np.array_split(data, 12)[::-1])
    true = np.quantile(data, 0.9)
    for acc in (fwd, rev):
        est = t.global_finalize(acc, pa.table({'x': [0.0]}))[0]
        assert abs(est - true) / abs(true) < 0.005


def test_compression_warns_once_and_on_recompression(caplog):
    import logging

    import numpy as np
    import pyarrow as pa

    from auto_featurs_ray.transformers.aggregating import QuantileTransformer

    qt = QuantileTransformer('x', 0.5)
    big = pa.table({'x': np.random.default_rng(0).standard_normal(QuantileTransformer.EXACT_CAP + 10)})
    with caplog.at_level(logging.WARNING, logger='auto_featurs_ray.transformers.aggregating'):
        state = qt.global_partial(big)
    assert state['exact'] is False and state['depth'] == 1
    assert any('switching from exact' in r.message for r in caplog.records)

    caplog.clear()
    # force a re-compression: merge enough sketches to exceed EXACT_CAP points
    merged = state
    with caplog.at_level(logging.WARNING, logger='auto_featurs_ray.transformers.aggregating'):
        for _ in range(QuantileTransformer.EXACT_CAP // QuantileTransformer.SKETCH_POINTS + 1):
            merged = qt.global_combine(merged, state)
    assert any('re-compressing an already-approximate state' in r.message for r in caplog.records)
    assert merged['depth'] >= 2
