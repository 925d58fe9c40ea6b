"""Conformance for the Arrow/numpy as-of matcher (round-4 verdict item 5 —
the pandas ``merge_asof`` frames were dropped from the co-group reduce).

``_asof_match`` must reproduce ``pd.merge_asof`` exactly across direction,
exact-match allowance, duplicate timestamps, null keys and multi-column keys;
the ``asof_join`` tolerance path must reproduce merge_asof's tolerance.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from auto_featurs_ray.engine.asof import _asof_match


def _sides(seed, nl=400, nr=300, with_nulls=True, two_keys=False):
    rng = np.random.default_rng(seed)
    keys = ['g', 'h'] if two_keys else ['g']
    cols_l = {'g': rng.choice(['a', 'b', 'c', None] if with_nulls else ['a', 'b', 'c'], nl)}
    cols_r = {'g': rng.choice(['a', 'b', 'c', None] if with_nulls else ['a', 'b', 'c'], nr)}
    if two_keys:
        cols_l['h'] = rng.integers(0, 3, nl)
        cols_r['h'] = rng.integers(0, 3, nr)
    # coarse grid forces duplicate timestamps on both sides
    lts = rng.integers(0, 60, nl).astype(np.int64)
    rts = rng.integers(0, 60, nr).astype(np.int64)
    lt = pa.table({**{k: pa.array(pd.Series(v)) for k, v in cols_l.items()}})
    rt = pa.table({**{k: pa.array(pd.Series(v)) for k, v in cols_r.items()}})
    return keys, lt, lts, rt, rts


def _expected(keys, lt, lts, rt, rts, direction, allow_exact):
    lf = pd.DataFrame({k: lt.column(k).to_pandas() for k in keys})
    lf['__ts'] = lts
    lf['__lidx'] = np.arange(len(lts))
    rf = pd.DataFrame({k: rt.column(k).to_pandas() for k in keys})
    rf['__ts'] = rts
    rf['__ridx'] = np.arange(len(rts))
    lf = lf.sort_values('__ts', kind='stable')
    rf = rf.sort_values('__ts', kind='stable')
    merged = pd.merge_asof(lf, rf, on='__ts', by=keys, direction=direction,
                           allow_exact_matches=allow_exact)
    out = merged.sort_values('__lidx')['__ridx']
    return out.fillna(-1).to_numpy(dtype=np.int64)


@pytest.mark.parametrize('direction', ['backward', 'forward'])
@pytest.mark.parametrize('allow_exact', [True, False])
@pytest.mark.parametrize('seed,two_keys', [(1, False), (2, False), (3, True), (4, True)])
def test_matcher_equals_merge_asof(direction, allow_exact, seed, two_keys):
    keys, lt, lts, rt, rts = _sides(seed, two_keys=two_keys)
    got = _asof_match(lt.select(keys), lts, rt.select(keys), rts,
                      direction, allow_exact=allow_exact)
    want = _expected(keys, lt, lts, rt, rts, direction, allow_exact)
    np.testing.assert_array_equal(got, want)


def test_null_keys_match_null_keys():
    # engine-wide key convention (and merge_asof's object-dtype behavior):
    # null == null, null != anything else
    lt = pa.table({'g': pa.array([None, 'a'], pa.string())})
    rt = pa.table({'g': pa.array([None, 'a', None], pa.string())})
    got = _asof_match(lt, np.array([10, 10], np.int64), rt,
                      np.array([5, 5, 7], np.int64), 'backward')
    assert got.tolist() == [2, 1]


def test_equal_ts_picks_positionally_last_right():
    # three right rows share (key, ts): merge_asof semantics keep the last one
    lt = pa.table({'g': ['a']})
    rt = pa.table({'g': ['a', 'a', 'a']})
    got = _asof_match(lt, np.array([10], np.int64), rt,
                      np.array([10, 10, 10], np.int64), 'backward')
    assert got.tolist() == [2]
    got_f = _asof_match(lt, np.array([10], np.int64), rt,
                        np.array([10, 10, 10], np.int64), 'forward')
    # forward at equal ts: earliest right at-or-after; pandas keeps the LAST
    # positional among equal ts too (its scan overwrites)
    want = _expected(['g'], lt, np.array([10], np.int64), rt,
                     np.array([10, 10, 10], np.int64), 'forward', True)
    np.testing.assert_array_equal(got_f, want)


def test_asof_join_tolerance(ray_session):
    import ray.data as rd

    from auto_featurs_ray.engine.asof import asof_join

    rng = np.random.default_rng(11)
    nl, nr = 500, 400
    lts = np.sort(rng.integers(0, 10**9, nl)).astype('datetime64[us]')
    rts = np.sort(rng.integers(0, 10**9, nr)).astype('datetime64[us]')
    left = pa.table({'g': pa.array(rng.choice(['a', 'b'], nl)),
                     'ts': pa.array(lts),
                     'lid': pa.array(np.arange(nl, dtype=np.int64))})
    right = pa.table({'g': pa.array(rng.choice(['a', 'b'], nr)),
                      'ts': pa.array(rts),
                      'val': pa.array(rng.standard_normal(nr))})
    tol = 50_000_000  # 50 seconds in us
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right), by=['g'], on='ts',
                    direction='backward', tolerance_us=tol,
                    num_partitions=2).to_pandas().sort_values('lid')
    lf = pd.DataFrame({'g': left.column('g').to_pandas(),
                       '__ts': left.column('ts').to_pandas(),
                       'lid': np.arange(nl)}).sort_values('__ts', kind='stable')
    rf = pd.DataFrame({'g': right.column('g').to_pandas(),
                       '__ts': right.column('ts').to_pandas(),
                       'val': right.column('val').to_pandas()}).sort_values('__ts', kind='stable')
    want = pd.merge_asof(lf, rf, on='__ts', by='g', direction='backward',
                         tolerance=pd.Timedelta(microseconds=tol)).sort_values('lid')
    np.testing.assert_allclose(out['val'].to_numpy(dtype=np.float64),
                               want['val'].to_numpy(dtype=np.float64), equal_nan=True)


# --- property-based conformance: random sides, tie-heavy timestamps, null
# keys, both directions and exactness modes — the invariant is exact
# equality with pd.merge_asof on every draw -------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def asof_sides(draw):
    nl = draw(st.integers(1, 60))
    nr = draw(st.integers(1, 60))
    keyspace = ['a', 'b', None]
    lkeys = draw(st.lists(st.sampled_from(keyspace), min_size=nl, max_size=nl))
    rkeys = draw(st.lists(st.sampled_from(keyspace), min_size=nr, max_size=nr))
    # coarse grid forces heavy ts ties on and across sides
    lts = draw(st.lists(st.integers(0, 12), min_size=nl, max_size=nl))
    rts = draw(st.lists(st.integers(0, 12), min_size=nr, max_size=nr))
    direction = draw(st.sampled_from(['backward', 'forward']))
    allow_exact = draw(st.booleans())
    return lkeys, lts, rkeys, rts, direction, allow_exact


@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(asof_sides())
def test_matcher_property_conformance(case):
    lkeys, lts, rkeys, rts, direction, allow_exact = case
    lt = pa.table({'g': pa.array(pd.Series(lkeys, dtype=object))})
    rt = pa.table({'g': pa.array(pd.Series(rkeys, dtype=object))})
    lts_a = np.asarray(lts, dtype=np.int64)
    rts_a = np.asarray(rts, dtype=np.int64)
    got = _asof_match(lt, lts_a, rt, rts_a, direction, allow_exact=allow_exact)
    want = _expected(['g'], lt, lts_a, rt, rts_a, direction, allow_exact)
    np.testing.assert_array_equal(got, want)
