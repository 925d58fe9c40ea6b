"""Carry-state protocol for PARALLEL ungrouped order-aware aggregates.

An ungrouped expanding (cumulative) feature — a global running count/sum/
mean/min/..., reference semantics at
``/root/reference/src/auto_featurs/transformers/aggregating_transformers.py:34-69``
(cum paths) — previously funneled the whole dataset through ONE reduce task
(`engine/runtime.py` routed ``key_columns == ()`` non-rolling groups to a
single partition): a single-core wall at 10^12 rows.  Unlike trailing rolling
windows (window-local, solved with halo context rows), an expanding window at
row *i* reads ALL preceding rows — but for most aggregates the *influence* of
those rows collapses into a tiny combinable state (a count, a sum, an extreme,
a distinct set, a counter).  The parallel plan
(:func:`auto_featurs_ray.engine.runtime.apply_global_cumulative_stage`):

1. range-cut the order column into P sampled-quantile spans (all rows sharing
   an order value land in one span, exactly like the halo rolling stage);
2. pass 1 — per span, sort and emit a per-transformer **span state**
   (``span_state``), the aggregate of the whole span;
3. the driver **folds** the P tiny states per transformer:
   ``scope='prefix'``  -> carry into span p = combine of spans 0..p-1
   ``scope='suffix'``  -> combine of spans p+1.. (leads: carry flows backward)
   ``scope='global'``  -> combine of ALL spans (NONE-mode whole-frame values)
4. transformers flagged ``rounds == 2`` get a second tiny state pass over the
   already-sorted span tables, seeded with the round-0 carry (needed when the
   carry-out itself depends on the carry-in: the std quirk's squared-deviation
   total needs the running mean, an arg-extreme's forward-fill value needs the
   running extreme);
5. pass 2 — per span, ``with_carry`` computes the final output columns seeded
   with the carry-in.

Exactness contract: integer-state aggregates (count, num_unique, PMI counts),
selections (min/max/lag/lead/first-value/arg-extremes) and sums over
exactly-representable values (integers < 2^53) are BIT-IDENTICAL to the
single-task path.  True floating accumulations (sum of non-integral floats,
the std quirk's squared-deviation chain, entropy's c*log2(c) chain) differ
from the sequential single-task result only in float-addition association —
relative error ~1e-16, and the driver oracles round such columns to 6
decimals on both sides already.

Each handler is a namespace of @staticmethods keyed by transformer class in
``handler_for`` — the stage stays generic, the per-aggregate math lives here.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from auto_featurs_ray.engine.aggframe import AggFrame
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
    _NULL_KEY,
)
from auto_featurs_ray.transformers.base import CumulativeOptions

logger = logging.getLogger(__name__)

#: distinct-value count above which a carried exact state (num_unique set,
#: entropy / PMI counters) draws a warning: the state ships to every later
#: span, so it must stay small relative to the data
CARRY_STATE_KEYS_WARN = 1_000_000


def _keys_array(series: pd.Series) -> np.ndarray:
    """Column values as hashable dict keys; nulls collapse to ``_NULL_KEY``
    (NaN != NaN would otherwise split the null group across spans)."""
    vals = series.to_numpy(dtype=object).copy()
    na = series.isna().to_numpy()
    if na.any():
        vals[na] = _NULL_KEY
    return vals


def _base_lookup(keys: np.ndarray, base: dict, default=0) -> np.ndarray:
    """Per-row dict lookup vectorized through factorize: the Python loop runs
    over DISTINCT keys only, never over rows."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    codes, uniques = pd.factorize(keys)
    table = np.array([base.get(u, default) for u in uniques], dtype=np.float64)
    out = table[codes]
    return out


def _span_codes(keys: np.ndarray) -> np.ndarray:
    codes, _ = pd.factorize(keys)
    return codes


class _Handler:
    """Base: single-round, prefix scope."""

    rounds = 1

    @staticmethod
    def scope(t) -> str:
        return 'prefix'

    # rounds == 2 hooks (overridden where needed)
    @staticmethod
    def identity2(t):
        return None

    @staticmethod
    def combine2(t, earlier, later):
        raise NotImplementedError

    @staticmethod
    def span_state2(t, frame: AggFrame, carry0):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# simple additive / extremal carries
# ---------------------------------------------------------------------------

class CountHandler(_Handler):
    @staticmethod
    def identity(t):
        return 0

    @staticmethod
    def span_state(t, frame: AggFrame):
        cond = frame.cond_mask(t.filtering_condition)
        return frame.num_rows if cond is None else int(cond.sum())

    @staticmethod
    def combine(t, earlier, later):
        return earlier + later

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        local = np.asarray(t.compute(frame, None))
        return local + np.int64(carry)


class SumHandler(_Handler):
    @staticmethod
    def identity(t):
        return 0.0

    @staticmethod
    def _contrib(t, frame: AggFrame) -> pd.Series:
        cond = frame.cond_mask(t.filtering_condition)
        x = frame.numeric(t._column)
        return pd.Series(np.where(cond, x, 0.0)) if cond is not None else pd.Series(x)

    @staticmethod
    def span_state(t, frame: AggFrame):
        cum = SumHandler._contrib(t, frame).cumsum()
        valid = cum.dropna()
        return float(valid.iloc[-1]) if len(valid) else 0.0

    @staticmethod
    def combine(t, earlier, later):
        return earlier + later

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        cum = SumHandler._contrib(t, frame).cumsum()
        if t.cumulative == CumulativeOptions.EXCLUSIVE:
            cum = cum.shift(1, fill_value=0.0)
        return cum + carry


class _ExtremeHandler(_Handler):
    @staticmethod
    def identity(t):
        return np.nan

    @staticmethod
    def span_state(t, frame: AggFrame):
        return t.global_partial(frame.table)

    @staticmethod
    def combine(t, earlier, later):
        return t.global_combine(earlier, later)

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        local = np.asarray(t.compute(frame, None), dtype=np.float64)
        # fmin/fmax pick the non-NaN side: rows before the first local value
        # (exclusive row 0, leading masked rows) inherit the carried extreme
        return np.fmin(local, carry) if t._is_min else np.fmax(local, carry)


class MeanHandler(_Handler):
    @staticmethod
    def identity(t):
        return (0.0, 0)

    @staticmethod
    def span_state(t, frame: AggFrame):
        return (SumHandler.span_state(t._sum, frame), CountHandler.span_state(t._count, frame))

    @staticmethod
    def combine(t, earlier, later):
        return (earlier[0] + later[0], earlier[1] + later[1])

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        sums = np.asarray(SumHandler.with_carry(t._sum, frame, carry[0]), dtype=np.float64)
        counts = np.asarray(CountHandler.with_carry(t._count, frame, carry[1]), dtype=np.float64)
        with np.errstate(divide='ignore', invalid='ignore'):
            return sums / counts


# ---------------------------------------------------------------------------
# num_unique (cumulative): ordered first-occurrence dict
# ---------------------------------------------------------------------------

class NumUniqueCumHandler(_Handler):
    """State = {value: cond-at-its-GLOBAL-first-occurrence} + the global first
    row's flag (for the exclusive double-dedup offset, ref :173-175)."""

    @staticmethod
    def identity(t):
        return ({}, None, 0)

    @staticmethod
    def span_state(t, frame: AggFrame):
        n = frame.num_rows
        if n == 0:
            return ({}, None, 0)
        series = frame.series(t._column)
        keys = _keys_array(series)
        cond = frame.cond_mask(t.filtering_condition)
        first = ~pd.Series(keys).duplicated().to_numpy()
        flags = first if cond is None else (first & cond)
        d = {}
        for i in np.flatnonzero(first):
            d[keys[i]] = bool(flags[i])
        first_flag = bool(cond[0]) if cond is not None else True
        return (d, first_flag, n)

    @staticmethod
    def combine(t, earlier, later):
        d_a, ff_a, n_a = earlier
        d_b, ff_b, n_b = later
        merged = dict(d_a)
        for k, v in d_b.items():
            if k not in merged:
                merged[k] = v
        if len(merged) > CARRY_STATE_KEYS_WARN:
            logger.warning('carried num_unique state holds %d distinct values; '
                           'consider ApproxNumUnique at this cardinality', len(merged))
        return (merged, ff_a if n_a else ff_b, n_a + n_b)

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        seen, first_flag_prior, n_prior = carry
        n = frame.num_rows
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        series = frame.series(t._column)
        keys = _keys_array(series)
        cond = frame.cond_mask(t.filtering_condition)
        first = ~pd.Series(keys).duplicated().to_numpy()
        flags = first.copy()
        for i in np.flatnonzero(first):
            if keys[i] in seen:
                flags[i] = False
        if cond is not None:
            flags &= cond
        c0 = sum(1 for v in seen.values() if v)
        incl = np.cumsum(flags.astype(np.int64)) + c0
        if t.cumulative == CumulativeOptions.INCLUSIVE:
            return incl
        # exclusive double-dedup: out_i = (distinct inclusive values through
        # i-1) = incl_{i-1} + adj, adj = 1 iff the GLOBAL first row's flag was
        # 0 (the running-count sequence then contains the value 0)
        global_flag0 = first_flag_prior if n_prior else bool(flags[0]) if cond is None else bool(cond[0])
        adj = 0 if global_flag0 else 1
        out = np.empty(n, dtype=np.int64)
        out[0] = (c0 + adj) if n_prior else 0
        out[1:] = incl[:-1] + adj
        return out


# ---------------------------------------------------------------------------
# lag / lead: boundary-row carries
# ---------------------------------------------------------------------------

class LaggedHandler(_Handler):
    @staticmethod
    def scope(t) -> str:
        return 'prefix' if t._lag >= 0 else 'suffix'

    @staticmethod
    def identity(t):
        return None  # None == "no boundary rows yet"; plain shift applies

    @staticmethod
    def span_state(t, frame: AggFrame):
        k = abs(t._lag)
        series = frame.series(t._column.name)
        if k == 0 or frame.num_rows == 0:
            return series.iloc[:0]
        # lags need the last k rows of what precedes; leads the first k of
        # what follows
        return (series.iloc[-k:] if t._lag > 0 else series.iloc[:k]).reset_index(drop=True)

    @staticmethod
    def combine(t, earlier, later):
        # state of the concatenation of two blocks, in time order
        if earlier is None:
            return later
        if later is None:
            return earlier
        k = abs(t._lag)
        cat = pd.concat([earlier, later], ignore_index=True)
        return cat.iloc[-k:].reset_index(drop=True) if t._lag > 0 else cat.iloc[:k].reset_index(drop=True)

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        series = frame.series(t._column.name)
        k = t._lag
        if carry is None or len(carry) == 0 or k == 0:
            if t._fill_value is None:
                return series.shift(k)
            return series.shift(k, fill_value=t._fill_value)
        if k > 0:
            ext = pd.concat([carry, series], ignore_index=True)
            shifted = ext.shift(k) if t._fill_value is None else ext.shift(k, fill_value=t._fill_value)
            return shifted.iloc[len(carry):].reset_index(drop=True)
        ext = pd.concat([series, carry], ignore_index=True)
        shifted = ext.shift(k) if t._fill_value is None else ext.shift(k, fill_value=t._fill_value)
        return shifted.iloc[:len(series)].reset_index(drop=True)


class FirstValueHandler(_Handler):
    """NONE-mode whole-group broadcast: the group-wide first matching value
    reaches EVERY row (also rows before it), so the scope is global."""

    @staticmethod
    def scope(t) -> str:
        return 'global'

    @staticmethod
    def identity(t):
        return (False, None)

    @staticmethod
    def span_state(t, frame: AggFrame):
        n = frame.num_rows
        if n == 0:
            return (False, None)
        cond = frame.cond_mask(t.filtering_condition)
        if cond is None:
            pos = 0
        else:
            hits = np.flatnonzero(cond)
            if len(hits) == 0:
                return (False, None)
            pos = int(hits[0])
        value = frame.series(t._column.name).to_numpy(dtype=object)[pos]
        na = frame.series(t._column.name).isna().to_numpy()[pos]
        return (True, None if na else value)

    @staticmethod
    def combine(t, earlier, later):
        return earlier if earlier[0] else later

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        has, value = carry
        n = frame.num_rows
        out = np.empty(n, dtype=object)
        out[:] = value if has else None
        return pa.Array.from_pandas(pd.Series(out), type=frame.table.column(t._column.name).type)


# ---------------------------------------------------------------------------
# NONE-mode whole-frame selections (reached when a group bypasses the
# broadcast two-pass path, or for aggregates without that protocol)
# ---------------------------------------------------------------------------

class TwoPassAdapter(_Handler):
    """Any transformer with the global two-pass protocol doubles as a
    global-scope carry handler: state = partial, carry = combined, output =
    finalize."""

    @staticmethod
    def scope(t) -> str:
        return 'global'

    @staticmethod
    def identity(t):
        return None

    @staticmethod
    def span_state(t, frame: AggFrame):
        return t.global_partial(frame.table)

    @staticmethod
    def combine(t, earlier, later):
        if earlier is None:
            return later
        if later is None:
            return earlier
        return t.global_combine(earlier, later)

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        return t.global_finalize(carry, frame.table)


class NumUniqueNoneHandler(_Handler):
    @staticmethod
    def scope(t) -> str:
        return 'global'

    @staticmethod
    def identity(t):
        return frozenset()

    @staticmethod
    def span_state(t, frame: AggFrame):
        if frame.num_rows == 0:
            return frozenset()
        keys = _keys_array(frame.series(t._column))
        cond = frame.cond_mask(t.filtering_condition)
        if cond is not None:
            keys = keys[cond]
        return frozenset(pd.unique(keys))

    @staticmethod
    def combine(t, earlier, later):
        merged = earlier | later
        if len(merged) > CARRY_STATE_KEYS_WARN:
            logger.warning('global num_unique state holds %d distinct values; '
                           'consider ApproxNumUnique at this cardinality', len(merged))
        return merged

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        return np.full(frame.num_rows, len(carry), dtype=np.int64)


class ModeNoneHandler(_Handler):
    """Whole-frame mode; ties -> null first, then largest value (ref :136)."""

    @staticmethod
    def scope(t) -> str:
        return 'global'

    @staticmethod
    def identity(t):
        return {}

    @staticmethod
    def span_state(t, frame: AggFrame):
        if frame.num_rows == 0:
            return {}
        keys = _keys_array(frame.series(t._column.name))
        cond = frame.cond_mask(t.filtering_condition)
        if cond is not None:
            keys = keys[cond]
        codes, uniques = pd.factorize(keys)
        counts = np.bincount(codes[codes >= 0], minlength=len(uniques))
        return {u: int(c) for u, c in zip(uniques, counts)}

    @staticmethod
    def combine(t, earlier, later):
        merged = dict(earlier)
        for k, v in later.items():
            merged[k] = merged.get(k, 0) + v
        return merged

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        n = frame.num_rows
        winner = None
        if carry:
            top = max(carry.values())
            tied = [k for k, c in carry.items() if c == top]
            if any(k is _NULL_KEY for k in tied):
                winner = None
            else:
                winner = max(tied)
        out = np.empty(n, dtype=object)
        out[:] = winner
        return pa.Array.from_pandas(pd.Series(out), type=frame.table.column(t._column.name).type)


class ArgExtremeNoneHandler(_Handler):
    """NONE rule: arg at the FIRST (masked) row attaining the whole-frame
    extreme (ref :452,488) — earliest span wins ties."""

    @staticmethod
    def scope(t) -> str:
        return 'global'

    @staticmethod
    def identity(t):
        return (False, np.nan, None)

    @staticmethod
    def span_state(t, frame: AggFrame):
        n = frame.num_rows
        if n == 0:
            return (False, np.nan, None)
        value = frame.numeric(t._value_column)
        cond = frame.cond_mask(t.filtering_condition)
        masked = np.where(cond, value, np.nan) if cond is not None else value
        if np.all(np.isnan(masked)):
            return (False, np.nan, None)
        m = np.nanmin(masked) if t._is_min else np.nanmax(masked)
        pos = int(np.flatnonzero(masked == m)[0])
        arg_series = frame.series(t._arg_column.name)
        arg = arg_series.to_numpy(dtype=object)[pos]
        return (True, float(m), None if arg_series.isna().to_numpy()[pos] else arg)

    @staticmethod
    def combine(t, earlier, later):
        if not later[0]:
            return earlier
        if not earlier[0]:
            return later
        better = later[1] < earlier[1] if t._is_min else later[1] > earlier[1]
        return later if better else earlier  # ties -> the earlier (first) hit

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        has, _m, arg = carry
        n = frame.num_rows
        out = np.empty(n, dtype=object)
        out[:] = arg if has else None
        return pa.Array.from_pandas(pd.Series(out), type=frame.table.column(t._arg_column.name).type)


# ---------------------------------------------------------------------------
# cumulative arg-extremes: two rounds (forward-fill value needs the prefix
# extreme before it is itself combinable)
# ---------------------------------------------------------------------------

class ArgExtremeCumHandler(_Handler):
    rounds = 2

    @staticmethod
    def identity(t):
        return np.nan  # round 0 carries the prefix masked extreme

    @staticmethod
    def span_state(t, frame: AggFrame):
        return t._extreme.global_partial(frame.table)

    @staticmethod
    def combine(t, earlier, later):
        return t._extreme.global_combine(earlier, later)

    @staticmethod
    def _local_running(t, frame: AggFrame) -> np.ndarray:
        value = frame.numeric(t._value_column)
        cond = frame.cond_mask(t.filtering_condition)
        masked = np.where(cond, value, np.nan) if cond is not None else value
        run = pd.Series(masked)
        run = run.cummin() if t._is_min else run.cummax()
        return run.ffill().to_numpy()

    @staticmethod
    def identity2(t):
        return (False, None)

    @staticmethod
    def span_state2(t, frame: AggFrame, carry0):
        """(has, ffill value at span end) given the carry-in extreme: the arg
        at the span's LAST hit row with a non-null arg (hit = raw value equals
        the running extreme, matching the kernel at aggregating.py:1213)."""
        n = frame.num_rows
        if n == 0:
            return (False, None)
        run = ArgExtremeCumHandler._local_running(t, frame)
        ext = np.fmin(run, carry0) if t._is_min else np.fmax(run, carry0)
        value = frame.numeric(t._value_column)
        hit = value == ext
        sel = frame.series(t._arg_column.name).where(pd.Series(hit))
        idx = sel.last_valid_index()
        if idx is None:
            return (False, None)
        return (True, sel.loc[idx])

    @staticmethod
    def combine2(t, earlier, later):
        return later if later[0] else earlier

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        carry0, carry2 = carry
        _has_v, v_in = carry2 if carry2 is not None else (False, None)
        n = frame.num_rows
        arg_type = frame.table.column(t._arg_column.name).type
        if n == 0:
            return pa.Array.from_pandas(pd.Series([], dtype=object), type=arg_type)
        run = ArgExtremeCumHandler._local_running(t, frame)
        ext = np.fmin(run, carry0) if t._is_min else np.fmax(run, carry0)
        value = frame.numeric(t._value_column)
        hit = value == ext
        out = frame.series(t._arg_column.name).where(pd.Series(hit)).ffill()
        if v_in is not None:
            out = out.fillna(v_in)  # only LEADING NaNs survive the ffill
        if t.cumulative == CumulativeOptions.EXCLUSIVE:
            # exclusive == inclusive shifted one row (hit/extreme both shift)
            out = out.shift(1)
            if v_in is not None:
                out.iloc[0] = v_in
        return pa.Array.from_pandas(out, type=arg_type)


# ---------------------------------------------------------------------------
# std quirk / z-score: two rounds (the squared-deviation chain needs the
# running mean, i.e. the (sum, count) prefix)
# ---------------------------------------------------------------------------

class StdHandler(_Handler):
    rounds = 2

    @staticmethod
    def identity(t):
        return (0.0, 0)

    @staticmethod
    def span_state(t, frame: AggFrame):
        return MeanHandler.span_state(t._mean, frame)

    @staticmethod
    def combine(t, earlier, later):
        return (earlier[0] + later[0], earlier[1] + later[1])

    @staticmethod
    def _squared_cum(t, frame: AggFrame, carry_sn) -> pd.Series:
        mean_arr = np.asarray(MeanHandler.with_carry(t._mean, frame, carry_sn), dtype=np.float64)
        x = t._masked(frame)
        squared = (x - mean_arr) ** 2
        squared = np.where(np.isnan(squared), 0.0, squared)  # fill_nan(0.0), ref :392
        return pd.Series(squared).cumsum()

    @staticmethod
    def identity2(t):
        return 0.0

    @staticmethod
    def span_state2(t, frame: AggFrame, carry0):
        if frame.num_rows == 0:
            return 0.0
        return float(StdHandler._squared_cum(t, frame, carry0).iloc[-1])

    @staticmethod
    def combine2(t, earlier, later):
        return earlier + later

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        carry_sn, q_prev = carry
        q_prev = q_prev or 0.0
        cum = StdHandler._squared_cum(t, frame, carry_sn)
        if t.cumulative == CumulativeOptions.EXCLUSIVE:
            cum = cum.shift(1, fill_value=0.0)
        return np.sqrt(cum.to_numpy() + q_prev)


class ZscoreHandler(_Handler):
    rounds = 2

    @staticmethod
    def identity(t):
        return (0.0, 0)

    @staticmethod
    def span_state(t, frame: AggFrame):
        return MeanHandler.span_state(t._mean, frame)

    @staticmethod
    def combine(t, earlier, later):
        return (earlier[0] + later[0], earlier[1] + later[1])

    identity2 = StdHandler.identity2
    combine2 = StdHandler.combine2

    @staticmethod
    def span_state2(t, frame: AggFrame, carry0):
        return StdHandler.span_state2(t._std, frame, carry0)

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        carry_sn, q_prev = carry
        x = frame.numeric(t._column)
        mean_arr = np.asarray(MeanHandler.with_carry(t._mean, frame, carry_sn), dtype=np.float64)
        std_arr = np.asarray(StdHandler.with_carry(t._std, frame, (carry_sn, q_prev)), dtype=np.float64)
        with np.errstate(divide='ignore', invalid='ignore'):
            return (x - mean_arr) / std_arr


# ---------------------------------------------------------------------------
# entity entropy / PMI: counter-dict carries
# ---------------------------------------------------------------------------

def _counter_state_warn(n_keys: int, what: str) -> None:
    if n_keys > CARRY_STATE_KEYS_WARN:
        logger.warning('carried %s state holds %d distinct keys; the exact '
                       'counter must stay small relative to the data', what, n_keys)


class EntropyHandler(_Handler):
    """State: {source: ({target: count}, total)}.  The running c*log2(c) sum
    is recomputed from counts at span boundaries (telescoping sum), so the
    carried value differs from the sequential chain only in float-addition
    association."""

    @staticmethod
    def scope(t) -> str:
        return 'global' if t.cumulative == CumulativeOptions.NONE else 'prefix'

    @staticmethod
    def identity(t):
        return {}

    @staticmethod
    def span_state(t, frame: AggFrame):
        if frame.num_rows == 0:
            return {}
        src = _keys_array(frame.series(t._source))
        tgt = t._target_values(frame)
        state: dict = {}
        pairs = pd.DataFrame({'s': src, 'v': tgt})
        grouped = pairs.groupby(['s', 'v'], sort=False, dropna=False).size()
        for (s, v), c in grouped.items():
            counter, total = state.setdefault(s, ({}, 0))
            counter[v] = counter.get(v, 0) + int(c)
            state[s] = (counter, total + int(c))
        return state

    @staticmethod
    def combine(t, earlier, later):
        merged = {s: (dict(c), tot) for s, (c, tot) in earlier.items()}
        for s, (c, tot) in later.items():
            counter, total = merged.setdefault(s, ({}, 0))
            for v, k in c.items():
                counter[v] = counter.get(v, 0) + k
            merged[s] = (counter, total + tot)
        _counter_state_warn(sum(len(c) for c, _ in merged.values()), 'entropy')
        return merged

    @staticmethod
    def _clogc(counter: dict) -> float:
        arr = np.array(list(counter.values()), dtype=np.float64)
        arr = arr[arr > 1]
        return float(np.sum(arr * np.log2(arr))) if len(arr) else 0.0

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        n = frame.num_rows
        if n == 0:
            return np.zeros(0, dtype=np.float64)
        src = _keys_array(frame.series(t._source))
        tgt = t._target_values(frame)
        if t.cumulative == CumulativeOptions.NONE:
            # whole-frame entropy per source from the combined counters
            codes, uniques = pd.factorize(src)
            table = np.empty(len(uniques), dtype=np.float64)
            for i, s in enumerate(uniques):
                counter, total = carry.get(s, ({}, 0))
                cnts = np.array(list(counter.values()), dtype=np.float64)
                p = cnts / total
                table[i] = float(np.sum(-p * np.log2(p))) if total else np.nan
            return table[codes]
        # running entropy with carried counters, mirroring the vectorized
        # kernel (aggregating.py:522-538): per-row delta of sum(c*log2 c)
        s_codes = _span_codes(src)
        pair_keys = np.empty(n, dtype=object)
        pair_codes_s, s_uniq = pd.factorize(src)
        pair_codes_v, v_uniq = pd.factorize(pd.Series(tgt))
        combined = pair_codes_s.astype(np.int64) * max(len(v_uniq), 1) + pair_codes_v
        base_pair = np.zeros(n, dtype=np.float64)
        base_src_total = np.zeros(n, dtype=np.float64)
        base_src_clogc = np.zeros(n, dtype=np.float64)
        uniq_pairs, inv = np.unique(combined, return_inverse=True)
        pair_base_table = np.empty(len(uniq_pairs), dtype=np.float64)
        for j, pc_key in enumerate(uniq_pairs):
            s = s_uniq[pc_key // max(len(v_uniq), 1)]
            v = v_uniq[pc_key % max(len(v_uniq), 1)]
            counter, _total = carry.get(s, ({}, 0))
            pair_base_table[j] = counter.get(v, 0)
        base_pair = pair_base_table[inv]
        src_tot_table = np.empty(len(s_uniq), dtype=np.float64)
        src_clogc_table = np.empty(len(s_uniq), dtype=np.float64)
        src_seen = np.zeros(len(s_uniq), dtype=bool)
        for j, s in enumerate(s_uniq):
            counter, total = carry.get(s, ({}, 0))
            src_tot_table[j] = total
            src_clogc_table[j] = EntropyHandler._clogc(counter)
            src_seen[j] = s in carry
        base_src_total = src_tot_table[pair_codes_s]
        base_src_clogc = src_clogc_table[pair_codes_s]

        c_local = pd.Series(np.ones(n)).groupby(combined).cumcount().to_numpy()
        c = base_pair + c_local + 1
        with np.errstate(divide='ignore', invalid='ignore'):
            delta = c * np.log2(c) - np.where(c > 1, (c - 1) * np.log2(np.maximum(c - 1, 1)), 0.0)
        sum_clogc = pd.Series(delta).groupby(s_codes).cumsum().to_numpy() + base_src_clogc
        total = base_src_total + pd.Series(np.ones(n)).groupby(s_codes).cumcount().to_numpy() + 1
        with np.errstate(divide='ignore', invalid='ignore'):
            out = np.where(total > 1, np.log2(total) - sum_clogc / total, 0.0)
        result = pd.Series(out)
        if t.cumulative == CumulativeOptions.EXCLUSIVE:
            result = result.groupby(s_codes).shift(1)
            # the first in-span occurrence of a source seen in prior spans
            # takes that source's last carried entropy value
            firsts = ~pd.Series(s_codes).duplicated().to_numpy()
            fill_mask = firsts & src_seen[pair_codes_s]
            if fill_mask.any():
                tot = src_tot_table[pair_codes_s]
                clg = src_clogc_table[pair_codes_s]
                with np.errstate(divide='ignore', invalid='ignore'):
                    prev_vals = np.where(tot > 1, np.log2(tot) - clg / tot, 0.0)
                arr = result.to_numpy(copy=True)
                arr[fill_mask] = prev_vals[fill_mask]
                result = pd.Series(arr)
        return result


class PmiHandler(_Handler):
    """State: (counts_a, counts_b, counts_ab, total) — all ints, so the
    carried path is bit-identical to the single-task kernel."""

    @staticmethod
    def scope(t) -> str:
        return 'global' if t.cumulative == CumulativeOptions.NONE else 'prefix'

    @staticmethod
    def identity(t):
        return ({}, {}, {}, 0)

    @staticmethod
    def span_state(t, frame: AggFrame):
        if frame.num_rows == 0:
            return ({}, {}, {}, 0)
        a = _keys_array(frame.series(t._column_a))
        b = _keys_array(frame.series(t._column_b))
        cond = frame.cond_mask(t.filtering_condition)
        if cond is not None:
            a, b = a[cond], b[cond]
        ca: dict = {}
        cb: dict = {}
        cab: dict = {}
        df = pd.DataFrame({'a': a, 'b': b})
        for (ka, kb), c in df.groupby(['a', 'b'], sort=False, dropna=False).size().items():
            ca[ka] = ca.get(ka, 0) + int(c)
            cb[kb] = cb.get(kb, 0) + int(c)
            cab[(ka, kb)] = cab.get((ka, kb), 0) + int(c)
        return (ca, cb, cab, len(a))

    @staticmethod
    def combine(t, earlier, later):
        out = []
        for d_a, d_b in zip(earlier[:3], later[:3]):
            merged = dict(d_a)
            for k, v in d_b.items():
                merged[k] = merged.get(k, 0) + v
            out.append(merged)
        _counter_state_warn(len(out[2]), 'PMI')
        return (*out, earlier[3] + later[3])

    @staticmethod
    def _carried_stream(codes: Optional[np.ndarray], cond: Optional[np.ndarray],
                        base: np.ndarray, cumulative: CumulativeOptions, n: int) -> np.ndarray:
        """(Cumulative) count per sub-group + per-row carried base — the
        with-carry analog of aggregating._count_array, integer-exact."""
        if codes is None:
            codes = np.zeros(n, dtype=np.int64)
        if cond is None:
            local = pd.Series(np.ones(n)).groupby(codes).cumcount().to_numpy()
            if cumulative == CumulativeOptions.INCLUSIVE or cumulative == CumulativeOptions.NONE:
                local = local + 1
        else:
            cum = pd.Series(cond.astype(np.int64)).groupby(codes).cumsum()
            if cumulative == CumulativeOptions.EXCLUSIVE:
                cum = cum.groupby(codes).shift(1, fill_value=0)
            local = cum.to_numpy()
        return local.astype(np.float64) + base

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        n = frame.num_rows
        if n == 0:
            return np.zeros(0, dtype=np.float64)
        base_a, base_b, base_ab, base_total = carry
        a = _keys_array(frame.series(t._column_a))
        b = _keys_array(frame.series(t._column_b))
        cond = frame.cond_mask(t.filtering_condition)
        a_codes, a_uniq = pd.factorize(a)
        b_codes, b_uniq = pd.factorize(b)
        ab_codes = a_codes.astype(np.int64) * max(len(b_uniq), 1) + b_codes
        ba = np.array([base_a.get(u, 0) for u in a_uniq], dtype=np.float64)[a_codes]
        bb = np.array([base_b.get(u, 0) for u in b_uniq], dtype=np.float64)[b_codes]
        uniq_ab, inv = np.unique(ab_codes, return_inverse=True)
        bab_table = np.array(
            [base_ab.get((a_uniq[u // max(len(b_uniq), 1)], b_uniq[u % max(len(b_uniq), 1)]), 0)
             for u in uniq_ab], dtype=np.float64)
        bab = bab_table[inv]
        if t.cumulative == CumulativeOptions.NONE:
            # whole-frame counts: totals looked up straight from the dicts
            total = np.full(n, float(base_total))
            c_a, c_b, c_ab = ba, bb, bab
        else:
            mode = t.cumulative
            total = PmiHandler._carried_stream(None, cond, np.float64(base_total), mode, n)
            c_a = PmiHandler._carried_stream(a_codes, cond, ba, mode, n)
            c_b = PmiHandler._carried_stream(b_codes, cond, bb, mode, n)
            c_ab = PmiHandler._carried_stream(ab_codes, cond, bab, mode, n)
        with np.errstate(divide='ignore', invalid='ignore'):
            p_a = c_a / total
            p_b = c_b / total
            p_ab = c_ab / total
            return np.log2(p_ab / (p_a * p_b))


# ---------------------------------------------------------------------------
# cumulative order statistics: running mode (two rounds, counter carry) and
# running quantile/median (exact sorted-value carry, size-guarded)
# ---------------------------------------------------------------------------

#: row count above which UNGROUPED cumulative quantile/median falls back to a
#: single reduce task with a warning: an EXACT running quantile at row i is a
#: function of ALL i preceding values, so the carried state is O(rows) — the
#: parallel plan ships every span the full prefix value array and folds O(N)
#: floats on the driver, which stops being a win (or feasible) beyond this.
#: Group the feature (over columns) or use an approximate sketch at scale.
HEAVY_CARRY_MAX_ROWS = 16_000_000


class ModeCumHandler(_Handler):
    """Running mode, ties -> latest value to reach the max count (reference
    ``aggregating_transformers.py:117-149``, cum branch — the same rule the
    single-task kernel at ``aggregating.py:380-408`` implements).

    Round 0 carries the per-value COUNTED-occurrence counter (additive, like
    the NONE-mode handler).  The span's exit (max_count, mode) depends on its
    entry counts, so round 2 recomputes, per span and seeded with the true
    prefix counter, the span's FINAL RECORD: the last row whose running count
    equals the span's own running prefix-max.  Because record counts are
    non-decreasing in time, a span updates the global mode iff its final
    record count >= the entry max — so one ``(count, value, have)`` triple is
    a complete, combinable summary (``combine2`` keeps the later span iff its
    record count >= the earlier's)."""

    rounds = 2

    @staticmethod
    def identity(t):
        return {}

    span_state = ModeNoneHandler.span_state
    combine = ModeNoneHandler.combine

    @staticmethod
    def _currents(t, frame: AggFrame, base: dict):
        """Per-row running count of the row's own key (counted occurrences
        only, seeded with the carried counter) plus the aligned object-value
        array (nulls -> None)."""
        n = frame.num_rows
        series = frame.series(t._column.name)
        keys = _keys_array(series)
        cond = frame.cond_mask(t.filtering_condition)
        codes, uniques = pd.factorize(keys)
        seed = np.array([base.get(u, 0) for u in uniques], dtype=np.int64)
        inc = (cond.astype(np.int64) if cond is not None
               else np.ones(n, dtype=np.int64))
        local = pd.Series(inc).groupby(codes).cumsum().to_numpy()
        values = series.to_numpy(dtype=object).copy()
        na = series.isna().to_numpy()
        if na.any():
            values[na] = None
        return seed[codes] + local, values

    @staticmethod
    def identity2(t):
        return (0, None, False)

    @staticmethod
    def span_state2(t, frame: AggFrame, carry0):
        if frame.num_rows == 0:
            return (0, None, False)
        cur, values = ModeCumHandler._currents(t, frame, carry0)
        pm = np.maximum.accumulate(cur)
        last = int(np.flatnonzero(cur == pm)[-1])
        return (int(pm[-1]), values[last], True)

    @staticmethod
    def combine2(t, earlier, later):
        if not later[2]:
            return earlier
        if not earlier[2]:
            return later
        return later if later[0] >= earlier[0] else earlier

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        carry0, carry2 = carry
        m_in, mode_in, have_in = carry2 if carry2 is not None else (0, None, False)
        n = frame.num_rows
        out_type = frame.table.column(t._column.name).type
        if n == 0:
            return pa.Array.from_pandas(pd.Series([], dtype=object), type=out_type)
        cur, values = ModeCumHandler._currents(t, frame, carry0)
        pm = np.maximum.accumulate(cur)
        # mode updates at row i iff cur_i >= max(m_in, prefix max before i)
        before = np.empty(n, dtype=np.int64)
        before[0] = m_in
        np.maximum(pm[:-1], m_in, out=before[1:])
        update = cur >= before
        idx = np.where(update, np.arange(n), -1)
        last = np.maximum.accumulate(idx)
        out = np.empty(n, dtype=object)
        fallback = mode_in if have_in else None
        hit = last >= 0
        out[hit] = values[last[hit]]
        out[~hit] = fallback
        result = pd.Series(out, dtype=object)
        if t.cumulative == CumulativeOptions.EXCLUSIVE:
            result = result.shift(1)
            result.iloc[0] = fallback
        return pa.Array.from_pandas(result, type=out_type)


class QuantileCumHandler(_Handler):
    """Running quantile/median with linear interpolation (reference
    ``aggregating_transformers.py:339-363``), EXACT: the carried state is the
    sorted array of all prior valid values (the quantile at row i is a
    function of the full prefix multiset — no smaller exact state exists).
    Each span prepends the carry to its own values and runs pandas' C
    expanding-quantile kernel, so the result is bit-identical to the
    single-task path (same multiset, same kernel, same interpolation).

    O(rows) carry: the stage enforces :data:`HEAVY_CARRY_MAX_ROWS` and falls
    back to the single-task plan with a warning beyond it."""

    heavy = True

    @staticmethod
    def identity(t):
        return np.empty(0, dtype=np.float64)

    @staticmethod
    def span_state(t, frame: AggFrame):
        x = np.asarray(t._masked(frame), dtype=np.float64)
        return np.sort(x[~np.isnan(x)])

    @staticmethod
    def combine(t, earlier, later):
        if len(earlier) == 0:
            return later
        if len(later) == 0:
            return earlier
        return np.sort(np.concatenate([earlier, later]), kind='stable')

    @staticmethod
    def with_carry(t, frame: AggFrame, carry):
        x = np.asarray(t._masked(frame), dtype=np.float64)
        s = pd.Series(np.concatenate([carry, x]))
        exp = s.expanding(min_periods=1).quantile(t._quantile, interpolation='linear')
        out = exp.iloc[len(carry):].reset_index(drop=True)
        if t.cumulative == CumulativeOptions.EXCLUSIVE:
            out = out.shift(1)
            if len(out):
                out.iloc[0] = (float(np.quantile(carry, t._quantile))
                               if len(carry) else np.nan)
        return out


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_CUM_HANDLERS = {
    CountTransformer: CountHandler,
    SumTransformer: SumHandler,
    MinTransformer: _ExtremeHandler,
    MaxTransformer: _ExtremeHandler,
    MeanTransformer: MeanHandler,
    StdTransformer: StdHandler,
    ZscoreTransformer: ZscoreHandler,
    NumUniqueTransformer: NumUniqueCumHandler,
    EntityEntropyTransformer: EntropyHandler,
    PointwiseMutualInformationTransformer: PmiHandler,
    ArgMinTransformer: ArgExtremeCumHandler,
    ArgMaxTransformer: ArgExtremeCumHandler,
    ModeTransformer: ModeCumHandler,
    QuantileTransformer: QuantileCumHandler,
    MedianTransformer: QuantileCumHandler,
}

_NONE_HANDLERS = {
    LaggedTransformer: LaggedHandler,
    FirstValueTransformer: FirstValueHandler,
    NumUniqueTransformer: NumUniqueNoneHandler,
    ModeTransformer: ModeNoneHandler,
    ArgMinTransformer: ArgExtremeNoneHandler,
    ArgMaxTransformer: ArgExtremeNoneHandler,
    EntityEntropyTransformer: EntropyHandler,
    PointwiseMutualInformationTransformer: PmiHandler,
}


def handler_for(transformer):
    """The carry handler for an UNGROUPED transformer instance, or ``None``
    when only the single-task path preserves its semantics.  Cumulative
    order statistics are covered too: running mode carries an exact counter
    (two rounds), running quantile/median an exact sorted-value array —
    O(rows), so the stage size-guards it (:data:`HEAVY_CARRY_MAX_ROWS`)."""
    cls = type(transformer)
    mode = getattr(transformer, 'cumulative', CumulativeOptions.NONE)
    if mode != CumulativeOptions.NONE:
        return _CUM_HANDLERS.get(cls)
    if cls in _NONE_HANDLERS:
        return _NONE_HANDLERS[cls]
    if getattr(transformer, 'supports_global_two_pass', False):
        return TwoPassAdapter
    return None
