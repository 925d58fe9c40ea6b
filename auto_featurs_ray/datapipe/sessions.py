"""Session-grain aggregation: one output row per (entity, session).

The row-grain sessionizer (``transformers/temporal.py:SessionIdTransformer``)
attaches a session index to every event; this operator changes GRAIN — it
reduces an event log to a session summary table (id, bounds, duration,
event count, value stats) in ONE entity-keyed exchange: sessions are
contiguous runs after the per-partition ``(entity, ts, tiebreak)`` sort, so
every aggregate reduces with ``np.*.reduceat`` over run offsets — no second
shuffle, no Python per session."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def session_summary(ds, *, by: Sequence[str], ts_column: str, gap_s: float,
                    tiebreak_columns: Sequence[str] = (),
                    value_column: Optional[str] = None,
                    num_partitions: int = 64):
    """Reduce an event log to one row per (entity, session).

    A session breaks when the gap to the previous event of the same entity
    exceeds ``gap_s`` seconds (strictly — the same rule as the row-grain
    sessionizer).  Output columns: the ``by`` keys, ``session_id`` (1-based
    per entity), ``n_events``, ``start_ts`` / ``end_ts``, ``duration_s``,
    and (with ``value_column``) ``{value}_sum`` / ``{value}_mean`` over the
    session's valid values.

    Scale shape: one hash exchange on ``by``; each reduce task sorts its
    partition once and reduces all sessions vectorized.  A single entity's
    history lands in one task (the same boundary every sessionizer has) —
    cap upstream if an entity exceeds task memory.
    """
    from auto_featurs_ray.engine.runtime import shuffle_map_partitions

    if gap_s <= 0:
        raise ValueError(f'gap_s must be > 0, got {gap_s}')
    by = list(by)
    gap_us = int(gap_s * 1_000_000)

    def summarize(table: pa.Table, _pid: int) -> pa.Table:
        cols = {k: pa.array([], table.schema.field(k).type) if table.num_columns else pa.array([], pa.int64())
                for k in by} if table.num_rows == 0 else None
        if table.num_rows == 0 or table.num_columns == 0:
            empty = {k: (cols[k] if cols else pa.array([], pa.int64())) for k in by}
            empty.update({'session_id': pa.array([], pa.int64()),
                          'n_events': pa.array([], pa.int64()),
                          'start_ts': pa.array([], pa.timestamp('us')),
                          'end_ts': pa.array([], pa.timestamp('us')),
                          'duration_s': pa.array([], pa.float64())})
            if value_column is not None:
                empty[f'{value_column}_sum'] = pa.array([], pa.float64())
                empty[f'{value_column}_mean'] = pa.array([], pa.float64())
            return pa.table(empty)
        sort_keys = [(k, 'ascending') for k in by] + [(ts_column, 'ascending')] \
            + [(c, 'ascending') for c in tiebreak_columns]
        table = table.take(pc.sort_indices(table, sort_keys=sort_keys))
        n = table.num_rows
        ts_arr = table.column(ts_column)
        if pa.types.is_timestamp(ts_arr.type):
            ts_us = ts_arr.cast(pa.timestamp('us', tz=ts_arr.type.tz)).cast(pa.int64())
        else:
            ts_us = ts_arr.cast(pa.int64())
        ts = ts_us.to_numpy(zero_copy_only=False)

        # entity run boundaries: the engine's shared null-safe run detector
        # (vectorized numpy over Arrow columns — no per-partition pandas
        # factorize/hash round-trip in the reduce)
        from auto_featurs_ray.engine.asof import _null_safe_run_diff
        ent_change = np.concatenate(([True], _null_safe_run_diff(table, by)))
        gap_break = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        new_session = ent_change | gap_break
        starts = np.flatnonzero(new_session)
        lengths = np.diff(np.r_[starts, n])
        # 1-based session index within each entity
        ent_starts = np.flatnonzero(ent_change)
        sess_ordinal = np.arange(len(starts))
        ent_of_session = np.searchsorted(ent_starts, starts, side='right') - 1
        first_sess_of_ent = np.searchsorted(starts, ent_starts)
        session_id = sess_ordinal - first_sess_of_ent[ent_of_session] + 1

        ends = np.r_[starts[1:], n] - 1
        out = {k: table.column(k).take(pa.array(starts)) for k in by}
        out['session_id'] = pa.array(session_id.astype(np.int64))
        out['n_events'] = pa.array(lengths.astype(np.int64))
        out['start_ts'] = pa.array(ts[starts].view('datetime64[us]'))
        out['end_ts'] = pa.array(ts[ends].view('datetime64[us]'))
        out['duration_s'] = pa.array((ts[ends] - ts[starts]) / 1_000_000.0)
        if value_column is not None:
            v = table.column(value_column).cast(pa.float64()).to_numpy(zero_copy_only=False)
            valid = ~np.isnan(v)
            vz = np.where(valid, v, 0.0)
            sums = np.add.reduceat(vz, starts)
            counts = np.add.reduceat(valid.astype(np.float64), starts)
            with np.errstate(divide='ignore', invalid='ignore'):
                means = sums / counts
            out[f'{value_column}_sum'] = pa.array(np.where(counts > 0, sums, np.nan),
                                                 mask=~(counts > 0))
            out[f'{value_column}_mean'] = pa.array(means, mask=~(counts > 0))
        return pa.table(out)

    return shuffle_map_partitions(ds, by, num_partitions, summarize)
