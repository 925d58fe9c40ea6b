"""North-rule invariants: zero temporal leakage + token byte-equality.

* Shuffling input row order must not change any point-in-time feature (the
  engine owns the canonical (entity, ts) sort).
* Perturbing FUTURE rows must leave past EXCLUSIVE/lag/rolling features
  untouched.
* ``tokens`` arrays must be byte-equal input -> output through the full
  flagship pipeline, and ``n_tok == len(tokens)`` must hold.
"""

import numpy as np
import pyarrow as pa
import pytest

from auto_featurs_ray.fixtures import generate_events_shard, generate_sequence_shard, write_sequence_dataset
from auto_featurs_ray.pipelines.flagship import run_flagship


@pytest.fixture(scope='module')
def f6_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('f6')
    return write_sequence_dataset(str(root), num_shards=2, docs_per_shard=150, seed=42)


FEATURE_COLS = [
    'n_tok_lagged_1_over_doc_id', 'n_tok_exclusive_cum_sum_over_doc_id',
    'n_tok_exclusive_cum_mean_over_doc_id', 'count_in_the_last_1h_over_doc_id',
    'n_tok_median_in_the_last_1h_over_doc_id', 'ts_session_id_gap_30m_over_doc_id',
    'quality_forward_filled_over_doc_id',
]


def _run(seq_dir, ev_dir, num_partitions=4):
    df = run_flagship(seq_dir, ev_dir, num_partitions=num_partitions).collect()
    return df.sort_values(['doc_id', 'ts']).reset_index(drop=True)


class TestTokensInvariants:
    def test_tokens_byte_equal_and_n_tok(self, f6_root):
        import pyarrow.dataset as pads
        out = _run(f'{f6_root}/sequences', f'{f6_root}/events')
        src = (pads.dataset(f'{f6_root}/sequences').to_table().to_pandas()
               .sort_values(['doc_id', 'ts']).reset_index(drop=True))
        assert len(out) == len(src)
        assert (out['n_tok'] == out['tokens'].map(len)).all()
        for a, b in zip(src['tokens'], out['tokens']):
            assert np.asarray(a, dtype=np.int32).tobytes() == np.asarray(b, dtype=np.int32).tobytes()


class TestLeakage:
    def test_row_order_invariance(self, f6_root, tmp_path):
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq
        baseline = _run(f'{f6_root}/sequences', f'{f6_root}/events')

        # shuffle rows across the whole table and re-shard arbitrarily
        table = pads.dataset(f'{f6_root}/sequences').to_table()
        rng = np.random.default_rng(0)
        perm = rng.permutation(table.num_rows)
        shuffled = table.take(pa.array(perm))
        shuffled_dir = tmp_path / 'shuffled_seq'
        shuffled_dir.mkdir()
        half = table.num_rows // 2
        pq.write_table(shuffled.slice(0, half), shuffled_dir / 'a.parquet')
        pq.write_table(shuffled.slice(half), shuffled_dir / 'b.parquet')

        reshuffled = _run(str(shuffled_dir), f'{f6_root}/events')
        for col in FEATURE_COLS:
            a = baseline[col].to_numpy()
            b = reshuffled[col].to_numpy()
            if a.dtype.kind == 'f':
                assert np.allclose(a, b, equal_nan=True), col
            else:
                assert (a == b).all(), col

    def test_future_rows_do_not_affect_past(self, tmp_path):
        import pandas as pd
        import pyarrow.parquet as pq
        seq = generate_sequence_shard(0, docs_per_shard=80, seed=7, pathological_docs=0)
        events = generate_events_shard(0, docs_per_shard=80, seed=7)

        # perturbed copy: for each entity, modify n_tok of its LAST row
        df = seq.to_pandas()
        df = df.sort_values(['doc_id', 'ts']).reset_index(drop=True)
        last_idx = df.groupby('doc_id').tail(1).index
        perturbed = df.copy()
        perturbed.loc[last_idx, 'n_tok'] = perturbed.loc[last_idx, 'n_tok'] + 1000

        base_dir = tmp_path / 'base'
        pert_dir = tmp_path / 'pert'
        ev_dir = tmp_path / 'ev'
        for d in (base_dir, pert_dir, ev_dir):
            d.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), base_dir / 's.parquet')
        pq.write_table(pa.Table.from_pandas(perturbed, preserve_index=False), pert_dir / 's.parquet')
        pq.write_table(events, ev_dir / 'e.parquet')

        out_base = _run(str(base_dir), str(ev_dir))
        out_pert = _run(str(pert_dir), str(ev_dir))
        mask = ~out_base.index.isin(last_idx)  # all non-final rows

        for col in ['n_tok_lagged_1_over_doc_id', 'n_tok_exclusive_cum_sum_over_doc_id',
                    'n_tok_exclusive_cum_mean_over_doc_id']:
            a = out_base.loc[mask, col].to_numpy(dtype=float)
            b = out_pert.loc[mask, col].to_numpy(dtype=float)
            assert np.allclose(a, b, equal_nan=True), f'{col}: future perturbation leaked into the past'


class TestRound4Leakage:
    """Zero-leakage invariants for the round-4 point-in-time modes: the
    EXCLUSIVE target encoding and share at row i must be invariant to any
    perturbation of strictly later rows of the same entity."""

    def test_exclusive_target_encoding_and_share_are_leak_free(self):
        import pandas as pd

        from auto_featurs_ray.base.column_specification import ColumnRole
        from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
        from auto_featurs_ray.base.schema import Schema
        from auto_featurs_ray.dataset.dataset import Dataset
        from auto_featurs_ray.pipeline.pipeline import Pipeline
        from auto_featurs_ray.transformers.base import CumulativeOptions

        rng = np.random.default_rng(13)
        n = 200
        base = pa.table({
            'rid': pa.array(np.arange(n), pa.int64()),
            'ts': pa.array(np.datetime64('2024-01-01', 'us')
                           + np.sort(rng.integers(0, 10**6, n)) * np.timedelta64(1, 's')),
            'g': pa.array(rng.choice(['a', 'b', 'c'], n)),
            # positive values keep exclusive-share denominators away from 0,
            # so the check tests SEMANTIC leakage rather than the (documented)
            # longdouble cancellation residue of the cross-group prefix scan
            'x': pa.array(rng.lognormal(size=n)),
        })
        df = base.to_pandas().sort_values(['ts', 'rid']).reset_index(drop=True)
        last_idx = df.groupby('g').tail(5).index
        pert = df.copy()
        pert.loc[last_idx, 'x'] = pert.loc[last_idx, 'x'] * 7.0 + 3.0

        schema = Schema([
            CS.numeric(name='rid', role=ColumnRole.IDENTIFIER),
            CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
            CS.nominal(name='g', role=ColumnRole.IDENTIFIER),
            CS.numeric(name='x'),
        ])

        def run(frame):
            ds = Dataset.from_arrow(pa.Table.from_pandas(frame, preserve_index=False),
                                    schema, order_by=['ts', 'rid'], num_blocks=3,
                                    num_partitions=4)
            # NOTE: the smoothing prior is a corpus-level mean, which future
            # rows DO move — zero-leakage TE is the unsmoothed EXCLUSIVE form
            p = (Pipeline(ds)
                 .with_target_encoding('x', over_columns_combinations=[['g']],
                                       cumulative=CumulativeOptions.EXCLUSIVE)
                 .with_share('x', over_columns_combinations=[['g']],
                             cumulative=CumulativeOptions.EXCLUSIVE))
            return p.collect().sort_values('rid').reset_index(drop=True)

        a, b = run(df), run(pert)
        mask = ~a['rid'].isin(df.loc[last_idx, 'rid'])
        for colname in ['x_exclusive_cum_target_enc_over_g', 'x_exclusive_cum_share_over_g']:
            av = a.loc[mask, colname].to_numpy(dtype=float)
            bv = b.loc[mask, colname].to_numpy(dtype=float)
            assert np.allclose(av, bv, rtol=1e-9, equal_nan=True), \
                f'{colname}: future perturbation leaked into the past'
