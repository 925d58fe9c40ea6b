"""Mixture resampling (datapipe/sampling.py mixture_resample) unit coverage.

SQL-oracle parity at sf0.01 is gated by tools/check_correctness.py
(``mixture_resample_documents``); here we pin the budget math, determinism
across block layouts, no-upsampling invariant, and group dropping.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from auto_featurs_ray.datapipe.sampling import mixture_resample


def corpus(weights_by_group, rows_per_group=200, blocks=4):
    ids, groups, w = [], [], []
    i = 0
    for g, per_row in weights_by_group.items():
        for _ in range(rows_per_group):
            ids.append(i)
            groups.append(g)
            w.append(per_row)
            i += 1
    table = pa.table({'doc_id': pa.array(ids, pa.int64()),
                      'source': pa.array(groups),
                      'n_chars': pa.array(w, pa.int64())})
    step = -(-table.num_rows // blocks)
    return rd.from_arrow([table.slice(k, step) for k in range(0, table.num_rows, step)])


class TestMixtureResample:
    def test_binding_group_kept_whole_and_shares_converge(self):
        # 'rare' is the scarcest relative to its target -> keeps everything
        ds = corpus({'big': 40, 'rare': 10})
        out = mixture_resample(ds, group_column='source', key_column='doc_id',
                               weight_column='n_chars',
                               target_weights={'big': 1.0, 'rare': 1.0}, seed=3).to_pandas()
        by = out.groupby('source')['n_chars'].sum()
        assert by['rare'] == 10 * 200  # binding group: rate 1.0
        # 'big' downsampled toward parity: expected 2000 of 8000, Bernoulli spread
        assert 0.6 * 2000 <= by['big'] <= 1.4 * 2000

    def test_deterministic_across_block_layouts(self):
        table_kwargs = {'big': 40, 'rare': 10, 'mid': 20}
        kept = []
        for blocks in (1, 7):
            out = mixture_resample(corpus(table_kwargs, blocks=blocks),
                                   group_column='source', key_column='doc_id',
                                   weight_column='n_chars',
                                   target_weights={'big': 1, 'rare': 2, 'mid': 1},
                                   seed=5).to_pandas()
            kept.append(sorted(out['doc_id'].tolist()))
        assert kept[0] == kept[1]

    def test_zero_weight_group_dropped(self):
        out = mixture_resample(corpus({'keep': 10, 'drop': 10}),
                               group_column='source', key_column='doc_id',
                               weight_column='n_chars',
                               target_weights={'keep': 1.0, 'drop': 0.0}, seed=1).to_pandas()
        assert set(out['source']) == {'keep'}
        assert len(out) == 200  # 'keep' becomes the binding group: all rows stay

    def test_callable_targets_and_no_eligible(self):
        ds = corpus({'a': 5, 'b': 5})
        out = mixture_resample(ds, group_column='source', key_column='doc_id',
                               weight_column='n_chars',
                               target_weights=lambda g: 0.0, seed=1).to_pandas()
        assert len(out) == 0

    def test_rates_never_exceed_one(self):
        # extreme skew: the tiny group's rate is exactly 1, others < 1
        ds = corpus({'huge': 1000, 'tiny': 1})
        out = mixture_resample(ds, group_column='source', key_column='doc_id',
                               weight_column='n_chars',
                               target_weights={'huge': 1, 'tiny': 1}, seed=2).to_pandas()
        counts = out.groupby('source').size()
        assert counts['tiny'] == 200
        assert counts.get('huge', 0) <= 200
