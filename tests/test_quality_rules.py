"""Gopher-style quality rules (datapipe/quality_rules.py) unit coverage.

Oracle parity at sf0.01 is gated separately by tools/check_correctness.py
(query ``gopher_rules_documents``); here we pin the per-rule semantics on
hand-built edge cases: empty text, bullet/ellipsis lines, unicode ellipsis,
symbol runs, stop-word trim set, idempotent column replacement, and the
end-to-end filter.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from auto_featurs_ray.datapipe.quality_rules import GopherRules, gopher_filter

GOOD = ('the quick brown fox jumps over the lazy dog and that dog have '
        'run to be with all of them happily ever after in one long row ' * 2)


def edge_table() -> pa.Table:
    texts = [
        GOOD,                                             # 0: passes everything
        '',                                               # 1: empty
        '- one\n- two\n- three\nplain',                   # 2: 75% bullet lines
        'wait...\nmore… \nok',                            # 3: 2/3 ellipsis lines
        '# # # tag',                                      # 4: symbol-heavy
        '12 34 56 78 90',                                 # 5: no alphabetic words
        'The. to, of; with!',                             # 6: stop words behind punct
        None,                                             # 7: null text
    ]
    return pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                     'text': pa.array(texts, pa.string())})


class TestGopherRules:
    def run(self, **kwargs):
        out = GopherRules(**kwargs)(edge_table())
        return {name: out.column(name).to_pylist() for name in out.column_names}

    def test_line_fractions(self):
        got = self.run(min_words=5)
        assert got['bullet_line_frac'][2] == 0.75
        assert abs(got['ellipsis_line_frac'][3] - 2 / 3) < 1e-12
        # single-line docs: denominators stay 1, no division blowup
        assert got['bullet_line_frac'][0] == 0.0 and got['ellipsis_line_frac'][1] == 0.0

    def test_symbol_and_alpha(self):
        got = self.run(min_words=5)
        assert got['symbol_word_ratio'][4] == 3 / 4 and not got['pass_symbol_ratio'][4]
        assert got['alpha_word_frac'][5] == 0.0 and not got['pass_alpha_words'][5]
        assert got['alpha_word_frac'][0] == 1.0

    def test_stop_words_trimmed_and_empty(self):
        got = self.run(min_words=5)
        # 'The.' 'to,' 'of;' 'with!' all count after lower+trim: 4 distinct hits
        assert got['stop_word_hits'][6] == 4 and got['pass_stop_words'][6]
        for idx in (1, 7):  # empty and null text
            assert got['n_words'][idx] == 0
            assert got['mean_word_len'][idx] == 0.0
            assert not got['gopher_pass'][idx]

    def test_pass_flag_conjunction(self):
        got = self.run(min_words=5)
        assert got['gopher_pass'][0]
        flags = ['pass_word_count', 'pass_mean_word_len', 'pass_symbol_ratio',
                 'pass_bullet_lines', 'pass_ellipsis_lines', 'pass_alpha_words',
                 'pass_stop_words']
        for i in range(8):
            assert got['gopher_pass'][i] == all(got[f][i] for f in flags)

    def test_idempotent_column_replacement(self):
        rules = GopherRules(min_words=5)
        once, twice = rules(edge_table()), rules(rules(edge_table()))
        assert once.column_names == twice.column_names  # no duplicate columns
        assert once.column('gopher_pass').to_pylist() == twice.column('gopher_pass').to_pylist()

    def test_filter_stage(self):
        kept = gopher_filter(rd.from_arrow(edge_table()), min_words=5).to_pandas()
        assert kept['doc_id'].tolist() == [0]
        assert list(kept.columns) == ['doc_id', 'text']  # stats not leaked into output

    def test_vectorized_matches_scalar_reference(self):
        """Cross-check the bincount plumbing against a per-row pure-Python rig."""
        got = self.run(min_words=5)
        texts = edge_table().column('text').to_pylist()
        for i, t in enumerate(texts):
            t = t or ''
            words = t.split()
            assert got['n_words'][i] == len(words)
            if words:
                alpha = sum(any(c.isascii() and c.isalpha() for c in w) for w in words)
                assert abs(got['alpha_word_frac'][i] - alpha / len(words)) < 1e-12
            lines = t.split('\n')
            bullets = sum(bool(line.lstrip(' \t').startswith(('-', '*', '•'))) for line in lines)
            assert abs(got['bullet_line_frac'][i] - bullets / len(lines)) < 1e-12

    def test_zero_row_batch(self):
        out = GopherRules()(edge_table().slice(0, 0))
        assert out.num_rows == 0 and 'gopher_pass' in out.column_names
