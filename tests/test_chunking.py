"""Document chunking (datapipe/chunking.py) unit coverage.

SQL-oracle parity at sf0.01 is gated by tools/check_correctness.py
(``chunk_documents``); here we pin boundary semantics against a per-row
scalar reference, including unicode codepoints, overlap, tail dropping,
empty/null docs and lineage columns.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from auto_featurs_ray.datapipe.chunking import chunk_documents


def scalar_chunks(text, chunk, stride, min_tail):
    text = text or ''
    n = len(text)
    n_chunks = max(-(-n // stride), 1)
    if n_chunks > 1 and (n_chunks - 1) * stride + min_tail > n:
        n_chunks -= 1
    out = []
    for ci in range(n_chunks):
        s = ci * stride
        out.append((ci, text[s:s + chunk], s, max(min(n - s, chunk), 0)))
    return out


def run(texts, **kw):
    table = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                      'text': pa.array(texts, pa.string()),
                      'source': pa.array(['s%d' % (i % 2) for i in range(len(texts))])})
    ds = rd.from_arrow([table.slice(0, max(1, len(texts) // 2)),
                        table.slice(max(1, len(texts) // 2))])
    return chunk_documents(ds, **kw).to_pandas().sort_values(
        ['doc_id', 'chunk_index']).reset_index(drop=True)


class TestChunking:
    def test_matches_scalar_reference(self):
        rng = np.random.default_rng(3)
        texts = [''.join(rng.choice(list('abcdef éü😀 '), size=int(m)))
                 for m in rng.integers(0, 400, size=24)] + ['', None]
        got = run(texts, chunk_chars=120, stride=80, min_tail_chars=40)
        for i, t in enumerate(texts):
            rows = got[got['doc_id'] == i]
            expect = scalar_chunks(t, 120, 80, 40)
            assert len(rows) == len(expect), (i, t)
            for (_, row), (ci, txt, s, ln) in zip(rows.iterrows(), expect):
                assert (row['chunk_index'], row['chunk_text'],
                        row['chunk_start'], row['chunk_len']) == (ci, txt, s, ln)

    def test_overlap_windows_cover_text(self):
        text = 'x' * 300
        got = run([text], chunk_chars=120, stride=80, min_tail_chars=1)
        # starts at 0, 80, 160, 240; rebuilding from non-overlap prefixes restores the doc
        assert got['chunk_start'].tolist() == [0, 80, 160, 240]
        rebuilt = ''.join(row['chunk_text'][:80] if i < len(got) - 1 else row['chunk_text']
                          for i, (_, row) in enumerate(got.iterrows()))
        assert rebuilt == text

    def test_tail_rule(self):
        # len 170, stride 80 -> raw starts 0/80/160; tail has 10 chars < 40 -> dropped
        got = run(['y' * 170], chunk_chars=80, stride=80, min_tail_chars=40)
        assert got['chunk_index'].tolist() == [0, 1]
        # but a single-chunk short doc is never dropped
        got1 = run(['z' * 5], chunk_chars=80, stride=80, min_tail_chars=40)
        assert got1['chunk_index'].tolist() == [0] and got1['chunk_text'][0] == 'zzzzz'

    def test_keep_columns_and_empty(self):
        got = run(['', 'ab'], chunk_chars=4, stride=4, keep_columns=('source',))
        assert got['source'].tolist() == ['s0', 's1']
        empty = got[got['doc_id'] == 0]
        assert empty['chunk_text'].tolist() == [''] and empty['chunk_len'].tolist() == [0]

    def test_invalid_params(self):
        import pytest
        ds = rd.from_arrow(pa.table({'doc_id': [1], 'text': ['a']}))
        with pytest.raises(ValueError):
            chunk_documents(ds, chunk_chars=0)
        with pytest.raises(ValueError):
            chunk_documents(ds, stride=-1)
        with pytest.raises(ValueError):
            chunk_documents(ds, min_tail_chars=0)
