"""Interpolated bigram LM scoring (corpus_bigram_logprob) unit coverage.

SQL-oracle parity at sf0.01 is gated by tools/check_correctness.py
(``bigram_logprob_documents``); here we pin the model math against a scalar
reference and prove the broadcast and cogroup scale paths agree bit-for-bit.
"""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from auto_featurs_ray.datapipe.textstats import corpus_bigram_logprob

LAM = 0.75


def tokenize(text):
    import re
    return re.findall(r'[a-z0-9]+', (text or '').lower())


def scalar_scores(texts):
    docs = [tokenize(t) for t in texts]
    uni = Counter(w for d in docs for w in d)
    total = float(sum(uni.values()))
    big = Counter((d[i - 1], d[i]) for d in docs for i in range(1, len(d)))
    ctx = Counter()
    for (v, _), c in big.items():
        ctx[v] += c
    out = {}
    for i, d in enumerate(docs):
        if not d:
            out[i] = (0, None)
            continue
        lps = [math.log2(uni[d[0]] / total)]
        for j in range(1, len(d)):
            p_bg = big[(d[j - 1], d[j])] / ctx[d[j - 1]]
            lps.append(math.log2(LAM * p_bg + (1 - LAM) * (uni[d[j]] / total)))
        out[i] = (len(d), sum(lps) / len(lps))
    return out


def run(texts, **kwargs):
    table = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                      'text': pa.array(texts, pa.string())})
    ds = rd.from_arrow([table.slice(0, max(1, len(texts) // 2)),
                        table.slice(max(1, len(texts) // 2))])
    df = corpus_bigram_logprob(ds, text_column='text', id_column='doc_id',
                               lam=LAM, num_partitions=4, **kwargs).to_pandas()
    return df.sort_values('doc_id').reset_index(drop=True)


TEXTS = ['the cat sat on the mat and the cat ran',
         'the dog sat on the mat',
         'cat and dog and cat',
         'zebra',
         '',
         None,
         'punct-split: the cat! THE CAT?']


class TestBigramLogprob:
    def test_matches_scalar_reference(self):
        got = run(TEXTS)
        expect = scalar_scores(TEXTS)
        for i in range(len(TEXTS)):
            row = got[got['doc_id'] == i].iloc[0]
            n, lp = expect[i]
            assert row['n_words'] == n
            if lp is None:
                assert np.isnan(row['bigram_logprob']) or row['bigram_logprob'] is None
            else:
                assert abs(row['bigram_logprob'] - lp) < 1e-9, (i, row['bigram_logprob'], lp)

    def test_broadcast_and_cogroup_paths_agree(self):
        a = run(TEXTS)  # default threshold: broadcast
        b = run(TEXTS, broadcast_threshold=0)  # force the cogroup chain
        assert a['n_words'].tolist() == b['n_words'].tolist()
        av = a['bigram_logprob'].to_numpy(dtype=float)
        bv = b['bigram_logprob'].to_numpy(dtype=float)
        both_nan = np.isnan(av) & np.isnan(bv)
        # summation order differs (per-partition partials vs document order),
        # so agreement is to addition-reordering ulps, not bit-identity; the
        # SQL hash gate rounds to 6 digits for the same reason
        assert (both_nan | (np.abs(av - bv) < 1e-12)).all()

    def test_repeated_bigram_scores_higher(self):
        got = run(TEXTS)
        # 'the cat' is the dominant bigram: doc 0 (habitual) beats doc 3 (oov-ish single word corpus share)
        assert got.loc[0, 'bigram_logprob'] > got.loc[3, 'bigram_logprob']
