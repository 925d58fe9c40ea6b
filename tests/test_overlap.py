"""Substring-overlap detection (datapipe/overlap.py) unit coverage.

SQL-oracle parity at sf0.01 is gated by tools/check_correctness.py
(``substring_overlap_documents``); here we pin the guarantee and the
pair/count plumbing on constructed corpora.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from auto_featurs_ray.datapipe.overlap import (_intra_run_pairs, substring_overlap_clusters,
                                               substring_overlap_pairs)
from auto_featurs_ray.datapipe.textstats import winnowing_fingerprints_batch


def corpus(texts) -> rd.Dataset:
    table = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                      'text': pa.array(texts, pa.string())})
    # two blocks so the exchange actually moves rows between tasks
    mid = max(1, len(texts) // 2)
    return rd.from_arrow([table.slice(0, mid), table.slice(mid)])


SHARED = 'an exceptionally specific boilerplate sentence that recurs verbatim everywhere'


class TestIntraRunPairs:
    def test_matches_triu_bruteforce(self):
        rng = np.random.default_rng(5)
        sizes = rng.integers(2, 9, size=20)
        a_idx, b_idx = _intra_run_pairs(sizes)
        start = 0
        expect = []
        for s in sizes:
            ii, jj = np.triu_indices(int(s), 1)
            expect.extend(zip((start + ii).tolist(), (start + jj).tolist()))
            start += int(s)
        assert sorted(zip(a_idx.tolist(), b_idx.tolist())) == sorted(expect)
        assert (a_idx < b_idx).all()


class TestSubstringOverlap:
    def test_winnowing_guarantee_detects_shared_span(self):
        filler = ['totally unrelated padding text %d with nothing in common here' % i
                  for i in range(4)]
        texts = [f'left context {SHARED} right tail one',
                 f'different opening {SHARED} and another ending'] + filler
        pairs = substring_overlap_pairs(corpus(texts), k=16, window=8, min_shared=1,
                                        num_partitions=4).to_pandas()
        got = set(zip(pairs['doc_a'], pairs['doc_b']))
        assert (0, 1) in got  # the >= k+window-1 shared span must be found
        assert all(a < b for a, b in got)

    def test_shared_count_matches_sketch_intersection(self):
        texts = [f'alpha {SHARED} omega', f'beta {SHARED} gamma',
                 'no overlap with anything else at all in this one really']
        pairs = substring_overlap_pairs(corpus(texts), k=16, window=8, min_shared=1,
                                        num_partitions=4).to_pandas()
        sketches = winnowing_fingerprints_batch(
            [' '.join(t.split()).lower() for t in texts], k=16, window=8)
        s0, s1 = (set(sketches[i].as_py()) for i in (0, 1))
        row = pairs[(pairs['doc_a'] == 0) & (pairs['doc_b'] == 1)]
        assert int(row['shared_fingerprints'].iloc[0]) == len(s0 & s1)

    def test_min_shared_filters(self):
        texts = [f'alpha {SHARED} omega', f'beta {SHARED} gamma']
        strict = substring_overlap_pairs(corpus(texts), k=16, window=8,
                                         min_shared=10**6, num_partitions=4).to_pandas()
        assert len(strict) == 0

    def test_max_bucket_skips_stop_phrases(self):
        texts = [f'doc {i} copy of {SHARED}' for i in range(6)]
        capped = substring_overlap_pairs(corpus(texts), k=16, window=8, min_shared=1,
                                         max_bucket=2, num_partitions=4).to_pandas()
        full = substring_overlap_pairs(corpus(texts), k=16, window=8, min_shared=1,
                                       max_bucket=200, num_partitions=4).to_pandas()
        assert len(full) == 15  # all C(6,2) pairs share the span
        assert len(capped) < len(full)  # oversized buckets were skipped

    def test_disjoint_corpus_yields_nothing(self):
        rng = np.random.default_rng(9)
        texts = [' '.join('%08x' % v for v in rng.integers(0, 2**32, 12)) for _ in range(5)]
        pairs = substring_overlap_pairs(corpus(texts), k=16, window=8, min_shared=1,
                                        num_partitions=4).to_pandas()
        assert len(pairs) == 0

    def test_clusters_connected_components(self):
        texts = [f'one {SHARED} two', f'three {SHARED} four',
                 'solitary document with entirely unique contents and phrasing xyzzy']
        frame = substring_overlap_clusters(corpus(texts), k=16, window=8, min_shared=1,
                                           num_partitions=4)
        by_id = dict(zip(frame['id'], frame['cluster_id']))
        assert by_id[0] == by_id[1]
        assert 2 not in by_id or by_id[2] != by_id[0]
