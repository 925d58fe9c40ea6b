"""Token-payload operations: hashing, dedup, bucketing, truncation, packing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from auto_featurs_ray.datapipe.tokens import (
    SequencePacker,
    add_length_buckets,
    exact_token_dedup,
    token_array_hashes,
    truncate_tokens,
)


def token_table():
    seqs = [[1, 2, 3], [4, 5], [1, 2, 3], [], [7], [4, 5], [1, 2, 3, 4]]
    return pa.table({
        'doc_id': pa.array(range(len(seqs)), pa.int64()),
        'tokens': pa.array(seqs, pa.list_(pa.int32())),
        'n_tok': pa.array([len(s) for s in seqs], pa.int32()),
    })


class TestTokenHash:
    def test_equal_arrays_equal_hashes(self):
        h = token_array_hashes(token_table().column('tokens'))
        assert h[0] == h[2]           # identical [1,2,3]
        assert h[1] == h[5]           # identical [4,5]
        assert h[0] != h[6]           # prefix is not equal
        assert h[0] != h[1]
        assert len(set(h.tolist())) == 5

    def test_order_sensitive(self):
        t = pa.table({'tokens': pa.array([[1, 2], [2, 1]], pa.list_(pa.int32()))})
        h = token_array_hashes(t.column('tokens'))
        assert h[0] != h[1]

    def test_deterministic_across_calls(self):
        a = token_array_hashes(token_table().column('tokens'))
        b = token_array_hashes(token_table().column('tokens'))
        assert (a == b).all()


class TestTokenDedup:
    def test_keeps_min_id(self):
        out = exact_token_dedup(rd.from_arrow(token_table()), num_partitions=4).to_pandas()
        ids = sorted(out['doc_id'])
        assert ids == [0, 1, 3, 4, 6]  # 2 dups 0, 5 dups 1
        kept = {r.doc_id: list(r.tokens) for r in out.itertuples()}
        assert kept[0] == [1, 2, 3]


class TestLengthBuckets:
    def test_buckets(self):
        out = (add_length_buckets(rd.from_arrow(token_table()), boundaries=[2, 4])
               .to_pandas().sort_values('doc_id'))
        # lengths [3,2,3,0,1,2,4]; bucket = number of boundaries <= length
        assert out['length_bucket'].tolist() == [1, 1, 1, 0, 0, 1, 2]


class TestTruncate:
    def test_truncation(self):
        out = (truncate_tokens(rd.from_arrow(token_table()), max_tokens=2)
               .to_pandas().sort_values('doc_id'))
        assert [list(t) for t in out['tokens']] == [[1, 2], [4, 5], [1, 2], [], [7], [4, 5], [1, 2]]
        assert out['n_tok'].tolist() == [2, 2, 2, 0, 1, 2, 2]

    def test_noop_when_under_limit(self):
        src = token_table()
        out = truncate_tokens(rd.from_arrow(src), max_tokens=100).to_pandas().sort_values('doc_id')
        assert [list(t) for t in out['tokens']] == [list(t) for t in src.column('tokens').to_pylist()]


class TestSequencePacker:
    def test_packing_preserves_tokens_and_boundaries(self):
        out = rd.from_arrow(token_table()).map_batches(
            SequencePacker, fn_constructor_kwargs={'context_len': 6},
            batch_format='pyarrow', concurrency=1).to_pandas()
        assert (out['fill_ratio'] <= 1.0).all()
        # every input token sequence appears intact inside some pack
        packed = {}
        for row in out.itertuples():
            bounds = list(row.boundaries)
            for i, doc in enumerate(row.member_ids):
                packed[doc] = list(row.tokens)[bounds[i]:bounds[i + 1]]
        src = {r['doc_id']: r['tokens'] for r in token_table().to_pylist()}
        for doc, seq in src.items():
            assert packed[doc] == seq, doc
        # packs respect context_len
        assert all(len(list(r.tokens)) <= 6 for r in out.itertuples())


class TestConcatChunk:
    def test_chunks_are_deterministic_and_exact(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.tokens import concat_chunk_tokens
        # 3 docs in one stream (ids 0,2,4 % 2 == 0), 1 doc in the other
        toks = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
        ids = [0, 2, 4, 1]
        t = pa.table({'doc_id': pa.array(ids, pa.int64()),
                      'tokens': pa.array(toks, pa.list_(pa.int32()))})
        out = (concat_chunk_tokens(rd.from_arrow([t.slice(i, 1) for i in range(4)]),
                                   context_len=4, eod_token=-1, num_parts=2,
                                   num_partitions=3)
               .to_pandas().sort_values(['part', 'chunk_id']).reset_index(drop=True))
        # stream 0 concat: 1 2 3 -1 | 4 5 -1 | 6 7 8 9 -1 -> 12 tokens -> 3 chunks
        assert out['part'].tolist() == [0, 0, 0]          # stream 1 has 2 tokens -> dropped
        assert [list(x) for x in out['tokens']] == [
            [1, 2, 3, -1], [4, 5, -1, 6], [7, 8, 9, -1]]
        assert (out['n_tok'] == 4).all()

    def test_validation(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.tokens import concat_chunk_tokens
        t = pa.table({'doc_id': pa.array([0], pa.int64()),
                      'tokens': pa.array([[1]], pa.list_(pa.int32()))})
        with pytest.raises(ValueError, match='context_len'):
            concat_chunk_tokens(rd.from_arrow(t), context_len=0)
        with pytest.raises(ValueError, match='num_parts'):
            concat_chunk_tokens(rd.from_arrow(t), num_parts=0)


class TestTokenPairCounts:
    def test_pairs_never_cross_rows_and_sum_to_total(self, ray_session):
        import ray.data as rd

        from auto_featurs_ray.datapipe.tokens import token_pair_counts

        toks = [[1, 2, 2, 3], [2, 3], [7], [], [3, 1]]
        tbl = pa.table({'tokens': pa.array(toks, pa.list_(pa.int32()))})
        out = token_pair_counts(rd.from_arrow(tbl), num_partitions=4).to_pandas()
        got = {(int(r.t1), int(r.t2)): int(r.pair_count) for r in out.itertuples()}
        # brute force per row
        want: dict = {}
        for row in toks:
            for a, b in zip(row, row[1:]):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want
        assert sum(got.values()) == sum(max(len(r) - 1, 0) for r in toks)

    def test_min_count_prunes(self, ray_session):
        import ray.data as rd

        from auto_featurs_ray.datapipe.tokens import token_pair_counts

        toks = [[1, 2, 1, 2, 1], [9, 8]]
        tbl = pa.table({'tokens': pa.array(toks, pa.list_(pa.int32()))})
        out = token_pair_counts(rd.from_arrow(tbl), num_partitions=2,
                                min_count=2).to_pandas()
        got = {(int(r.t1), int(r.t2)): int(r.pair_count) for r in out.itertuples()}
        assert got == {(1, 2): 2, (2, 1): 2}

    def test_negative_token_ids_roundtrip(self, ray_session):
        import ray.data as rd

        from auto_featurs_ray.datapipe.tokens import token_pair_counts

        toks = [[-1, 5, -1], [5, -1]]
        tbl = pa.table({'tokens': pa.array(toks, pa.list_(pa.int32()))})
        out = token_pair_counts(rd.from_arrow(tbl), num_partitions=2).to_pandas()
        got = {(int(r.t1), int(r.t2)): int(r.pair_count) for r in out.itertuples()}
        assert got == {(-1, 5): 1, (5, -1): 2}
