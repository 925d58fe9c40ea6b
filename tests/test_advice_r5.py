"""Regression pins for the round-4 advisor findings (ADVICE.md round 5):

1. approx_count_distinct with NULL group keys (KeyError: None);
2. DENSE_RANK over rolling time windows (pandas rejects method='dense');
3. empty reduce partitions fabricating int64 key schemas in groupby_aggregate;
4. concat_chunk_tokens stream assignment for NEGATIVE ids (masked modulo
   diverged from the documented non-negative modulo rule);
5. one_hot_encode sanitized-name collisions ('a b' vs 'a_b', literal 'other').
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


class TestApproxDistinctNullKeys:
    def test_null_group_key_consistent_with_exact(self):
        from auto_featurs_ray.datapipe.relational import groupby_aggregate

        tbl = pa.table({
            'g': pa.array(['a', None, 'a', None, 'b', None, 'b', 'a']),
            'v': pa.array([1, 2, 1, 3, 4, 2, 4, 5], pa.int64()),
        })
        ds = ray.data.from_arrow(tbl)
        out = groupby_aggregate(
            ds, by=['g'],
            aggs={'v': ['count_distinct', 'approx_count_distinct']},
            num_partitions=4).to_pandas().sort_values('g', na_position='first')
        # below k distinct the KMV estimate is exact -> must equal the exact agg
        assert (out['v_count_distinct'].to_numpy()
                == out['v_approx_count_distinct'].to_numpy()).all()
        null_row = out[out['g'].isna()]
        assert len(null_row) == 1
        # values under the null key: 2, 3, 2 -> 2 distinct
        assert int(null_row['v_count_distinct'].iloc[0]) == 2

    def test_all_null_values_key(self):
        from auto_featurs_ray.datapipe.relational import groupby_aggregate

        tbl = pa.table({
            'g': pa.array(['a', 'a', 'b']),
            'v': pa.array([None, None, 7], pa.int64()),
        })
        ds = ray.data.from_arrow(tbl)
        out = groupby_aggregate(ds, by=['g'],
                                aggs={'v': ['approx_count_distinct']},
                                num_partitions=2).to_pandas().sort_values('g')
        assert out['v_approx_count_distinct'].tolist() == [0.0, 1.0]


class TestRollingDenseRank:
    def test_dense_rank_time_window_matches_bruteforce(self):
        from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
        from auto_featurs_ray.engine.aggframe import AggFrame
        from auto_featurs_ray.transformers.aggregating import (
            DenseRankTransformer,
            RankTransformer,
        )
        from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper

        rng = np.random.default_rng(7)
        n = 300
        ts = np.sort(rng.integers(0, n * 40, size=n)) * 1_000_000
        val = rng.integers(0, 6, n).astype(np.float64)
        val[rng.random(n) < 0.1] = np.nan
        frame = AggFrame(pa.table({
            'ts': pa.array(ts.astype('datetime64[us]')),
            'v': pa.array(val, from_pandas=True),
        }))
        t = DenseRankTransformer('v')
        lo, hi = RollingWrapper(t, CS.datetime(name='ts'), '120s').window_bounds(frame, None)
        got = np.asarray(t.compute_windowed(frame, lo, hi), dtype=np.float64)

        expect = np.full(n, np.nan)
        for i in range(n):
            anchor = val[hi[i] - 1]
            if np.isnan(anchor):
                continue
            w = val[lo[i]:hi[i]]
            w = w[~np.isnan(w)]
            expect[i] = len(np.unique(w[w <= anchor]))
        assert np.allclose(got, expect, equal_nan=True)
        # dense <= min-rank everywhere, equal when the window has no gaps
        minr = np.asarray(RankTransformer('v').compute_windowed(frame, lo, hi),
                          dtype=np.float64)
        ok = ~np.isnan(got)
        assert (got[ok] <= minr[ok]).all()


class TestEmptyPartitionSchema:
    def test_string_keys_concat_across_blocks(self):
        from auto_featurs_ray.datapipe.relational import groupby_aggregate

        # 2 distinct string keys across 16 partitions -> >=14 empty reduce
        # partitions; concat of the output blocks must not fail on schema
        tbl = pa.table({'k': pa.array(['x', 'y', 'x']),
                        'v': pa.array([1.5, 2.5, 3.5])})
        ds = ray.data.from_arrow(tbl)
        out = groupby_aggregate(ds, by=['k'], aggs={'v': ['min', 'max', 'mean']},
                                num_partitions=16)
        refs = out.to_arrow_refs()
        import ray as _ray
        blocks = _ray.get(refs)
        merged = pa.concat_tables([b for b in blocks if b.num_columns],
                                  promote_options='none')
        assert merged.num_rows == 2
        assert merged.schema.field('k').type == pa.string()
        assert merged.schema.field('v_min').type == pa.float64()


class TestConcatChunkNegativeIds:
    def test_negative_ids_follow_python_modulo(self):
        from auto_featurs_ray.datapipe.tokens import concat_chunk_tokens

        ids = np.array([-5, -1, 0, 3, 7, -8], dtype=np.int64)
        toks = [list(range(10)) for _ in ids]
        tbl = pa.table({'doc_id': pa.array(ids),
                        'tokens': pa.array(toks, pa.list_(pa.int32()))})
        out = concat_chunk_tokens(ray.data.from_arrow(tbl), context_len=4,
                                  num_parts=4, num_partitions=2).to_pandas()
        # every chunk's part must be a non-negative python-style modulo bucket
        assert set(out['part']).issubset(set(int(i) % 4 for i in ids))
        # the -5 and 3 documents share stream 3; -8 and 0 share stream 0
        assert (out['part'] >= 0).all()
        # SQL replay of the same rule agrees on the chunk count per part
        con = duckdb.connect()
        sql_parts = con.execute(
            'SELECT ((i % 4) + 4) % 4 AS p FROM (SELECT unnest($1::BIGINT[]) i)',
            [ids.tolist()]).fetchdf()['p'].to_numpy()
        py_parts = ids % 4
        assert (sql_parts == py_parts).all()


class TestOneHotNameCollisions:
    def test_sanitize_collisions_deduped(self):
        from auto_featurs_ray.datapipe.encoding import one_hot_encode

        tbl = pa.table({'c': pa.array(['a b', 'a_b', 'other', 'a b', 'z'] * 3)})
        out = one_hot_encode(ray.data.from_arrow(tbl), column='c',
                             max_categories=4, num_partitions=2)
        df = out.to_pandas()
        names = [c for c in df.columns if c.startswith('c_is_')]
        assert len(names) == len(set(names)) == 5  # 4 categories + other bucket
        # indicators still one-hot: each row sums to exactly 1 across buckets
        assert (df[names].sum(axis=1) == 1).all()
        # 'a b' and 'a_b' got distinct columns with distinct support
        ab_cols = [c for c in names if c.startswith('c_is_a_b')]
        assert len(ab_cols) == 2
        assert df[ab_cols[0]].sum() != df[ab_cols[1]].sum() or \
            not df[ab_cols[0]].equals(df[ab_cols[1]])


class TestHashJoinBroadcastHint:
    def test_hint_fires_on_tiny_right_side(self):
        from auto_featurs_ray.engine.join import _tiny_side_hint

        assert _tiny_side_hint(50_000, 100, 16) is not None
        # large right side: exchange is correct, no hint
        assert _tiny_side_hint(50_000, 2_000_000, 16) is None
        # comparable sizes: no hint even though right is < threshold
        assert _tiny_side_hint(1_000, 900, 16) is None
        # empty right partition: no estimate, no hint
        assert _tiny_side_hint(1_000, 0, 16) is None


class TestFullOuterJoin:
    def test_unmatched_rows_survive_both_sides(self):
        import ray.data as rd

        from auto_featurs_ray.engine.join import hash_join

        left = pa.table({'k': pa.array([1, 2, 2], pa.int64()),
                         'a': pa.array(['x', 'y', 'z'])})
        right = pa.table({'k': pa.array([2, 3], pa.int64()),
                          'b': pa.array(['p', 'q'])})
        out = hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'],
                        how='full', num_partitions=4).to_pandas()
        out = out.sort_values(['k', 'a'], na_position='last').reset_index(drop=True)
        assert out['k'].tolist() == [1, 2, 2, 3]
        assert out['a'].tolist() == ['x', 'y', 'z', None]
        assert out['b'].tolist() == [None, 'p', 'p', 'q']

    def test_right_outer(self):
        import ray.data as rd

        from auto_featurs_ray.engine.join import hash_join

        left = pa.table({'k': pa.array([1], pa.int64()), 'a': pa.array(['x'])})
        right = pa.table({'k': pa.array([1, 9], pa.int64()), 'b': pa.array(['p', 'q'])})
        out = hash_join(rd.from_arrow(left), rd.from_arrow(right), on=['k'],
                        how='right', num_partitions=2).to_pandas().sort_values('k')
        assert out['k'].tolist() == [1, 9]
        assert out['a'].tolist() == ['x', None]
