#!/usr/bin/env python
"""Single-process polars context anchor (BASELINE.md §measured).

Evaluates the flagship workload — as-of join + the per-entity window feature
suite — as the reference engine would run it: one process, polars lazy
expressions (the reference is a thin layer over exactly these), eager
collect.  Gives the 'reference single-node throughput' number our Ray engine
must match or beat at the same data scale.
"""

import json
import os
import sys
import time

import polars as pl

F6_DIR = os.environ.get('GRAFT_F6_DIR', '/tmp/afr_f6_bench')


def run_once(seq_path: str, ev_path: str) -> tuple:
    start = time.monotonic()
    seq = pl.scan_parquet(seq_path + '/*.parquet').sort(['doc_id', 'ts'])
    ev = pl.scan_parquet(ev_path + '/*.parquet').sort('ts')

    joined = seq.join_asof(ev, on='ts', by='doc_id', strategy='backward')

    n = pl.col('n_tok')
    cum_mean = (n.cum_sum() / pl.int_range(1, pl.len() + 1))
    out = joined.with_columns(
        n.shift(1).over('doc_id').alias('n_tok_lagged_1_over_doc_id'),
        n.shift(2).over('doc_id').alias('n_tok_lagged_2_over_doc_id'),
        n.cum_sum().shift(1, fill_value=0.0).over('doc_id').alias('n_tok_exclusive_cum_sum_over_doc_id'),
        cum_mean.shift(1).over('doc_id').alias('n_tok_exclusive_cum_mean_over_doc_id'),
        n.cast(pl.Float64).cumulative_eval(pl.element().quantile(0.5, interpolation='linear'))
            .shift(1).over('doc_id').alias('n_tok_exclusive_cum_median_over_doc_id'),
        (n - cum_mean).pow(2).fill_nan(0.0).cum_sum().shift(1, fill_value=0.0).sqrt()
            .over('doc_id').alias('n_tok_exclusive_cum_std_over_doc_id'),
        (pl.col('quality').cum_sum() / pl.int_range(1, pl.len() + 1)).shift(1).over('doc_id')
            .alias('quality_exclusive_cum_mean_over_doc_id'),
        (pl.col('quality') - pl.col('quality').cum_sum() / pl.int_range(1, pl.len() + 1))
            .pow(2).fill_nan(0.0).cum_sum().shift(1, fill_value=0.0).sqrt().over('doc_id')
            .alias('quality_exclusive_cum_std_over_doc_id'),
        pl.col('quality').shift(1).over('doc_id').alias('quality_lagged_1_over_doc_id'),
        *[expr
          for window in ('1h', '6h')
          for expr in (
              pl.len().last().rolling(index_column='ts', period=window).over('doc_id')
                  .alias(f'count_in_the_last_{window}_over_doc_id'),
              (n.sum() / pl.len()).last().rolling(index_column='ts', period=window).over('doc_id')
                  .alias(f'n_tok_mean_in_the_last_{window}_over_doc_id'),
              n.cast(pl.Float64).quantile(0.5, interpolation='linear').last()
                  .rolling(index_column='ts', period=window).over('doc_id')
                  .alias(f'n_tok_median_in_the_last_{window}_over_doc_id'),
              n.max().last().rolling(index_column='ts', period=window).over('doc_id')
                  .alias(f'n_tok_max_in_the_last_{window}_over_doc_id'),
              n.min().last().rolling(index_column='ts', period=window).over('doc_id')
                  .alias(f'n_tok_min_in_the_last_{window}_over_doc_id'),
              n.std().last().rolling(index_column='ts', period=window).over('doc_id')
                  .alias(f'n_tok_std_in_the_last_{window}_over_doc_id'),
              (pl.col('quality').sum() / pl.len()).last().rolling(index_column='ts', period=window)
                  .over('doc_id').alias(f'quality_mean_in_the_last_{window}_over_doc_id'),
              pl.col('quality').std().last().rolling(index_column='ts', period=window)
                  .over('doc_id').alias(f'quality_std_in_the_last_{window}_over_doc_id'),
          )],
        pl.col('source').is_first_distinct().cum_sum().over('doc_id')
            .alias('source_inclusive_cum_num_unique_over_doc_id'),
        ((pl.col('ts') - pl.col('ts').shift(1)).dt.total_microseconds() > 30 * 60 * 1_000_000)
            .fill_null(True).cast(pl.Int64).cum_sum().over('doc_id')
            .alias('ts_session_id_gap_30m_over_doc_id'),
        ((pl.col('ts') - pl.col('ts').shift(1)).dt.total_microseconds() / 1e6).over('doc_id')
            .alias('ts_seconds_since_last_over_doc_id'),
        pl.col('quality').forward_fill().over('doc_id')
            .alias('quality_forward_filled_over_doc_id'),
        pl.len().over('source').alias('count_over_source'),
        (n.sum() / pl.len()).over('source').alias('n_tok_mean_over_source'),
    ).with_columns(
        (n / pl.col('n_tok_lagged_1_over_doc_id')).alias('n_tok_divide_n_tok_lagged_1_over_doc_id'),
        (n - pl.col('n_tok_lagged_1_over_doc_id')).alias('n_tok_subtract_n_tok_lagged_1_over_doc_id'),
        (n / pl.col('n_tok_mean_in_the_last_1h_over_doc_id'))
            .alias('n_tok_divide_n_tok_mean_in_the_last_1h_over_doc_id'),
    )
    frame = out.collect()
    return time.monotonic() - start, frame.height


if __name__ == '__main__':
    seq, ev = F6_DIR + '/sequences', F6_DIR + '/events'
    run_once(seq, ev)  # warm page cache
    timings = []
    rows = 0
    for _ in range(2):
        t, rows = run_once(seq, ev)
        timings.append(t)
    wall = sorted(timings)[len(timings) // 2]
    print(json.dumps({'engine': 'polars-single-process', 'rows': rows,
                      'wall_s': round(wall, 2), 'sequences_per_sec': round(rows / wall, 1)}))
