"""Flagship pipeline: point-in-time as-of join + windowed feature suite over
pre-tokenized training sequences (the north-rule workload, BASELINE.json).

Stages (all streaming, one entity shuffle end-to-end where possible):

1. ``read_parquet`` of the sequence table
   ``(doc_id, tokens: list<int32>, n_tok, source, ts)``.
2. As-of join of the sparse per-entity ``doc_events`` table (latest
   ``quality``/``label`` with ``ts_event <= ts_seq`` per ``doc_id``) — zero
   temporal leakage by construction.
3. Per-entity window features over ``doc_id`` (lag, exclusive expanding
   aggregates, rolling trailing windows, sessionization, recency, forward
   fill) plus per-source features — the auto-featurs catalog re-expressed on
   the sorted-partition runtime.
4. Ratio/diff layer on the generated columns.
5. Optional checkpointed partitioned parquet sink; ``tokens`` passes through
   every stage as untouched Arrow list data (byte-equal guarantee).
"""

from __future__ import annotations

from typing import Optional

import ray.data

from auto_featurs_ray.base.column_specification import ColumnRole
from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.base.schema import Schema
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.engine.asof import asof_join
from auto_featurs_ray.engine.checkpoint import resumable_write
from auto_featurs_ray.pipeline.pipeline import Pipeline
from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations
from auto_featurs_ray.transformers.base import CumulativeOptions
from auto_featurs_ray.transformers.numeric import ArithmeticOperation
from auto_featurs_ray.transformers.temporal import FillStrategy

JOINED_SCHEMA = Schema([
    CS.nominal(name='doc_id', role=ColumnRole.IDENTIFIER),
    CS.numeric(name='n_tok'),
    CS.nominal(name='source', role=ColumnRole.IDENTIFIER),
    CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
    CS.numeric(name='quality'),
    CS.numeric(name='label'),
])


def build_flagship_dataset(seq_path: str, events_path: Optional[str] = None, *,
                           num_partitions: int = 64) -> Dataset:
    sequences = ray.data.read_parquet(seq_path)
    if events_path is not None:
        joined = asof_join(sequences, ray.data.read_parquet(events_path),
                           by=['doc_id'], on='ts', direction='backward',
                           num_partitions=num_partitions)
    else:
        joined = sequences.map_batches(lambda t: t.append_column('quality', __import__('pyarrow').nulls(t.num_rows, __import__('pyarrow').float64())),
                                       batch_format='pyarrow')
    return Dataset(joined, JOINED_SCHEMA, order_by=['doc_id', 'ts'], num_partitions=num_partitions)


def flagship_pipeline(dataset: Dataset, *, rolling_window: str = '1h',
                      session_gap: str = '30m') -> Pipeline:
    by_doc = [['doc_id']]
    return (
        Pipeline(dataset)
        # layer 1: per-entity point-in-time features
        .with_lagged('n_tok', lags=[1, 2], over_columns_combinations=by_doc)
        .with_arithmetic_aggregation('n_tok',
                                     aggregations=[ArithmeticAggregations.SUM, ArithmeticAggregations.MEAN],
                                     over_columns_combinations=by_doc,
                                     cumulative=CumulativeOptions.EXCLUSIVE)
        .with_count(over_columns_combinations=by_doc, time_windows=[rolling_window],
                    index_column_name='ts')
        .with_arithmetic_aggregation('n_tok', aggregations=[ArithmeticAggregations.MEAN],
                                     over_columns_combinations=by_doc,
                                     time_windows=[rolling_window], index_column_name='ts')
        .with_sessionization('ts', gaps=[session_gap], over_columns_combinations=by_doc)
        .with_time_since_last('ts', over_columns_combinations=by_doc)
        .with_fill('quality', strategies=[FillStrategy.FORWARD], over_columns_combinations=by_doc)
        .with_new_layer()
        # layer 2: ratio/diff transforms on generated columns
        .with_arithmetic(['n_tok'], ['n_tok_lagged_1_over_doc_id'],
                         operations=[ArithmeticOperation.DIVIDE, ArithmeticOperation.SUBTRACT])
        .with_arithmetic(['n_tok'], [f'n_tok_mean_in_the_last_{rolling_window}_over_doc_id'],
                         operations=[ArithmeticOperation.DIVIDE])
    )


def run_flagship(seq_path: str, events_path: Optional[str] = None, *,
                 out_dir: Optional[str] = None, num_partitions: int = 64,
                 rolling_window: str = '1h', session_gap: str = '30m'):
    """Build + execute the flagship pipeline; returns the result Dataset
    (and writes a checkpointed partitioned sink when ``out_dir`` is given)."""
    dataset = build_flagship_dataset(seq_path, events_path, num_partitions=num_partitions)
    result = flagship_pipeline(dataset, rolling_window=rolling_window,
                               session_gap=session_gap).collect_plan()
    if out_dir is not None:
        resumable_write(result.data, out_dir, key_columns=['doc_id'], order_by=['ts'],
                        num_partitions=num_partitions)
    return result
