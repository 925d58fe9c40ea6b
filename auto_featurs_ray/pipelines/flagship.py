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


def _window_transformers(rolling_window: str, session_gap: str) -> list:
    """Layer-1 per-entity transformers, all keyed on doc_id (one shuffle)."""
    from auto_featurs_ray.base.column_specification import ColumnSpecification as _CS
    from auto_featurs_ray.transformers.aggregating import (
        LaggedTransformer, MeanTransformer, SumTransformer, CountTransformer,
    )
    from auto_featurs_ray.transformers.over_wrapper import OverWrapper
    from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper
    from auto_featurs_ray.transformers.temporal import (
        FillTransformer, SessionIdTransformer, TimeSinceLastTransformer,
    )

    from auto_featurs_ray.transformers.aggregating import (
        MaxTransformer, MedianTransformer, MinTransformer, NumUniqueTransformer, StdTransformer,
    )

    n_tok = _CS.numeric(name='n_tok')
    ts = _CS.datetime(name='ts')
    quality = _CS.numeric(name='quality')
    by_doc = ['doc_id']
    windows = [rolling_window, '6h']
    transformers = [
        OverWrapper(LaggedTransformer(n_tok, 1), by_doc),
        OverWrapper(LaggedTransformer(n_tok, 2), by_doc),
        OverWrapper(LaggedTransformer(quality, 1), by_doc),
        OverWrapper(SumTransformer('n_tok', CumulativeOptions.EXCLUSIVE), by_doc),
        OverWrapper(MeanTransformer('n_tok', CumulativeOptions.EXCLUSIVE), by_doc),
        OverWrapper(MedianTransformer('n_tok', CumulativeOptions.EXCLUSIVE), by_doc),
        OverWrapper(StdTransformer('n_tok', CumulativeOptions.EXCLUSIVE), by_doc),
        OverWrapper(MeanTransformer('quality', CumulativeOptions.EXCLUSIVE), by_doc),
        OverWrapper(StdTransformer('quality', CumulativeOptions.EXCLUSIVE), by_doc),
        OverWrapper(NumUniqueTransformer('source', CumulativeOptions.INCLUSIVE), by_doc),
        OverWrapper(SessionIdTransformer(ts, session_gap), by_doc),
        OverWrapper(TimeSinceLastTransformer(ts), by_doc),
        OverWrapper(FillTransformer(quality, FillStrategy.FORWARD), by_doc),
    ]
    for window in windows:
        transformers.extend([
            OverWrapper(RollingWrapper(CountTransformer(), ts, window), by_doc),
            OverWrapper(RollingWrapper(MeanTransformer('n_tok'), ts, window), by_doc),
            OverWrapper(RollingWrapper(MedianTransformer('n_tok'), ts, window), by_doc),
            OverWrapper(RollingWrapper(MaxTransformer('n_tok'), ts, window), by_doc),
            OverWrapper(RollingWrapper(MinTransformer('n_tok'), ts, window), by_doc),
            OverWrapper(RollingWrapper(StdTransformer('n_tok'), ts, window), by_doc),
            OverWrapper(RollingWrapper(MeanTransformer('quality'), ts, window), by_doc),
            OverWrapper(RollingWrapper(StdTransformer('quality'), ts, window), by_doc),
        ])
    return transformers


def _ratio_transformers(rolling_window: str) -> list:
    from auto_featurs_ray.transformers.numeric import DivideTransformer, SubtractTransformer
    return [
        DivideTransformer('n_tok', 'n_tok_lagged_1_over_doc_id'),
        SubtractTransformer('n_tok', 'n_tok_lagged_1_over_doc_id'),
        DivideTransformer('n_tok', f'n_tok_mean_in_the_last_{rolling_window}_over_doc_id'),
    ]


def run_flagship(seq_path: str, events_path: Optional[str] = None, *,
                 out_dir: Optional[str] = None, num_partitions: Optional[int] = 64,
                 rolling_window: str = '1h', session_gap: str = '30m'):
    """Execute the flagship pipeline with ONE entity shuffle end-to-end.

    The as-of join already co-partitions both sides by ``doc_id``; every
    per-entity window feature is evaluated inside the same partition pass
    (``asof_join(post_transformers=...)``), and the ratio/diff layer is a
    fused row-local map — so the whole suite costs a single all-to-all
    exchange.  Returns the result Dataset (and writes the checkpointed
    partitioned sink when ``out_dir`` is given).
    """
    import glob
    import os

    from auto_featurs_ray.engine.runtime import apply_row_local_stage

    def parquet_shards(path):
        if os.path.isdir(path):
            shards = sorted(glob.glob(os.path.join(path, '*.parquet')))
            if shards:
                return shards
        return [path] if os.path.isfile(path) else None

    seq_shards = parquet_shards(seq_path)
    sequences = seq_shards if seq_shards else ray.data.read_parquet(seq_path)
    if num_partitions is None:
        # size the exchange to the data: ~TARGET_PARTITION_BYTES of
        # (decompressed, ~3x) input per reduce partition
        from auto_featurs_ray.engine.runtime import suggest_num_partitions
        file_bytes = sum(os.path.getsize(s) for s in (seq_shards or [])) or (64 << 30)
        num_partitions = suggest_num_partitions(file_bytes * 3)
    if events_path is None:
        import pyarrow as pa

        def add_quality(batch):
            return batch.append_column('quality', pa.nulls(batch.num_rows, pa.float64()))

        if isinstance(sequences, list):
            sequences = ray.data.read_parquet(seq_path)
        sequences = sequences.map_batches(add_quality, batch_format='pyarrow')
        events_side = None
    else:
        events_side = parquet_shards(events_path) or ray.data.read_parquet(events_path)

    window = _window_transformers(rolling_window, session_gap)
    ratios = _ratio_transformers(rolling_window)

    # NOTE: launching the exchange's split phase before the broadcast-state
    # pass (cogroup_launch_splits + presplit=) was measured SLOWER here — the
    # states executor and the split tasks contend for the same 32 CPUs rather
    # than overlapping; on a real multi-node cluster with I/O-bound scans the
    # two-phase form is the right shape, so the API stays available.
    presplit = None

    # per-source (zipf-hot key) aggregates: partials over a COLUMN-PRUNED read
    # (source, n_tok only), combined on the driver, then attached inside the
    # reduce task — the skew-immune path with zero extra passes over the wide
    # (token-carrying) table
    import ray.data as _rd
    from auto_featurs_ray.engine.runtime import (
        BroadcastLookupFeature,
        compute_grouped_broadcast_states,
    )
    from auto_featurs_ray.transformers.aggregating import CountTransformer, MeanTransformer
    from auto_featurs_ray.transformers.over_wrapper import OverWrapper
    source_aggs = [OverWrapper(CountTransformer(), ['source']),
                   OverWrapper(MeanTransformer('n_tok'), ['source'])]
    pruned = _rd.read_parquet(seq_path, columns=['source', 'n_tok'])
    states = compute_grouped_broadcast_states(pruned, ['source'],
                                              [t.inner_transformer for t in source_aggs])
    source_features = [BroadcastLookupFeature(t, states, ['source'], i)
                       for i, t in enumerate(source_aggs)]

    if events_side is not None:
        # as-of join + window suite + ratio layer + source lookups: one exchange
        data = asof_join(sequences, events_side, by=['doc_id'], on='ts', direction='backward',
                         num_partitions=num_partitions,
                         post_transformers=window, post_order_by=['ts'],
                         post_row_local=ratios + source_features, presplit=presplit)
    else:
        from auto_featurs_ray.engine.runtime import apply_window_stage
        joined = apply_window_stage(sequences, window, ['doc_id'], ['ts'], num_partitions)
        data = apply_row_local_stage(joined, ratios + source_features)

    out_schema = JOINED_SCHEMA + Schema(
        [t.output_column_specification for t in window]
        + [t.output_column_specification for t in _ratio_transformers(rolling_window)]
        + [t.output_column_specification for t in source_aggs])
    result = Dataset(data, out_schema, order_by=['doc_id', 'ts'], num_partitions=num_partitions)
    if out_dir is not None:
        resumable_write(result.data, out_dir, key_columns=['doc_id'], order_by=['ts'],
                        num_partitions=num_partitions)
    return result


def main(argv=None):
    """``ray job submit -- python -m auto_featurs_ray.pipelines.flagship ...``"""
    import argparse
    import json
    import time

    import ray

    parser = argparse.ArgumentParser(description='Flagship as-of + window feature pipeline')
    parser.add_argument('--sequences', required=True, help='parquet dir/file of tokenized sequences')
    parser.add_argument('--events', default=None, help='parquet dir/file of per-entity events')
    parser.add_argument('--out', default=None, help='checkpointed partitioned parquet output dir')
    parser.add_argument('--num-partitions', type=int, default=64)
    parser.add_argument('--rolling-window', default='1h')
    parser.add_argument('--session-gap', default='30m')
    args = parser.parse_args(argv)

    if not ray.is_initialized():
        ray.init(address='local', include_dashboard=False, logging_level='ERROR')
    start = time.monotonic()
    result = run_flagship(args.sequences, args.events, out_dir=args.out,
                          num_partitions=args.num_partitions,
                          rolling_window=args.rolling_window, session_gap=args.session_gap)
    rows = result.data.count()
    wall = time.monotonic() - start
    print(json.dumps({'rows': rows, 'wall_s': round(wall, 2),
                      'sequences_per_sec': round(rows / wall, 1), 'out': args.out}))
    ray.shutdown()


if __name__ == '__main__':
    main()
