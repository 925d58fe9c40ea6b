"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the library) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship pipeline shape (as-of join + windowed feature suite)
  over ``/root/testdata/sf0.001``.
* ``queries()`` — one callable per implemented operator family from
  SURVEY.md §2 (see ``auto_featurs_ray/queries.py``).
* ``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible query;
  column names/aliases are identical on both sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship shape over sf0.001: as-of join (events <- orders) + per-entity
    point-in-time window features (lag, exclusive expanding, rolling,
    sessionize, recency, forward fill)."""
    import os
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from auto_featurs_ray.base.column_specification import ColumnRole
    from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
    from auto_featurs_ray.base.schema import Schema
    from auto_featurs_ray.dataset.dataset import Dataset
    from auto_featurs_ray.engine.asof import asof_join
    from auto_featurs_ray.pipeline.pipeline import Pipeline
    from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations
    from auto_featurs_ray.transformers.base import CumulativeOptions
    from auto_featurs_ray.transformers.temporal import FillStrategy

    sf_dir = '/root/testdata/sf0.001'
    events = ray.data.read_parquet(os.path.join(sf_dir, 'events.parquet'))

    def prep_orders(batch: pa.Table) -> pa.Table:
        return pa.table({'user_id': batch.column('o_custkey'),
                         'ts': batch.column('o_orderdate'),
                         'last_order_price': batch.column('o_totalprice')})

    orders = (ray.data.read_parquet(os.path.join(sf_dir, 'orders.parquet'),
                                    columns=['o_custkey', 'o_orderdate', 'o_totalprice'])
              .map_batches(prep_orders, batch_format='pyarrow'))

    joined = asof_join(events, orders, by=['user_id'], on='ts', direction='backward',
                       num_partitions=16)
    schema = Schema([
        CS.numeric(name='event_id', role=ColumnRole.IDENTIFIER),
        CS.datetime(name='ts', role=ColumnRole.TIME_INFO),
        CS.nominal(name='user_id', role=ColumnRole.IDENTIFIER),
        CS.nominal(name='event_type'),
        CS.numeric(name='value'),
        CS.numeric(name='last_order_price'),
    ])
    dataset = Dataset(joined, schema, order_by=['ts', 'event_id'], num_partitions=16)
    result = (Pipeline(dataset)
              .with_lagged('value', lags=[1], over_columns_combinations=[['user_id']])
              .with_arithmetic_aggregation('value', aggregations=[ArithmeticAggregations.MEAN],
                                           over_columns_combinations=[['user_id']],
                                           cumulative=CumulativeOptions.EXCLUSIVE)
              .with_count(over_columns_combinations=[['user_id']], time_windows=['6h'],
                          index_column_name='ts')
              .with_sessionization('ts', gaps=['6h'], over_columns_combinations=[['user_id']])
              .with_time_since_last('ts', over_columns_combinations=[['user_id']])
              .with_fill('last_order_price', strategies=[FillStrategy.FORWARD],
                         over_columns_combinations=[['user_id']])
              .collect_plan())
    return result.data


def queries() -> dict[str, Callable[[str], Any]]:
    from auto_featurs_ray.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from auto_featurs_ray.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
