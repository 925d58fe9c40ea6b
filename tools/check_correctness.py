#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` DuckDB counterpart over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.01), then compares:

* row count
* schema (column-name set)
* per-column null count (NaN in a float column is NOT null — the round-1
  ``session_events`` failure was exactly a NaN-vs-NULL encoding drift)
* per-column Arrow TYPE (the driver's hash is type-sensitive: a DuckDB
  ``SUM()`` left un-CAST emits decimal128(38,0)/hugeint where the engine
  emits int64, and ``Decimal('5') != 5`` under the driver's hash even though
  ``str()`` of both is ``'5'`` — the round-2 ``session_events`` /
  ``cumulative_extras_events`` failure).  Types are compared after a light
  canonicalization (string==large_string, dictionary-decoded); any
  decimal-vs-integer or int-vs-float mismatch is a hard FAIL here even when
  the stringified values agree.
* order-insensitive value hash (columns sorted by name, rows sorted by all
  columns, nulls hashed distinctly from NaN)

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get('GRAFT_SF_DIR', '/root/testdata/sf0.01')
TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def _as_arrow(result):
    import pandas as pd
    import pyarrow as pa
    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    # ray.data.Dataset
    import ray
    return pa.concat_tables(ray.get(result.to_arrow_refs()), promote_options='permissive')


def _canonical(table):
    """Sort columns by name, rows by all columns -> list of row tuples."""
    import pyarrow as pa
    import pyarrow.compute as pc
    table = table.select(sorted(table.column_names))
    table = table.combine_chunks()
    if table.num_rows:
        keys = [(c, 'ascending') for c in table.column_names]
        try:
            table = table.take(pc.sort_indices(table, sort_keys=keys))
        except pa.ArrowNotImplementedError:
            pass
    return table


def _canonical_type(t):
    """Canonicalize an Arrow type for comparison.  Representation-only variants
    are equal: large_string vs string, dictionary encoding, integer widths
    (the driver hashes via Python values, so int32 5 == int64 5 — verified by
    text_counts_documents passing r02 with engine int32 vs oracle int64), and
    float32 vs float64 likewise.  Semantic variants are NOT equal: decimal vs
    int/float (``Decimal('5') != 5`` — the r02 session_events failure)."""
    import pyarrow as pa
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_integer(t):
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_large_list(t):
        return pa.list_(_canonical_type(t.value_type))
    if pa.types.is_list(t):
        return pa.list_(_canonical_type(t.value_type))
    return t


def _value_repr(v):
    import math
    if v is None:
        return '<NULL>'
    if isinstance(v, float):
        if math.isnan(v):
            return '<NaN>'
        return f'{v:.9g}'
    return str(v)


def _hash(table) -> str:
    import hashlib
    h = hashlib.sha1()
    cols = [table.column(c).to_pylist() for c in table.column_names]
    for row in zip(*cols):
        h.update(('|'.join(_value_repr(v) for v in row) + '\n').encode())
    return h.hexdigest()


def main(argv):
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address='local', num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '16')),
                 include_dashboard=False, logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f'{t}.parquet')
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    names = argv or list(queries)
    results, fails = {}, []
    for name in names:
        if name not in oracles:
            try:
                got = _as_arrow(queries[name](SF_DIR))
                results[name] = {'rows_only': got.num_rows}
                print(f'{name:32s} rows-only  {got.num_rows}')
            except Exception as exc:  # noqa: BLE001
                results[name] = {'err': str(exc)}
                fails.append(name)
                print(f'{name:32s} ERROR      {exc}')
            continue
        try:
            got = _canonical(_as_arrow(queries[name](SF_DIR)))
            want = _canonical(con.execute(oracles[name]).arrow())
            rows_ok = got.num_rows == want.num_rows
            schema_ok = set(got.column_names) == set(want.column_names)
            null_ok, null_detail = True, []
            types_ok, type_detail = True, []
            if schema_ok:
                for c in got.column_names:
                    gn, wn = got.column(c).null_count, want.column(c).null_count
                    if gn != wn:
                        null_ok = False
                        null_detail.append(f'{c}: engine={gn} oracle={wn}')
                    gt = _canonical_type(got.schema.field(c).type)
                    wt = _canonical_type(want.schema.field(c).type)
                    if gt != wt:
                        types_ok = False
                        type_detail.append(f'{c}: engine={gt} oracle={wt}')
            hash_ok = schema_ok and rows_ok and _hash(got) == _hash(want)
            ok = rows_ok and schema_ok and null_ok and types_ok and hash_ok
            results[name] = {'rows': rows_ok, 'schema': schema_ok, 'nulls': null_ok,
                             'types': types_ok, 'hash': hash_ok}
            status = 'OK' if ok else 'FAIL'
            detail = '' if ok else (f' rows={got.num_rows}/{want.num_rows}'
                                    f' schema={schema_ok} nulls={null_detail}'
                                    f' types={type_detail} hash={hash_ok}')
            print(f'{name:32s} {status}{detail}')
            if not ok:
                fails.append(name)
                if schema_ok and rows_ok and not hash_ok:
                    _show_diff(got, want)
        except Exception as exc:  # noqa: BLE001
            results[name] = {'err': str(exc)}
            fails.append(name)
            print(f'{name:32s} ERROR      {exc}')

    print(json.dumps({'fails': fails}))
    return 1 if fails else 0


def _show_diff(got, want, limit: int = 5):
    shown = 0
    cols = got.column_names
    g = [got.column(c).to_pylist() for c in cols]
    w = [want.column(c).to_pylist() for c in cols]
    for i in range(got.num_rows):
        grow = tuple(_value_repr(col[i]) for col in g)
        wrow = tuple(_value_repr(col[i]) for col in w)
        if grow != wrow:
            print(f'  row {i}: engine={dict(zip(cols, grow))}')
            print(f'  row {i}: oracle={dict(zip(cols, wrow))}')
            shown += 1
            if shown >= limit:
                break


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
