"""Resumable partitioned parquet sink with per-partition lineage.

"Resumable from checkpoint" for a batch pipeline (north rule): output is laid
out as one deterministic file per hash partition
(``out_dir/part-{id:05d}.parquet``), written atomically (tmp file + rename)
with a manifest entry (``out_dir/_manifest/part-{id:05d}.json``) recording
lineage: partition id, row count, content checksum and wall time.  A re-run
with the same inputs skips every partition whose manifest entry already
exists, so a killed job resumes where it stopped and produces a byte-identical
output set.  Rows are sorted by ``(key_columns, order_by)`` inside each
partition, making the file bytes deterministic regardless of block arrival
order.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from auto_featurs_ray.engine.runtime import sort_partition


def _manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, '_manifest', f'part-{partition_id:05d}.json')


def _data_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f'part-{partition_id:05d}.parquet')


def resumable_write(ds, out_dir: str, *, key_columns: Sequence[str],
                    order_by: Sequence[str] = (), num_partitions: int = 64,
                    fail_after: Optional[int] = None):
    """Write ``ds`` as ``num_partitions`` checkpointed parquet files.

    ``fail_after`` raises after that many fresh partition writes — test hook
    for the kill/resume scenario.  Returns the list of manifest records.
    """
    os.makedirs(os.path.join(out_dir, '_manifest'), exist_ok=True)
    key_columns = list(key_columns)
    order_by = list(order_by)

    def write_partition(table: pa.Table, partition_id: int) -> pa.Table:
        manifest_file = _manifest_path(out_dir, partition_id)
        if os.path.exists(manifest_file):
            with open(manifest_file) as fh:
                record = json.load(fh)
            record['skipped'] = True
            return pa.table({'manifest': [json.dumps(record)]})

        start = time.monotonic()
        table = sort_partition(table, key_columns + order_by)

        data_file = _data_path(out_dir, partition_id)
        tmp_file = data_file + f'.tmp.{os.getpid()}'
        pq.write_table(table, tmp_file)
        with open(tmp_file, 'rb') as fh:
            checksum = hashlib.sha256(fh.read()).hexdigest()
        os.replace(tmp_file, data_file)

        wall = time.monotonic() - start
        record = {
            'partition_id': partition_id,
            'rows': table.num_rows,
            'bytes': os.path.getsize(data_file),
            'sha256': checksum,
            'wall_time_s': round(wall, 4),
            'rows_per_sec': round(table.num_rows / wall, 1) if wall > 0 else None,
            'skipped': False,
        }
        tmp_manifest = manifest_file + f'.tmp.{os.getpid()}'
        with open(tmp_manifest, 'w') as fh:
            json.dump(record, fh)
        os.replace(tmp_manifest, manifest_file)
        return pa.table({'manifest': [json.dumps(record)]})

    from auto_featurs_ray.engine.runtime import shuffle_map_partitions
    job_start = time.monotonic()
    rows = shuffle_map_partitions(ds, key_columns, num_partitions, write_partition).take_all()
    records = [json.loads(r['manifest']) for r in rows]

    if fail_after is not None:
        fresh = [r for r in records if not r.get('skipped')]
        if len(fresh) > fail_after:
            raise RuntimeError(f'injected failure after {fail_after} partitions')

    # job-level lineage summary (north rule: row-count/throughput metrics):
    # totals + run throughput, re-written on every run incl. resumes
    job_wall = time.monotonic() - job_start
    fresh_rows = sum(r['rows'] for r in records if not r.get('skipped'))
    summary = {
        'partitions': len(records),
        'partitions_written': sum(1 for r in records if not r.get('skipped')),
        'partitions_skipped': sum(1 for r in records if r.get('skipped')),
        'rows_total': sum(r['rows'] for r in records),
        'bytes_total': sum(r.get('bytes', 0) for r in records),
        'run_wall_time_s': round(job_wall, 4),
        'run_rows_per_sec': round(fresh_rows / job_wall, 1) if job_wall > 0 else None,
    }
    tmp = os.path.join(out_dir, '_manifest', f'_summary.json.tmp.{os.getpid()}')
    with open(tmp, 'w') as fh:
        json.dump(summary, fh)
    os.replace(tmp, os.path.join(out_dir, '_manifest', '_summary.json'))
    return sorted(records, key=lambda r: r['partition_id'])


def simulate_partial_write(ds, out_dir: str, *, key_columns: Sequence[str],
                           order_by: Sequence[str] = (), num_partitions: int = 64,
                           keep_partitions: int = 2) -> None:
    """Test helper: write everything, then delete all but ``keep_partitions``
    outputs+manifests — the on-disk state of a job killed mid-run."""
    resumable_write(ds, out_dir, key_columns=key_columns, order_by=order_by,
                    num_partitions=num_partitions)
    kept = 0
    for pid in range(num_partitions):
        if not os.path.exists(_manifest_path(out_dir, pid)):
            continue
        if kept < keep_partitions:
            kept += 1
            continue
        os.remove(_manifest_path(out_dir, pid))
        if os.path.exists(_data_path(out_dir, pid)):
            os.remove(_data_path(out_dir, pid))
