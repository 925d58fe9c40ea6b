"""Job-entry surrogate: the flagship CLI must run as its own process (the
``ray job submit -- python -m auto_featurs_ray.pipelines.flagship ...`` path;
the sandbox has no job server, so the subprocess IS the submitted driver),
write the checkpointed partitioned sink, and report metrics JSON.
"""

import glob
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_flagship_cli_runs_and_writes_sink(tmp_path):
    from auto_featurs_ray.fixtures import write_sequence_dataset
    root = write_sequence_dataset(str(tmp_path / 'f6'), num_shards=2, docs_per_shard=50, seed=7)
    out_dir = str(tmp_path / 'out')
    env = dict(os.environ, PYTHONPATH=str(REPO), RAY_ADDRESS='local')
    proc = subprocess.run(
        [sys.executable, '-m', 'auto_featurs_ray.pipelines.flagship',
         '--sequences', os.path.join(root, 'sequences'),
         '--events', os.path.join(root, 'events'),
         '--out', out_dir, '--num-partitions', '4'],
        env=env, capture_output=True, text=True, timeout=300, cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report['rows'] > 0
    assert report['sequences_per_sec'] > 0
    parts = glob.glob(os.path.join(out_dir, 'part-*.parquet'))
    manifests = glob.glob(os.path.join(out_dir, '_manifest', '*.json'))
    assert parts and manifests
    # lineage metrics present per partition
    manifest = json.load(open(manifests[0]))
    assert {'rows', 'sha256', 'wall_time_s'} <= set(manifest)


def test_bench_query_list_is_valid():
    """Every BENCH_QUERIES name must exist in the registry — a typo would
    crash the driver's per-round benchmark run."""
    import importlib.util

    from auto_featurs_ray.queries import QUERIES

    spec = importlib.util.spec_from_file_location(
        'bench', os.path.join(os.path.dirname(os.path.dirname(__file__)), 'bench.py'))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [q for q in bench.BENCH_QUERIES if q not in QUERIES]
    assert not missing, missing
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_driver_window_composition():
    """The first 50 QUERIES (the driver correctness window) must all carry
    oracles, and the round-5 / previously-unattested queries must be inside."""
    from auto_featurs_ray.queries import ORACLE_SQL, QUERIES

    window = list(QUERIES)[:50]
    missing_oracles = [q for q in window if q not in ORACLE_SQL and q != 'resumable_sink']
    assert not missing_oracles, missing_oracles
    for must in ('global_cumulative_orderstats_events', 'weighted_share_lineitem',
                 'minhash_dedup_documents', 'fingerprint_documents',
                 'token_ops', 'flagship_tokens', 'approx_distinct_events'):
        assert must in window, must
