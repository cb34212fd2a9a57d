"""Crash recovery and incremental-fingerprint consistency.

The atomic-commit contract: bucket data files may exist on disk without
a manifest pointing at them (crash between data write and commit) — they
must be invisible, and a rerun must converge to the same committed state
(AtomicStateTest semantics applied end-to-end)."""

import hashlib
import json
import os
import shutil

from plugin_debezium_ray.config import CaptureConfig
from plugin_debezium_ray.pipelines.replay import ReplayJob
from plugin_debezium_ray.sources.binlog import binlog, oracle_apply


def _fp_of(job):
    m = job.ckpt.restore()
    return {b: v["fingerprint"] for b, v in m["buckets"].items()}


def test_incremental_fingerprint_equals_full(tmp_path):
    """fp after (apply A; apply B) == fp after apply(A ∪ B) — the XOR
    algebra must agree with a from-scratch digest of the same state."""
    a = binlog(1500, 120, seed=31)
    b = binlog(800, 120, seed=32, base_lsn=10_000)
    j1 = ReplayJob(CaptureConfig(num_buckets=8), str(tmp_path / "inc"))
    j1.run(a, ddl_source=False)
    j1.run(b, ddl_source=False)  # incremental XOR path

    j2 = ReplayJob(CaptureConfig(num_buckets=8), str(tmp_path / "full"))
    j2.run(a.union(b), ddl_source=False)  # full digest path
    assert _fp_of(j1) == _fp_of(j2)

    # and final tables match row-for-row
    t1 = j1.read_table().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    t2 = j2.read_table().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert t1.equals(t2)


def test_crash_between_data_write_and_commit(tmp_path):
    """Simulate: v2 bucket files written, manifest commit lost. The lake
    must still serve v1; rerunning the same tail must converge to the
    correct v2 with byte-identical deterministic files."""
    lake = str(tmp_path)
    base = binlog(1200, 100, seed=41)
    tail = binlog(600, 100, seed=42, base_lsn=50_000)
    job = ReplayJob(CaptureConfig(num_buckets=8), lake)
    job.run(base, ddl_source=False)
    v1_rows = job.read_table().count()

    # run v2 normally, then roll the COMMIT back (leave v2 data orphaned)
    job.run(tail, ddl_source=False)
    v2_hashes = {
        b: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for b, p in job.ckpt.bucket_paths().items()
    }
    meta = os.path.join(lake, "_meta")
    os.remove(os.path.join(meta, "manifest-v000002.json"))
    with open(os.path.join(meta, "CURRENT"), "w") as f:
        f.write("1")

    # crashed state: v1 visible, v2 files orphaned on disk
    job_after = ReplayJob(CaptureConfig(num_buckets=8), lake)
    assert job_after.ckpt.current_version() == 1
    assert job_after.read_table().count() == v1_rows

    # recovery: rerun the same tail → identical v2, byte-for-byte
    res = job_after.run(tail, ddl_source=False)
    assert res.version == 2 and res.events_seen == 600
    new_hashes = {
        b: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for b, p in job_after.ckpt.bucket_paths().items()
    }
    assert new_hashes == v2_hashes

    # parity with the oracle over the full log
    oracle = {}
    oracle.update(oracle_apply(1200, 100, seed=41, include_snapshot=False))
    # second segment has a different seed: replay it on top
    tail_state = oracle_apply(600, 100, seed=42, include_snapshot=False,
                              base_lsn=50_000)
    oracle.update(tail_state)
    # deletions in the tail remove keys from the base state
    import numpy as np

    from plugin_debezium_ray.sources.binlog import _keys_of, _ops_of
    from plugin_debezium_ray.sources.source_table import key_of_index

    ev = np.arange(600, dtype=np.int64)
    ops = _ops_of(42, ev)
    kidx = _keys_of(42, ev, 100, False)
    krepo, kpath = key_of_index(42, kidx, max(1, 100 // 50))
    for i in range(600):
        if ops[i] == "d":
            k = (krepo[i], kpath[i])
            if k not in tail_state:
                oracle.pop(k, None)
    got = job_after.read_table().to_pandas()
    eng = {(r.repo, r.path): r.content for r in got.itertuples()}
    assert set(eng) == set(oracle)


def test_streaming_crash_between_data_write_and_commit(tmp_path):
    """Same crash contract on the STREAMING apply: orphaned v2 bucket
    files are invisible (manifest-gated), and a streaming rerun of the
    same tail converges to byte-identical v2 files."""
    lake = str(tmp_path)
    base = binlog(1200, 100, seed=41)
    tail = binlog(600, 100, seed=42, base_lsn=50_000)
    job = ReplayJob(CaptureConfig(num_buckets=8), lake)
    job.run_streaming(base)
    v1_rows = job.read_table().count()

    job.run_streaming(tail)
    v2_hashes = {
        b: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for b, p in job.ckpt.bucket_paths().items()
    }
    meta = os.path.join(lake, "_meta")
    os.remove(os.path.join(meta, "manifest-v000002.json"))
    with open(os.path.join(meta, "CURRENT"), "w") as f:
        f.write("1")

    job_after = ReplayJob(CaptureConfig(num_buckets=8), lake)
    assert job_after.ckpt.current_version() == 1
    assert job_after.read_table().count() == v1_rows

    res = job_after.run_streaming(tail)
    assert res.version == 2 and res.events_seen == 600
    new_hashes = {
        b: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for b, p in job_after.ckpt.bucket_paths().items()
    }
    assert new_hashes == v2_hashes
