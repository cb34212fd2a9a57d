"""Incremental materialized aggregates (pipelines/mv.py): correctness
vs a direct aggregate of the lake, and the incrementality property —
a refresh after a commit re-reads ONLY the buckets that commit touched.
"""

import os

import pandas as pd

from plugin_debezium_ray.config import CaptureConfig
from plugin_debezium_ray.pipelines.mv import MaterializedAggregate
from plugin_debezium_ray.pipelines.replay import ReplayJob
from plugin_debezium_ray.sources.binlog import binlog


def _direct(job) -> dict:
    df = job.read_table().to_pandas()
    g = df.groupby("lang", dropna=False)["lsn"].agg(["count", "sum"])
    return {
        (k if isinstance(k, str) else None): (int(c), int(s))
        for k, (c, s) in g.iterrows()
    }


def _as_map(rows) -> dict:
    return {r["lang"]: (r["n_rows"], r["total"]) for r in rows}


def test_mv_matches_direct_and_is_incremental(tmp_path):
    job = ReplayJob(CaptureConfig(num_buckets=8), str(tmp_path))
    mv = MaterializedAggregate(str(tmp_path), group_col="lang",
                               sum_col="lsn")

    job.run(binlog(2000, 300, seed=4), ddl_source=False)
    rows1 = mv.refresh()
    first_recomputed = mv.last_recomputed
    assert first_recomputed > 0  # cold cache: everything computed
    assert _as_map(rows1) == _direct(job)

    # a SMALL second commit (few keys → few touched buckets)
    job.run(binlog(40, 5, seed=9, base_lsn=1_000_000), ddl_source=False)
    m = job.ckpt.restore()
    touched = sum(1 for b in m["buckets"].values()
                  if f"/v{m['version']:06d}/" in b["path"].replace(
                      os.sep, "/"))
    rows2 = mv.refresh()
    assert _as_map(rows2) == _direct(job)
    # incrementality: only the rewritten buckets were re-read
    assert mv.last_recomputed == touched
    assert mv.last_recomputed < first_recomputed

    # a refresh with NO new commit reads nothing at all
    rows3 = mv.refresh()
    assert mv.last_recomputed == 0
    assert _as_map(rows3) == _as_map(rows2)


def test_mv_cache_loss_degrades_to_full_recompute(tmp_path):
    job = ReplayJob(CaptureConfig(num_buckets=4), str(tmp_path))
    job.run(binlog(500, 80, seed=7), ddl_source=False)
    mv = MaterializedAggregate(str(tmp_path), group_col="lang")
    rows = mv.refresh()
    os.unlink(mv.cache_path)  # torn/lost cache is advisory, not state
    mv2 = MaterializedAggregate(str(tmp_path), group_col="lang")
    assert _as_map2(mv2.refresh()) == _as_map2(rows)
    assert mv2.last_recomputed > 0


def _as_map2(rows) -> dict:
    return {r["lang"]: r["n_rows"] for r in rows}


def test_mv_empty_lake(tmp_path):
    mv = MaterializedAggregate(str(tmp_path), group_col="lang")
    assert mv.refresh() == []
    assert mv.last_recomputed == 0


def test_mv_streaming_engine(tmp_path):
    """The actor-pool (streaming) apply writes the same manifest
    contract, so the MV maintains over it identically."""
    job = ReplayJob(CaptureConfig(num_buckets=8), str(tmp_path))
    job.run_streaming(binlog(3000, 300, seed=13))
    mv = MaterializedAggregate(str(tmp_path), group_col="lang",
                               sum_col="lsn")
    assert _as_map(mv.refresh()) == _direct(job)
