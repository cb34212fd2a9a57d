"""Multi-table capture: one envelope stream → one lake table per source
table (the reference's per-table output streams, `ChangeConsumer.java:162-177`,
applied to the lake-upsert sink instead of files).

The reference holds one open file per stream and appends as events
arrive; our equivalent maintains one bucketed lake table per
``db.table`` stream, each with its own manifest/ledger/schema registry —
so per-table schema evolution and per-table resume stay independent
(mirroring Debezium's per-table topic model).

Physical plan: discover streams with ONE column-pruned pass, then run a
filtered replay per stream.  Each pass prunes at the read when given
paths (predicate on source.table is applied after decode of only the
needed columns).  For many-table sources the next optimization step is a
single shared shuffle keyed on (stream, bucket); the per-stream loop is
the correctness-first layout (few tables per job is the common case —
the reference defaults to table include-lists).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

import numpy as np
import pandas as pd

from plugin_debezium_ray.config import CaptureConfig
from plugin_debezium_ray.pipelines.replay import ReplayJob, ReplayResult
from plugin_debezium_ray.stages.apply import (
    APPLY_COLUMNS,
    BUCKET_COL,
    _one_chunk,
    WEIGHT_COL,
    BucketMerge,
    _composite_key,
    _winners_and_weights,
)
from plugin_debezium_ray.state.checkpoint import CheckpointManager, build_manifest

STREAM_COL = "_stream"

# the envelope columns the multi-table apply touches: the keyed apply's
# APPLY_COLUMNS plus the source struct (db/table stream routing) and ddl
# (per-stream schema registries).  Pass
# ``read_parquet(wal, columns=list(MULTI_TABLE_COLUMNS))`` when replaying
# by path — before-images / transaction / ts_ms never leave the footers.
MULTI_TABLE_COLUMNS = (*APPLY_COLUMNS, "source", "ddl")


def discover_streams(
    envelopes: "ray.data.Dataset",
    *,
    included: list[str] | None = None,
    excluded: list[str] | None = None,
) -> list[str]:
    """Distinct ``db.table`` streams, via a pruned scan + tiny distinct.

    include/exclude regex semantics match the capture-time lists
    (`AbstractDebeziumTask.java:583-589`)."""

    def streams(t: pa.Table) -> pa.Table:
        src = t["source"].combine_chunks()
        full = pc.binary_join_element_wise(
            pc.fill_null(src.field("db"), ""),
            pc.fill_null(src.field("table"), ""),
            ".",
        )
        keep = pc.is_valid(t["op"].combine_chunks())
        return pa.table({"stream": full.filter(keep)})

    got = (
        envelopes.select_columns(["op", "source"])
        .map_batches(streams, batch_format="pyarrow")
        .unique("stream")
    )
    names = sorted(x for x in got if x and x != ".")
    inc = [re.compile(p) for p in included or []]
    exc = [re.compile(p) for p in excluded or []]
    return [
        s
        for s in names
        if (not inc or any(r.search(s) for r in inc))
        and not any(r.search(s) for r in exc)
    ]


def replay_multi_table(
    envelopes: "ray.data.Dataset",
    base_dir: str,
    config: CaptureConfig,
    *,
    connector_id: str | None = None,
    snapshot_by_stream: dict[str, "ray.data.Dataset"] | None = None,
) -> dict[str, ReplayResult]:
    """Apply the stream into one lake table per ``db.table``.

    Returns {stream: ReplayResult}.  Each table dir is
    ``{base_dir}/{db}.{table}/`` with its own manifest lineage."""
    streams = discover_streams(
        envelopes,
        included=config.included_tables,
        excluded=config.excluded_tables,
    )
    results: dict[str, ReplayResult] = {}
    for stream in streams:
        db, _, table = stream.partition(".")

        def only_this(t: pa.Table, db=db, table=table) -> pa.Table:
            src = t["source"].combine_chunks()
            keep = pc.and_(
                pc.fill_null(pc.equal(src.field("db"), db), False),
                pc.fill_null(pc.equal(src.field("table"), table), False),
            )
            # DDL rows carry no source; keep them for the schema registry
            keep = pc.or_(keep, pc.is_null(src))
            return t.filter(keep)

        filtered = envelopes.map_batches(only_this, batch_format="pyarrow")
        job = ReplayJob(
            config,
            os.path.join(base_dir, stream),
            connector_id=connector_id,
        )
        snap = (snapshot_by_stream or {}).get(stream)
        results[stream] = job.run(filtered, snapshot=snap)
    return results


# --------------------------------------------------- single-pass variant


def make_project_multi(
    config: CaptureConfig,
    stream_set: set[str],
    ledgers: dict[str, dict],
):
    """Shared multi-table projection: envelope batch → rows with
    ``_stream``, payload, ``_bucket``, ``_weight`` — stream filter,
    per-(stream, bucket) ledger filter and per-(stream, key) LWW
    pre-reduce included.  Used by both the single-pass sort variant and
    the streaming actor-pool variant."""
    key_cols = config.key_cols
    num_buckets = config.num_buckets

    def project_multi(t: pa.Table) -> pa.Table:
        op = t["op"]
        # same op contract as project_for_apply: DDL and keyless op=m
        # message events never reach the keyed apply
        keep = pc.and_(pc.is_valid(op), pc.and_(
            pc.invert(pc.fill_null(pc.equal(op, "ddl"), False)),
            pc.invert(pc.fill_null(pc.equal(op, "m"), False))))
        if config.max_lsn is not None:
            keep = pc.and_(keep, pc.less_equal(t["lsn"], config.max_lsn))
        t = t.filter(keep)
        n = len(t)
        src = _one_chunk(t["source"])
        stream = pc.binary_join_element_wise(
            pc.fill_null(src.field("db"), ""),
            pc.fill_null(src.field("table"), ""),
            ".",
        )
        after = _one_chunk(t["after"])
        ptype = after.type
        cols = dict(
            zip([ptype.field(i).name for i in range(ptype.num_fields)],
                after.flatten())
        )
        key_struct = _one_chunk(t["key"])
        kt = key_struct.type
        kflat = key_struct.flatten()  # honors null key structs (op=m)
        for i in range(kt.num_fields):
            kn = kt.field(i).name
            cols[kn] = (
                pc.coalesce(cols[kn], kflat[i])
                if kn in cols
                else kflat[i]
            )
        out = pa.table(
            {
                STREAM_COL: stream,
                "lsn": _one_chunk(t["lsn"]),
                "seq": _one_chunk(t["seq"]),
                "deleted": pc.fill_null(
                    pc.is_in(t["op"], value_set=pa.array(["d", "t"])), False
                ).combine_chunks()
                if n
                else pa.nulls(0, pa.bool_()),
                **cols,
            }
        )
        # drop rows of non-selected streams (include/exclude lists)
        s_np = stream.to_numpy(zero_copy_only=False)
        sel = np.array([x in stream_set for x in s_np])
        if not sel.all():
            out = out.filter(pa.array(sel))
            s_np = s_np[sel]
        if len(out) == 0:
            return out.append_column(BUCKET_COL, pa.array([], pa.int32())) \
                      .append_column(WEIGHT_COL, pa.array([], pa.int64()))
        key = _composite_key(out, key_cols)
        h = pd.util.hash_array(key.astype(object, copy=False))
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        out = out.append_column(BUCKET_COL, pa.array(bucket))

        # per-(stream, bucket) ledger filter
        lsn = out["lsn"].to_numpy()
        seq = out["seq"].to_numpy()
        led = pd.Series([ledgers.get(s, {}).get(int(b)) for s, b in
                         zip(s_np, bucket)])
        led_lsn = led.map(lambda x: -1 if x is None else x[0]).to_numpy()
        led_seq = led.map(lambda x: -1 if x is None else x[1]).to_numpy()
        keep2 = (lsn > led_lsn) | ((lsn == led_lsn) & (seq > led_seq))
        if not keep2.all():
            out = out.filter(pa.array(keep2))
            key = key[keep2]
            s_np = s_np[keep2]
        if len(out) == 0:
            return out.append_column(WEIGHT_COL, pa.array([], pa.int64()))

        # pre-reduce per (stream, key)
        skey = np.char.add(np.char.add(s_np.astype(str), "\x1e"),
                           key.astype(str))
        win, weights = _winners_and_weights(
            skey, out["lsn"].to_numpy(), out["seq"].to_numpy()
        )
        out = out.take(pa.array(win))
        return out.append_column(WEIGHT_COL, pa.array(weights, type=pa.int64()))

    return project_multi





def replay_multi_table_single_pass(
    envelopes: "ray.data.Dataset",
    base_dir: str,
    config: CaptureConfig,
    *,
    connector_id: str | None = None,
    fingerprint_col: str = "content",
) -> dict[str, ReplayResult]:
    """All tables in ONE pass over the WAL and ONE shared shuffle.

    The per-stream loop of ``replay_multi_table`` re-reads the stream per
    table; here the partition key becomes ``(stream, hash(key) % B)``, so
    a single groupby routes every table's events to its merge groups —
    the minimize-shuffles layout for many-table sources.  Per-stream
    manifests/ledgers stay independent (commits are still per table,
    folded from the shared stats output).

    Constraint (as with the N-pass variant): all tables share one payload
    struct schema in the envelope stream; DDL events are global.
    """
    import time

    t0 = time.monotonic()
    streams = discover_streams(
        envelopes,
        included=config.included_tables,
        excluded=config.excluded_tables,
    )
    ckpts = {
        s: CheckpointManager(os.path.join(base_dir, s)) for s in streams
    }
    parents = {s: ckpts[s].restore() for s in streams}
    versions = {
        s: (int(p["version"]) + 1) if p else 1 for s, p in parents.items()
    }
    ledgers = {s: ckpts[s].ledger() if parents[s] else {} for s in streams}
    prior_paths = {
        s: ckpts[s].bucket_paths() if parents[s] else {} for s in streams
    }
    prior_fps = {
        s: ckpts[s].bucket_fingerprints() if parents[s] else {}
        for s in streams
    }

    stream_set = set(streams)
    key_cols = config.key_cols
    project_multi = make_project_multi(config, stream_set, ledgers)

    applied = envelopes.map_batches(
        project_multi, batch_format="pyarrow", batch_size=config.batch_size
    )

    merges = {
        s: BucketMerge(
            key_cols,
            os.path.join(base_dir, s, "data"),
            f"v{versions[s]:06d}",
            prior_paths=prior_paths[s],
            prior_fingerprints=prior_fps[s],
            ledger=ledgers[s],
            fingerprint_col=fingerprint_col,
        )
        for s in streams
    }

    def merge_group(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return merges[streams[0]](group).append_column(
                "stream", pa.array([], pa.string())
            )
        stream = group[STREAM_COL][0].as_py()
        stats = merges[stream](group.drop_columns([STREAM_COL]))
        return stats.append_column("stream", pa.array([stream]))

    from plugin_debezium_ray.smallfetch import fetch_small_rows

    stats_rows = fetch_small_rows(
        applied.groupby([STREAM_COL, BUCKET_COL])
        .map_groups(merge_group, batch_format="pyarrow")
    )

    results: dict[str, ReplayResult] = {}
    wall = time.monotonic() - t0
    for s in streams:
        rows = [r for r in stats_rows if r.get("stream") == s]
        # single-pass does not replay DDL (global-schema constraint, see
        # docstring) — carry the stream's prior registry snapshot forward
        # so evolution applied by earlier per-stream runs is never lost
        prior_schema = (parents[s] or {}).get("schema") or {
            "fields": [], "log": [], "defaults": {}
        }
        manifest = build_manifest(
            version=versions[s],
            connector_id=connector_id,
            stats_rows=rows,
            parent=parents[s],
            schema_snapshot=prior_schema,
            extra_metrics={"wall_seconds": wall, "single_pass": True},
        )
        mpath = ckpts[s].save(manifest)
        results[s] = ReplayResult(
            versions[s],
            int(manifest["metrics"]["events_applied"]),
            int(manifest["metrics"]["events_seen"]),
            int(manifest["metrics"]["buckets_touched"]),
            mpath,
            os.path.join(base_dir, s),
            wall,
            metrics=manifest["metrics"],
        )
    return results


# --------------------------------------------------- streaming variant


def replay_multi_table_streaming(
    envelopes: "ray.data.Dataset",
    base_dir: str,
    config: CaptureConfig,
    *,
    connector_id: str | None = None,
    fingerprint_col: str = "content",
    num_shards: int | None = None,
    compact_rows: int = 400_000,
) -> dict[str, ReplayResult]:
    """All tables in ONE streaming pass with NO shuffle barrier: the
    multi-table analogue of ``ReplayJob.run_streaming``.

    Decode tasks run the shared multi-table projection and push each
    bucket-range slice (rows of ANY stream) to its ``MergeShard`` actor
    while the scan flows; shards LWW-reduce on (stream, key) and at
    finalize group by (stream, bucket), merging into each stream's OWN
    lake with its own ledger/prior state.  Per-stream manifests commit
    independently, exactly like the sort-based single pass (same layout,
    interchangeable).

    Constraint (as with the other variants): all tables share one payload
    struct schema; DDL is not replayed in-pass (prior registry snapshots
    carry forward)."""
    import time

    import ray

    from plugin_debezium_ray.pipelines.streaming_apply import (
        MergeShard,
        make_decode_push,
    )

    t0 = time.monotonic()
    streams = discover_streams(
        envelopes,
        included=config.included_tables,
        excluded=config.excluded_tables,
    )
    ckpts = {s: CheckpointManager(os.path.join(base_dir, s)) for s in streams}
    parents = {s: ckpts[s].restore() for s in streams}
    versions = {
        s: (int(p["version"]) + 1) if p else 1 for s, p in parents.items()
    }
    ledgers = {s: ckpts[s].ledger() if parents[s] else {} for s in streams}
    prior_paths = {
        s: ckpts[s].bucket_paths() if parents[s] else {} for s in streams
    }
    prior_fps = {
        s: ckpts[s].bucket_fingerprints() if parents[s] else {}
        for s in streams
    }
    project_multi = make_project_multi(config, set(streams), ledgers)

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_shards is None:
        num_shards = max(2, min(config.num_buckets, cpus))
    per = (config.num_buckets + num_shards - 1) // num_shards
    shards = [
        MergeShard.options(
            # SPREAD: one pool's shards land across cluster nodes (the
            # multi-node claim of the design, streaming_apply.py:26-28)
            num_cpus=0.5, scheduling_strategy="SPREAD",
        ).remote(
            config.key_cols, lo, min(lo + per, config.num_buckets),
            compact_rows=compact_rows, stream_col=STREAM_COL,
        )
        for lo in range(0, config.num_buckets, per)
    ]
    shard_of = np.arange(config.num_buckets) // per
    decode_and_push = make_decode_push(project_multi, shards, shard_of)

    envelopes.map_batches(
        decode_and_push, batch_format="pyarrow", batch_size=config.batch_size
    ).sum("n")

    per_stream = {
        s: {
            "out_dir": os.path.join(base_dir, s, "data"),
            "commit_id": f"v{versions[s]:06d}",
            "prior_paths": prior_paths[s],
            "prior_fingerprints": prior_fps[s],
            "ledger": ledgers[s],
        }
        for s in streams
    }
    stats_refs = [
        sh.finalize_multi.remote(per_stream, fingerprint_col=fingerprint_col)
        for sh in shards
    ]
    stats_rows = [r for rows in ray.get(stats_refs) for r in rows]
    for sh in shards:
        ray.kill(sh)

    results: dict[str, ReplayResult] = {}
    wall = time.monotonic() - t0
    for s in streams:
        rows = [r for r in stats_rows if r.get("stream") == s]
        prior_schema = (parents[s] or {}).get("schema") or {
            "fields": [], "log": [], "defaults": {}
        }
        manifest = build_manifest(
            version=versions[s],
            connector_id=connector_id,
            stats_rows=rows,
            parent=parents[s],
            schema_snapshot=prior_schema,
            extra_metrics={"wall_seconds": wall, "streaming_multi": True},
        )
        mpath = ckpts[s].save(manifest)
        results[s] = ReplayResult(
            versions[s],
            int(manifest["metrics"]["events_applied"]),
            int(manifest["metrics"]["events_seen"]),
            int(manifest["metrics"]["buckets_touched"]),
            mpath,
            os.path.join(base_dir, s),
            wall,
            metrics=manifest["metrics"],
        )
    return results
