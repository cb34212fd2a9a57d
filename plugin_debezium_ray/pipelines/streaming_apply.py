"""Streaming actor-pool apply — the barrier-free merge path.

The default apply (`ReplayJob.run`) routes events to buckets with ONE
sort-based ``groupby`` — correct and spill-friendly, but the sort is a
barrier: no merge work starts until every decode task finishes, and
utilization dips at every commit boundary.

This module implements the architecture SURVEY.md §7.1 sketches
directly: a pool of ``MergeShard`` **actors**, each owning a contiguous
bucket range.  Decode tasks (plain ``map_batches``) pre-reduce their
batch and push each shard's slice to it **as the stream flows** — no
all-to-all barrier, no sort.  Correctness rests on LWW being
order-independent: the winner per key is the max ``(lsn, seq)`` event,
so shards may receive batches in any order, from any segment, and
retried tasks may re-send (duplicate (lsn, seq) events collapse in the
winner reduction; events at-or-below the ledger are dropped at
finalize).  Shards compact incrementally (winner-reduce their
accumulated slices) whenever buffered rows exceed a threshold, so
steady-state memory per shard is O(its share of live keys), not O(its
share of the stream).

Finalize reuses ``BucketMerge`` per bucket — identical deterministic
bucket files, fingerprints and manifest as the sort path, so resume /
rerun / read_table are interchangeable between the two paths.

At cluster scale each shard is one actor (pin ``num_shards`` ≈ total
cores; Ray spreads them across nodes); backpressure comes from decode
tasks awaiting their pushes before finishing a batch.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from plugin_debezium_ray.config import CaptureConfig
from plugin_debezium_ray.stages.apply import (
    BUCKET_COL,
    WEIGHT_COL,
    BucketMerge,
    _composite_key,
    _winners_and_weights,
    project_for_apply,
)
from plugin_debezium_ray.state.checkpoint import build_manifest


# per-lane seed constants (golden-ratio / xxhash-prime style odd values):
# distinct seeds per (lane, column) make the two lanes genuinely
# independent mixes.  NOTE: pd.util.hash_array's ``hash_key`` is IGNORED
# for numeric dtypes (it only keys the object-array path), so "two
# hash_array calls with different keys" would yield bit-identical lanes —
# splitmix64 with explicit seeds is the correct keyed primitive here.
_LANE_SEEDS = (
    (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xD6E8FEB86659FD93)),
    (np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(0x165667B19E3779F9)),
)


def _push_lanes(lsn_np: np.ndarray, seq_np: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit keyed-hash lanes per (lsn, seq) row, for
    content-addressed push ids.  lsn and seq are mixed SEPARATELY
    (splitmix64 under distinct per-lane seeds) and combined with a
    rotation, so the pair encoding is not subject to the non-injectivity
    of an arithmetic combine (``lsn*P + seq`` aliases once seq ≥ P)."""
    from plugin_debezium_ray.sources.rand import splitmix64

    lsn_u = lsn_np.astype(np.uint64)
    seq_u = seq_np.astype(np.uint64)
    lanes = []
    for lseed, sseed in _LANE_SEEDS:
        hl = splitmix64(lsn_u ^ lseed)
        hs = splitmix64(seq_u ^ sseed)
        lanes.append(hl ^ ((hs << np.uint64(17)) | (hs >> np.uint64(47))))
    return lanes[0], lanes[1]


def _slice_push_id(
    lane_a: np.ndarray, lane_b: np.ndarray,
    lsn_np: np.ndarray, idx: np.ndarray,
) -> tuple[int, int, int, int, int]:
    """Deterministic id of one pushed slice: (rows, min_lsn, max_lsn,
    xor of lane a, xor of lane b).  The XOR fold alone loses set
    structure, so the id also carries structural fields; a collision
    between two distinct slices bound for the same shard requires both
    128 hash bits AND the (rows, lsn-range) tuple to agree — ~2^-128 per
    pair, and identical on a Ray task retry (the exactly-once property)."""
    lsn_sel = lsn_np[idx]
    return (
        int(len(idx)),
        int(lsn_sel.min()),
        int(lsn_sel.max()),
        int(np.bitwise_xor.reduce(lane_a[idx])),
        int(np.bitwise_xor.reduce(lane_b[idx])),
    )


def make_decode_push(proj, shards, shard_of: np.ndarray):
    """Shared decode-task body of the push shuffle: project/pre-reduce a
    batch, slice it by owning shard (one stable argsort + searchsorted),
    and push each slice with its content-addressed id; the task completes
    only after every push is owned by its shard (backpressure + retry
    safety).  Used by ``run_streaming``, ``run_streaming_segments`` and
    the multi-table single pass."""

    def decode_and_push(t: pa.Table) -> pa.Table:
        out = proj(t)
        n = len(out)
        if n:
            buckets = out[BUCKET_COL].to_numpy()
            sid = shard_of[buckets]
            order = np.argsort(sid, kind="stable")
            cuts = np.searchsorted(
                sid[order], np.arange(len(shards) + 1), side="left"
            )
            lsn_np = out["lsn"].to_numpy()
            seq_np = out["seq"].to_numpy()
            lane_a, lane_b = _push_lanes(lsn_np, seq_np)
            refs = []
            for s in range(len(shards)):
                if cuts[s + 1] > cuts[s]:
                    idx = order[cuts[s] : cuts[s + 1]]
                    sl = out.take(pa.array(idx))
                    pid = _slice_push_id(lane_a, lane_b, lsn_np, idx)
                    refs.append(shards[s].ingest.remote(sl, pid))
            ray.get(refs)
        return pa.table({"n": pa.array([n], pa.int64())})

    return decode_and_push


@ray.remote
class MergeShard:
    """Owns buckets ``[lo, hi)``: accumulates pre-reduced event slices,
    compacts with the LWW winner reduction when buffered rows grow, and
    at finalize merges each bucket with its prior lake state via the
    same ``BucketMerge`` used by the sort path."""

    def __init__(self, key_cols: tuple[str, ...], lo: int, hi: int,
                 compact_rows: int = 400_000,
                 stream_col: str | None = None):
        self.key_cols = tuple(key_cols)
        self.lo, self.hi = lo, hi
        self.tables: list[pa.Table] = []
        self.buffered = 0
        self.events_seen = 0
        self.compact_rows = compact_rows
        self.seen_pushes: set = set()
        # multi-table mode: rows carry a stream column; LWW keys and the
        # finalize grouping include it (one lake table per stream)
        self.stream_col = stream_col

    def ingest(self, t: pa.Table, push_id: tuple | int | None = None) -> int:
        """Accept one pre-reduced slice.  ``push_id`` is a deterministic
        content id of the slice — (rows, min/max lsn, two independent
        64-bit XOR-fold hash lanes of its (lsn, seq) set; see
        ``_slice_push_id``): a RETRIED decode task re-sends identical
        slices, which are dropped here — exactly-once accounting under
        Ray task retries (SURVEY.md §7.4 #1).  Distinct slices collide
        with probability ~2^-128 per pair (not never: an XOR fold is not
        injective, so the id also carries row-count and lsn-range).
        ``seen_pushes`` grows one entry per decode-task push between
        commits — ≈ segment_events / batch_size / num_shards entries —
        and is cleared at each ``finalize``: the decode stream's
        ``sum("n")`` barrier completes before finalize runs, so no task
        of a committed segment can retry afterwards, which bounds the
        set for arbitrarily long multi-commit sessions
        (``run_streaming_segments``)."""
        if push_id is not None:
            if push_id in self.seen_pushes:
                return 0
            self.seen_pushes.add(push_id)
        if len(t):
            self.tables.append(t)
            self.buffered += len(t)
            if WEIGHT_COL in t.column_names:
                import pyarrow.compute as pc

                self.events_seen += int(pc.sum(t[WEIGHT_COL]).as_py() or 0)
            else:
                self.events_seen += len(t)
            if self.buffered > self.compact_rows:
                self._compact()
        return 0

    def node_id(self) -> str:
        """Ray node hosting this shard (placement evidence: with the
        SPREAD strategy, shards of one pool land across cluster nodes)."""
        return ray.get_runtime_context().get_node_id()

    def counters(self) -> dict:
        """ST6-style shard metrics (events seen, distinct pushes,
        buffered rows)."""
        return {
            "events_seen": self.events_seen,
            "pushes": len(self.seen_pushes),
            "buffered": self.buffered,
        }

    def _lww_key(self, merged: pa.Table) -> np.ndarray:
        key = _composite_key(merged, self.key_cols)
        if self.stream_col is not None:
            streams = merged[self.stream_col].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            key = np.char.add(
                np.char.add(streams.astype(str), "\x1e"), key.astype(str)
            )
        return key

    def _compact(self) -> None:
        merged = pa.concat_tables(self.tables, promote_options="default")
        key = self._lww_key(merged)
        win, _ = _winners_and_weights(
            key, merged["lsn"].to_numpy(), merged["seq"].to_numpy()
        )
        # winners carry the SUM of subsumed rows' weights (rows arriving
        # here are already pre-reduced, so counts would under-report)
        codes, _ = pd.factorize(key, use_na_sentinel=False)
        w = merged[WEIGHT_COL].to_numpy()
        weights = np.bincount(codes, weights=w)[codes[win]].astype(np.int64)
        out = merged.take(pa.array(win))
        i = out.column_names.index(WEIGHT_COL)
        out = out.set_column(i, WEIGHT_COL, pa.array(weights, type=pa.int64()))
        self.tables = [out]
        self.buffered = len(out)

    def finalize(
        self,
        out_dir: str,
        commit_id: str,
        *,
        prior_paths: dict[int, str],
        prior_fingerprints: dict[int, str],
        ledger: dict[int, tuple[int, int]],
        fingerprint_col: str | None,
        renames: dict[str, str] | None = None,
    ) -> list[dict]:
        """Merge each owned bucket with prior state, write bucket files,
        return the stats rows (same schema as the sort path)."""
        # commit boundary: the caller's decode barrier has completed, so
        # no push of this segment can retry — the dedup set restarts
        # (bounds seen_pushes for long multi-commit sessions) and the
        # events_seen counter rolls over to per-segment accounting
        self.seen_pushes.clear()
        self.events_seen = 0
        if not self.tables:
            return []
        merged = pa.concat_tables(self.tables, promote_options="default")
        self.tables = []
        self.buffered = 0  # pool may live on across commits (soak runs)
        bm = BucketMerge(
            self.key_cols,
            out_dir,
            commit_id,
            prior_paths=prior_paths,
            prior_fingerprints=prior_fingerprints,
            ledger=ledger,
            fingerprint_col=fingerprint_col,
            renames=renames,
        )
        buckets = merged[BUCKET_COL].to_numpy()
        stats_rows: list[dict] = []
        for b in np.unique(buckets):
            group = merged.filter(pa.array(buckets == b))
            stats = bm(group)  # per-bucket merge + deterministic file
            stats_rows.append(
                {c: stats[c][0].as_py() for c in stats.column_names}
            )
        return stats_rows

    def finalize_multi(
        self,
        per_stream: dict[str, dict],
        *,
        fingerprint_col: str | None,
    ) -> list[dict]:
        """Multi-table finalize: group owned rows by (stream, bucket)
        and merge each into ITS stream's lake (per-stream out_dir /
        commit / prior state / ledger — the per-table topic model).
        Returns stats rows tagged with ``stream``."""
        self.seen_pushes.clear()  # same commit-boundary bound as finalize
        self.events_seen = 0
        if not self.tables or self.stream_col is None:
            return []
        merged = pa.concat_tables(self.tables, promote_options="default")
        self.tables = []
        self.buffered = 0
        streams = merged[self.stream_col].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        stats_rows: list[dict] = []
        for stream in np.unique(streams):
            cfg = per_stream.get(str(stream))
            if cfg is None:
                continue
            sub = merged.filter(pa.array(streams == stream)).drop_columns(
                [self.stream_col]
            )
            bm = BucketMerge(
                self.key_cols,
                cfg["out_dir"],
                cfg["commit_id"],
                prior_paths=cfg["prior_paths"],
                prior_fingerprints=cfg["prior_fingerprints"],
                ledger=cfg["ledger"],
                fingerprint_col=fingerprint_col,
            )
            buckets = sub[BUCKET_COL].to_numpy()
            for b in np.unique(buckets):
                stats = bm(sub.filter(pa.array(buckets == b)))
                row = {c: stats[c][0].as_py() for c in stats.column_names}
                row["stream"] = str(stream)
                stats_rows.append(row)
        return stats_rows


def run_streaming(
    job,
    envelopes: "ray.data.Dataset",
    *,
    snapshot: "ray.data.Dataset | None" = None,
    ddl_source: "ray.data.Dataset | bool | None" = False,
    num_shards: int | None = None,
    decode_concurrency: int | None = None,
    compact_rows: int = 400_000,
    estimated_events: int | None = None,
    small_job_threshold: int = 500_000,
) -> "object":
    """Barrier-free replay: decode tasks push pre-reduced slices to the
    shard actors while the stream flows; ONE atomic commit at the end.

    ``job`` is a ``ReplayJob`` (layout / checkpoint / config reuse); the
    result is a ``ReplayResult`` interchangeable with ``job.run(...)``.

    ``ddl_source`` mirrors ``ReplayJob.run``: a column-pruned Dataset to
    replay schema-history DDL from BEFORE the stream applies (ST3);
    ``False`` (default) skips the scan for DDL-free sources; ``None``
    derives from ``envelopes`` (un-pruned — prefer passing the pruned
    read).

    ``estimated_events``: a cheap caller-side size hint (parquet
    metadata row count — NOT ``ds.count()``, which would execute a
    transformed pipeline twice).  Below ``small_job_threshold`` the job
    delegates to the sort-path ``job.run`` — the shard-actor startup and
    the two ``ray.get`` barriers dominate tiny inputs (measured 1.59 s
    vs 0.90 s on a 120-row final table), while the streaming engine wins
    8.7× at 50M events.  Identical lake layout either way."""
    if (
        estimated_events is not None
        and estimated_events < small_job_threshold
    ):
        return job.run(envelopes, snapshot=snapshot, ddl_source=ddl_source)
    from plugin_debezium_ray.pipelines.replay import ReplayResult
    from plugin_debezium_ray.state.schema_registry import (
        SchemaRegistry,
        registry_from_envelopes,
    )
    from plugin_debezium_ray.envelope import payload_fields_of

    t0 = time.monotonic()
    cfg: CaptureConfig = job.cfg
    ckpt = job.ckpt
    parent = ckpt.restore()
    ledger = ckpt.ledger() if parent else {}
    prior_paths = ckpt.bucket_paths() if parent else {}
    prior_fps = ckpt.bucket_fingerprints() if parent else {}
    version = (int(parent["version"]) + 1) if parent else 1

    sch = envelopes.schema()
    fields = pa.schema([pa.field(n, t) for n, t in zip(sch.names, sch.types)])
    base_fields = [(f.name, str(f.type)) for f in payload_fields_of(fields)]
    if ddl_source is False:
        reg = (
            SchemaRegistry.from_snapshot(parent["schema"])
            if (parent or {}).get("schema")
            else SchemaRegistry(base_fields)
        )
    else:
        reg = registry_from_envelopes(
            ddl_source if ddl_source is not None else envelopes,
            base_fields,
            prior_snapshot=(parent or {}).get("schema"),
            max_lsn=cfg.max_lsn,
        )

    shards, shard_of = _make_shard_pool(cfg, num_shards, compact_rows)

    ds = envelopes
    if cfg.max_records is not None:
        ds = ds.limit(cfg.max_records)
    if snapshot is not None and parent is None:
        ds = snapshot.union(ds)
    try:
        return _stream_one_commit(
            job, shards, shard_of, ds, reg,
            parent=parent, ledger=ledger, prior_paths=prior_paths,
            prior_fps=prior_fps, version=version,
            decode_concurrency=decode_concurrency, t0=t0,
        )
    finally:
        for s in shards:
            ray.kill(s)


def _make_shard_pool(
    cfg: CaptureConfig, num_shards: int | None, compact_rows: int,
    stream_col: str | None = None,
):
    """The MergeShard pool + bucket→shard routing table (shared by
    ``run_streaming`` and ``run_streaming_segments``)."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_shards is None:
        num_shards = max(2, min(cfg.num_buckets, cpus))
    per = (cfg.num_buckets + num_shards - 1) // num_shards
    # shards are lightweight during ingest; fractional CPU keeps slots
    # free for decode until finalize needs them
    shards = [
        MergeShard.options(
            # SPREAD: one pool's shards land across cluster nodes (the
            # multi-node claim of the design, streaming_apply.py:26-28)
            num_cpus=0.5, scheduling_strategy="SPREAD",
        ).remote(
            cfg.key_cols, lo, min(lo + per, cfg.num_buckets),
            compact_rows=compact_rows, stream_col=stream_col,
        )
        for lo in range(0, cfg.num_buckets, per)
    ]
    return shards, np.arange(cfg.num_buckets) // per


def _stream_one_commit(
    job,
    shards: list,
    shard_of: np.ndarray,
    seg: "ray.data.Dataset",
    reg,
    *,
    parent: dict | None,
    ledger: dict,
    prior_paths: dict,
    prior_fps: dict,
    version: int,
    decode_concurrency: int | None,
    t0: float | None = None,
    extra_metrics: dict | None = None,
) -> "object":
    """Drive ONE segment through the shard pool and commit atomically:
    decode+push stream → per-shard finalize → manifest save.  The single
    per-commit engine behind both streaming entry points (the pool
    outlives the call; the caller owns its lifecycle)."""
    from plugin_debezium_ray.pipelines.replay import ReplayResult

    cfg: CaptureConfig = job.cfg
    if t0 is None:
        t0 = time.monotonic()
    proj = project_for_apply(
        cfg.key_cols,
        cfg.num_buckets,
        ledger=ledger,
        max_lsn=cfg.max_lsn,
        renames=reg.rename_map(),
        added_columns=reg.added_columns(),
    )
    decode_and_push = make_decode_push(proj, shards, shard_of)
    map_kw = {}
    if decode_concurrency is not None:
        map_kw["concurrency"] = decode_concurrency
    t_decode = time.monotonic()
    seg.map_batches(
        decode_and_push, batch_format="pyarrow", batch_size=cfg.batch_size,
        **map_kw,
    ).sum("n")  # drives the stream; returns one scalar
    decode_seconds = time.monotonic() - t_decode

    data_dir = os.path.join(job.table_dir, "data")
    commit_id = f"v{version:06d}"
    t_final = time.monotonic()
    stats_refs = [
        s.finalize.remote(
            data_dir,
            commit_id,
            prior_paths=prior_paths,
            prior_fingerprints=prior_fps,
            ledger=ledger,
            fingerprint_col=job.fingerprint_col,
            renames=reg.rename_map(),
        )
        for s in shards
    ]
    stats_rows = [r for rows in ray.get(stats_refs) for r in rows]
    finalize_seconds = time.monotonic() - t_final
    # placement lineage: distinct Ray nodes hosting the shard pool (the
    # SPREAD strategy's multi-node evidence, recorded per commit)
    shard_nodes = len(set(ray.get([s.node_id.remote() for s in shards])))

    manifest = build_manifest(
        version=version,
        connector_id=job.connector_id,
        stats_rows=stats_rows,
        parent=parent,
        schema_snapshot=reg.snapshot(),
        extra_metrics={
            "wall_seconds": time.monotonic() - t0,
            # phase latencies (per-commit lineage): stream-drive vs
            # shard finalize — small jobs are finalize/startup-bound,
            # large jobs decode-bound
            "decode_seconds": round(decode_seconds, 4),
            "finalize_seconds": round(finalize_seconds, 4),
            "streaming_apply": True,
            "num_shards": len(shards),
            "shard_nodes": shard_nodes,
            **(extra_metrics or {}),
        },
    )
    mpath = job.ckpt.save(manifest)
    return ReplayResult(
        version,
        int(manifest["metrics"]["events_applied"]),
        int(manifest["metrics"]["events_seen"]),
        int(manifest["metrics"]["buckets_touched"]),
        mpath,
        job.table_dir,
        time.monotonic() - t0,
        metrics=manifest["metrics"],
    )


class StreamingSession:
    """Persistent actor-pool apply session: ONE long-lived shard pool,
    one atomic manifest commit per ``apply_segment`` call — the engine
    a continuous ingester (``ReplayJob.follow_apply``) keeps open for
    its whole lifetime instead of paying shard-actor startup per
    arrival batch.

    ``ddl_source``: ``False`` (default) carries each commit's schema
    registry forward from the prior snapshot (DDL-free sources skip the
    scan); ``None`` replays DDL found in EACH segment into the registry
    before that segment applies — mid-session schema evolution, same ST3
    contract as ``run_segments`` on the sort path.

    The pool survives across commits (the multi-commit soak surface):
    ``seen_pushes``/``events_seen`` reset at each commit boundary,
    incremental compaction keeps running, and each ``finalize`` drains
    the buffered rows into that segment's commit.  State after N commits
    is identical to N separate ``run_streaming`` calls (and to the sort
    path) — same lake bytes, same manifest-chain semantics.

    Per-commit work is the SAME engine as ``run_streaming``
    (``_stream_one_commit``) — only the pool lifecycle and the
    per-segment checkpoint restore differ.  Use as a context manager
    (``close()`` kills the shard actors)."""

    def __init__(
        self,
        job,
        *,
        num_shards: int | None = None,
        decode_concurrency: int | None = None,
        compact_rows: int = 400_000,
        ddl_source: "bool | None" = False,
    ):
        self.job = job
        self.cfg: CaptureConfig = job.cfg
        self.ckpt = job.ckpt
        self.decode_concurrency = decode_concurrency
        self.ddl_source = ddl_source
        self.shards, self.shard_of = _make_shard_pool(
            self.cfg, num_shards, compact_rows
        )
        self.commits = 0
        self._closed = False

    def apply_segment(self, seg) -> "object":
        """Stream one WAL segment through the live pool and commit it
        atomically; returns that commit's ``ReplayResult``."""
        if self._closed:
            raise RuntimeError("StreamingSession is closed")
        from plugin_debezium_ray.state.schema_registry import (
            SchemaRegistry,
            registry_from_envelopes,
        )
        from plugin_debezium_ray.envelope import payload_fields_of

        cfg, ckpt = self.cfg, self.ckpt
        parent = ckpt.restore()
        ledger = ckpt.ledger() if parent else {}
        prior_paths = ckpt.bucket_paths() if parent else {}
        prior_fps = ckpt.bucket_fingerprints() if parent else {}
        version = (int(parent["version"]) + 1) if parent else 1

        sch = seg.schema()
        fields = pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        )
        base_fields = [
            (f.name, str(f.type)) for f in payload_fields_of(fields)
        ]
        if self.ddl_source is False:
            reg = (
                SchemaRegistry.from_snapshot(parent["schema"])
                if (parent or {}).get("schema")
                else SchemaRegistry(base_fields)
            )
        else:
            # replay this segment's DDL sub-stream into the registry
            # BEFORE its data applies (per-segment schema evolution)
            reg = registry_from_envelopes(
                seg,
                base_fields,
                prior_snapshot=(parent or {}).get("schema"),
                max_lsn=cfg.max_lsn,
            )
        self.commits += 1
        return _stream_one_commit(
            self.job, self.shards, self.shard_of, seg, reg,
            parent=parent, ledger=ledger, prior_paths=prior_paths,
            prior_fps=prior_fps, version=version,
            decode_concurrency=self.decode_concurrency,
            extra_metrics={"streaming_session_commit": self.commits},
        )

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            for s in self.shards:
                ray.kill(s)

    def __enter__(self) -> "StreamingSession":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def run_streaming_segments(
    job,
    segments: "list",
    *,
    num_shards: int | None = None,
    decode_concurrency: int | None = None,
    compact_rows: int = 400_000,
    ddl_source: "bool | None" = False,
) -> "list":
    """ON_EACH_BATCH commit cadence on the streaming engine: N WAL
    segments flow through ONE long-lived shard pool with an atomic
    manifest commit after each segment (the reference's per-batch offset
    commit, `AbstractDebeziumTask.java:640-693`, on the actor-pool path —
    the sort/pipelined paths already had it via ``run_segments``).
    Thin wrapper over ``StreamingSession`` for a segment list known
    upfront."""
    with StreamingSession(
        job,
        num_shards=num_shards,
        decode_concurrency=decode_concurrency,
        compact_rows=compact_rows,
        ddl_source=ddl_source,
    ) as session:
        return [session.apply_segment(seg) for seg in segments]
