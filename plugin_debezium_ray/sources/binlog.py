"""Deterministic simulated binlog/WAL — envelope segments (FIXTURES.md F2).

Plays the role of the Debezium embedded engine source (S1,
`AbstractDebeziumTask.java:185-284`): a totally ordered stream of change
events ``(lsn, seq)`` with op c/u/d (+ injected ddl and op=r snapshot
rows), full before/after images (tombstones disabled at the source —
`AbstractDebeziumTask.java:561-562` — so deletes carry a full before-row).

Every event is a pure function of ``(seed, event_index)``; generation is
distributed via ``ray.data.range → map_batches`` and reproducible at any
parallelism.  ``oracle_apply`` replays the same stream single-threaded in
plain Python — the correctness oracle for sha256 parity (SURVEY.md §5).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

import ray.data

from plugin_debezium_ray.envelope import (
    OP_CREATE,
    OP_DDL,
    OP_DELETE,
    OP_MESSAGE,
    OP_READ,
    OP_TRUNCATE,
    OP_UPDATE,
    envelope_schema,
)
from plugin_debezium_ray.sources.rand import mix, uniform01, zipf_rank
from plugin_debezium_ray.sources.source_table import payload_fields, row_image

_CONNECTOR_VERSION = "0.1.0"
_DB = "lake"
_TABLE = "files"

# op thresholds on uniform01: 15% create, 15% delete, 70% update
_P_CREATE = 0.15
_P_DELETE = 0.30


def _ops_of(
    seed: int,
    ev: np.ndarray,
    p_truncate: float = 0.0,
    p_message: float = 0.0,
) -> np.ndarray:
    """Op per event index.  ``p_truncate``/``p_message`` carve op=t /
    op=m bands out of the update mass (defaults 0 keep every existing
    seed's stream identical); all six reference ops are then exercised
    end-to-end (c/u/d/r from the base stream + snapshot, t/m here)."""
    u = uniform01(seed, ev, stream=10)
    ops = np.full(len(ev), OP_UPDATE, dtype=object)
    ops[u < _P_CREATE] = OP_CREATE
    ops[(u >= _P_CREATE) & (u < _P_DELETE)] = OP_DELETE
    if p_truncate:
        hi = _P_DELETE + p_truncate
        ops[(u >= _P_DELETE) & (u < hi)] = OP_TRUNCATE
    if p_message:
        lo = _P_DELETE + p_truncate
        ops[(u >= lo) & (u < lo + p_message)] = OP_MESSAGE
    return ops


def _keys_of(
    seed: int, ev: np.ndarray, n_keys: int, key_skew: bool,
    hot_key_frac: float = 0.0,
) -> np.ndarray:
    if key_skew:
        idx = zipf_rank(seed, ev, n_keys, stream=11)
    else:
        idx = (mix(seed, ev, stream=11) % np.uint64(n_keys)).astype(np.int64)
    if hot_key_frac:
        # pathological hot-key soak: one single (repo, path) key receives
        # ``hot_key_frac`` of ALL events — the worst case for any
        # key-partitioned apply (a whole-repo hot spot still spreads
        # across buckets because bucketing hashes (repo, path) together;
        # one KEY cannot spread, only pre-reduce saves it)
        hot = uniform01(seed, ev, stream=12) < hot_key_frac
        idx = np.where(hot, np.int64(0), idx)
    return idx


def schema(key_cols: tuple[str, ...] = ("repo", "path")) -> pa.Schema:
    return envelope_schema(payload_fields(), key_cols)


def _source_struct_arrays(n: int, snapshot: bool, ts_ms: np.ndarray, rows: np.ndarray):
    return [
        pa.array([_CONNECTOR_VERSION] * n),
        pa.array(["simwal"] * n),
        pa.array(["kestra_sim"] * n),
        pa.array(ts_ms, type=pa.int64()),
        pa.array(["true" if snapshot else "false"] * n),
        pa.array([_DB] * n),
        pa.array([_TABLE] * n),
        pa.array(rows, type=pa.int64()),
    ]


def _gen_batch(
    ev: np.ndarray,
    *,
    seed: int,
    n_keys: int,
    n_repos: int,
    txn_size: int,
    base_lsn: int,
    key_skew: bool,
    p_truncate: float = 0.0,
    p_message: float = 0.0,
    hot_key_frac: float = 0.0,
) -> pa.Table:
    """Envelope rows for global event indices ``ev`` (vectorized)."""
    n = len(ev)
    ops = _ops_of(seed, ev, p_truncate, p_message)
    key_idx = _keys_of(seed, ev, n_keys, key_skew, hot_key_frac)
    lsn = base_lsn + ev // txn_size
    seq = ev % txn_size
    ts_ms = 1_700_000_000_000 + ev * 13

    # after image: version = ev+1 (monotone with (lsn,seq)); null for
    # deletes/truncates (no new row) and messages (no row at all)
    after = row_image(seed, key_idx, ev + 1, n_repos)
    # before image: synthetic prior-version marker; null for creates/messages
    before = row_image(seed, key_idx, np.maximum(ev, 1) - 1, n_repos)
    is_del = np.isin(ops, (OP_DELETE, OP_TRUNCATE))
    is_create = ops == OP_CREATE
    is_msg = ops == OP_MESSAGE
    after = pa.StructArray.from_arrays(
        after.flatten(), fields=payload_fields(), mask=pa.array(is_del | is_msg)
    )
    before = pa.StructArray.from_arrays(
        before.flatten(), fields=payload_fields(),
        mask=pa.array(is_create | is_msg),
    )

    # key struct must be non-null even when after is null (delete): rebuild.
    # op=m logical-decoding messages are keyless (null key struct) — the
    # reference routes them through format like any envelope
    # (`ChangeConsumer.java:196-213`) but they address no table row.
    from plugin_debezium_ray.sources.source_table import key_of_index

    krepo, kpath = key_of_index(seed, key_idx, n_repos)
    key = pa.StructArray.from_arrays(
        [pa.array(krepo, type=pa.string()), pa.array(kpath, type=pa.string())],
        names=["repo", "path"],
        mask=pa.array(is_msg) if is_msg.any() else None,
    )
    txn = pa.StructArray.from_arrays(
        [
            pa.array([f"txn-{int(l)}" for l in lsn]),
            pa.array(seq, type=pa.int64()),
        ],
        names=["id", "total_order"],
    )
    src = pa.StructArray.from_arrays(
        _source_struct_arrays(n, False, ts_ms, seq), names=[
            "version", "connector", "name", "ts_ms", "snapshot", "db", "table", "row"
        ]
    )
    return pa.Table.from_arrays(
        [
            pa.array(lsn, type=pa.int64()),
            pa.array(seq, type=pa.int64()),
            pa.array(ops, type=pa.string()),
            pa.array(ts_ms, type=pa.int64()),
            before,
            after,
            src,
            key,
            txn,
            pa.nulls(n, pa.string()),  # ddl
        ],
        schema=schema(),
    )


def binlog(
    n_events: int,
    n_keys: int,
    *,
    seed: int = 42,
    n_repos: int | None = None,
    txn_size: int = 4,
    base_lsn: int = 1,
    key_skew: bool = False,
    override_num_blocks: int | None = None,
    p_truncate: float = 0.0,
    p_message: float = 0.0,
    hot_key_frac: float = 0.0,
) -> "ray.data.Dataset":
    """The change-event stream as a Dataset (distributed generation)."""
    n_repos = n_repos or max(1, n_keys // 50)

    def gen(batch: pa.Table) -> pa.Table:
        ev = batch["id"].to_numpy()
        return _gen_batch(
            ev,
            seed=seed,
            n_keys=n_keys,
            n_repos=n_repos,
            txn_size=txn_size,
            base_lsn=base_lsn,
            key_skew=key_skew,
            p_truncate=p_truncate,
            p_message=p_message,
            hot_key_frac=hot_key_frac,
        )

    ds = ray.data.range(n_events, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow")


def snapshot_envelopes(
    n_keys: int,
    *,
    seed: int = 42,
    n_repos: int | None = None,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Initial-snapshot phase: one op=r row per key at lsn=0, version 0.

    Snapshot rows carry ``source.snapshot="true"`` and are exempt from
    max-records bounds (`AbstractDebeziumTask.java:617-621`, FIXTURES F2).
    """
    n_repos = n_repos or max(1, n_keys // 50)

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy()
        n = len(idx)
        img = row_image(seed, idx, np.zeros(n, dtype=np.int64), n_repos)
        key = pa.StructArray.from_arrays(
            [img.field("repo"), img.field("path")], names=["repo", "path"]
        )
        ts_ms = np.full(n, 1_700_000_000_000, dtype=np.int64)
        src = pa.StructArray.from_arrays(
            _source_struct_arrays(n, True, ts_ms, idx),
            names=["version", "connector", "name", "ts_ms", "snapshot", "db", "table", "row"],
        )
        ptype = pa.struct(payload_fields())
        return pa.Table.from_arrays(
            [
                pa.array(np.zeros(n, dtype=np.int64)),
                pa.array(idx, type=pa.int64()),
                pa.array([OP_READ] * n),
                pa.array(ts_ms, type=pa.int64()),
                pa.nulls(n, ptype),  # before: null for reads
                img,
                src,
                key,
                pa.nulls(n, pa.struct([pa.field("id", pa.string()), pa.field("total_order", pa.int64())])),
                pa.nulls(n, pa.string()),
            ],
            schema=schema(),
        )

    ds = ray.data.range(n_keys, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow")


def ddl_events_table(events: list[tuple[int, dict]]) -> pa.Table:
    """Schema-change rows: ``(lsn, {"action": "add_column"|"rename_column", ...})``.

    The reference accumulates these in the schema-history file
    (`AbstractDebeziumTask.java:453-518`); data-side they are filtered by
    ``ignoreDdl`` (`ChangeConsumer.java:196-199`).  seq=-1 orders a DDL
    before all data events of its LSN.
    """
    n = len(events)
    sch = schema()
    cols = []
    for f in sch:
        if f.name == "lsn":
            cols.append(pa.array([int(l) for l, _ in events], type=pa.int64()))
        elif f.name == "seq":
            cols.append(pa.array([-1] * n, type=pa.int64()))
        elif f.name == "op":
            cols.append(pa.array([OP_DDL] * n))
        elif f.name == "ddl":
            cols.append(pa.array([json.dumps(d, sort_keys=True) for _, d in events]))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=sch)


def write_binlog_segments(
    out_dir: str,
    n_events: int,
    n_keys: int,
    *,
    seed: int = 42,
    num_segments: int = 16,
    **kw,
) -> str:
    """Materialize the binlog as Parquet segment files (the WAL on disk).

    Resumable layout: fixed number of segment files, deterministic rows
    (each row carries its own (lsn, seq) so file layout is irrelevant).
    """
    ds = binlog(n_events, n_keys, seed=seed, override_num_blocks=num_segments, **kw)
    ds.write_parquet(out_dir)
    return out_dir


# ---------------------------------------------------------------- oracle


def oracle_apply(
    n_events: int,
    n_keys: int,
    *,
    seed: int = 42,
    n_repos: int | None = None,
    include_snapshot: bool = True,
    base_lsn: int = 1,
    txn_size: int = 4,
    max_lsn: int | None = None,
    key_skew: bool = False,
    p_truncate: float = 0.0,
    p_message: float = 0.0,
    hot_key_frac: float = 0.0,
) -> dict[tuple[str, str], dict]:
    """Single-threaded pure-Python replay — the parity oracle.

    Mirrors the reference's effective sink semantics (CaptureTest golden
    rows, `CaptureTest.java:80-99`): last-write-wins per key in (lsn, seq)
    order; op=d and op=t remove the key (truncate marks deleted,
    `AbstractDebeziumTask.java:813-817`); keyless op=m messages mutate
    nothing.  Returns {(repo, path): row_dict}.
    """
    n_repos = n_repos or max(1, n_keys // 50)
    state: dict[tuple[str, str], dict] = {}
    if include_snapshot:
        idx = np.arange(n_keys, dtype=np.int64)
        img = row_image(seed, idx, np.zeros(n_keys, dtype=np.int64), n_repos)
        for row in img.to_pylist():
            state[(row["repo"], row["path"])] = row
    ev = np.arange(n_events, dtype=np.int64)
    lsn = base_lsn + ev // txn_size
    if max_lsn is not None:
        ev = ev[lsn <= max_lsn]
    ops = _ops_of(seed, ev, p_truncate, p_message)
    key_idx = _keys_of(seed, ev, n_keys, key_skew, hot_key_frac)
    img = row_image(seed, key_idx, ev + 1, n_repos)
    rows = img.to_pylist()
    from plugin_debezium_ray.sources.source_table import key_of_index

    krepo, kpath = key_of_index(seed, key_idx, n_repos)
    for i in range(len(ev)):  # sequential replay, commit order
        k = (krepo[i], kpath[i])
        if ops[i] in (OP_DELETE, OP_TRUNCATE):
            state.pop(k, None)
        elif ops[i] == OP_MESSAGE:
            continue
        else:
            state[k] = rows[i]
    return state
