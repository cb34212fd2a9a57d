"""Schema registry — ordered additive/rename column evolution (ST3).

The reference accumulates DDL in a schema-history file
(`AbstractDebeziumTask.java:453-518,535-538`) consumed by the engine; we
hold the current payload schema + an ordered evolution log, snapshotted
into every checkpoint manifest (the atomic offsets+history contract of
ST2).  Exposed both as a plain class (driver-side build from the binlog's
DDL rows) and as a Ray actor for concurrent pipelines.

DDL payloads (JSON in the envelope's ``ddl`` column, op='ddl'):
  {"action": "add_column", "name": ..., "type": "<arrow alias>", "default": ...}
  {"action": "rename_column", "from": ..., "to": ...}
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray


class SchemaRegistry:
    def __init__(self, payload_fields: list[tuple[str, str]] | None = None):
        # [(name, arrow type alias)] — the base payload schema
        self.fields: list[tuple[str, str]] = list(payload_fields or [])
        self.log: list[dict] = []  # ordered evolution events
        self.defaults: dict[str, object] = {}

    # ------------------------------------------------------------- DDL

    def apply_ddl(self, ddl: str | dict) -> None:
        ev = json.loads(ddl) if isinstance(ddl, str) else dict(ddl)
        action = ev.get("action")
        if action == "add_column":
            if any(n == ev["name"] for n, _ in self.fields):
                return  # idempotent re-apply
            self.fields.append((ev["name"], ev.get("type", "string")))
            self.defaults[ev["name"]] = ev.get("default")
        elif action == "rename_column":
            self.fields = [
                (ev["to"] if n == ev["from"] else n, t) for n, t in self.fields
            ]
            if ev["from"] in self.defaults:
                self.defaults[ev["to"]] = self.defaults.pop(ev["from"])
        else:
            raise ValueError(f"unknown DDL action: {action!r}")
        self.log.append(ev)

    # ------------------------------------------------------------ views

    def current_schema(self) -> pa.Schema:
        return pa.schema(
            [pa.field(n, pa.type_for_alias(t)) for n, t in self.fields]
        )

    def rename_map(self) -> dict[str, str]:
        """Cumulative old→current name map for reading old segments."""
        renames: dict[str, str] = {}
        for ev in self.log:
            if ev["action"] != "rename_column":
                continue
            # chase chains: anything previously mapping to `from` now → `to`
            for k, v in list(renames.items()):
                if v == ev["from"]:
                    renames[k] = ev["to"]
            renames[ev["from"]] = ev["to"]
        return renames

    def added_columns(self) -> list[tuple[str, str, object]]:
        """[(name, type alias, default)] in evolution order, with renames
        applied to the names."""
        rn = {}
        out: list[tuple[str, str, object]] = []
        for ev in self.log:
            if ev["action"] == "add_column":
                out.append((ev["name"], ev.get("type", "string"), ev.get("default")))
            else:
                out = [
                    (ev["to"] if n == ev["from"] else n, t, d) for n, t, d in out
                ]
                rn[ev["from"]] = ev["to"]
        return out

    # -------------------------------------------------------- snapshot

    def snapshot(self) -> dict:
        return {"fields": self.fields, "log": self.log, "defaults": self.defaults}

    @classmethod
    def from_snapshot(cls, snap: dict | None) -> "SchemaRegistry":
        reg = cls()
        if snap:
            reg.fields = [tuple(f) for f in snap.get("fields", [])]
            reg.log = list(snap.get("log", []))
            reg.defaults = dict(snap.get("defaults", {}))
        return reg


def registry_from_envelopes(
    env_ds,
    base_fields: list[tuple[str, str]],
    *,
    prior_snapshot: dict | None = None,
    max_lsn: int | None = None,
) -> SchemaRegistry:
    """Build the registry by scanning the (tiny) DDL sub-stream of the
    envelope Dataset in (lsn, seq) order — the schema-history replay.

    Only ``(lsn, seq, op, ddl)`` columns ever leave the workers; the data
    stream is untouched (no driver-side materialization of events)."""
    import pyarrow.compute as pc

    from plugin_debezium_ray.envelope import OP_DDL

    def ddl_only(t: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.equal(t["op"], OP_DDL), False)
        if max_lsn is not None:
            keep = pc.and_(keep, pc.less_equal(t["lsn"], max_lsn))
        return t.select(["lsn", "seq", "ddl"]).filter(keep)

    # select_columns FIRST so Ray's planner pushes the projection into the
    # parquet read — the DDL scan must never deserialize the before/after
    # image columns (they dominate the WAL's bytes)
    pruned = env_ds.select_columns(["lsn", "seq", "op", "ddl"])
    rows = pruned.map_batches(ddl_only, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["lsn"], r["seq"]))
    reg = (
        SchemaRegistry.from_snapshot(prior_snapshot)
        if prior_snapshot
        else SchemaRegistry(base_fields)
    )
    seen = {json.dumps(e, sort_keys=True) for e in reg.log}
    for r in rows:
        key = r["ddl"]
        norm = json.dumps(json.loads(key), sort_keys=True)
        if norm in seen:  # idempotent replay of already-recorded DDL
            continue
        reg.apply_ddl(key)
        seen.add(norm)
    return reg


@ray.remote
class SchemaRegistryActor:
    """Singleton actor wrapper for concurrent access (ST3)."""

    def __init__(self, snapshot: dict | None = None, base: list | None = None):
        self.reg = (
            SchemaRegistry.from_snapshot(snapshot)
            if snapshot
            else SchemaRegistry([tuple(f) for f in (base or [])])
        )

    def apply_ddl(self, ddl: str | dict) -> None:
        self.reg.apply_ddl(ddl)

    def snapshot(self) -> dict:
        return self.reg.snapshot()

    def view(self) -> tuple[dict, list]:
        return self.reg.rename_map(), self.reg.added_columns()
