"""Atomic checkpoint manifests (ST1/ST2/ST4 of SURVEY.md §2.3).

The reference persists offsets + schema history as ONE atomic KV entry so
the two can never desync on crash, refuses to save offsets without
history, and falls back to legacy two-key state on restore
(`AbstractDebeziumTask.java:63-73,640-753`).  Our equivalent:

- a **manifest** JSON per commit: ``{version, connector_id, ledger
  {bucket: [last_lsn, last_seq]}, buckets {bucket: {path, rows,
  fingerprint, ...}}, schema (registry snapshot), metrics}``
- commit = write ``manifest-vNNNNNN.json`` via temp-file + rename, then
  flip the ``CURRENT`` pointer via temp-file + rename → a crash between
  the two leaves the previous commit visible (atomicity).
- ``save()`` REFUSES an inconsistent save (ledger without schema when the
  source needs schema history) by returning None and writing nothing —
  the AtomicStateTest.java:71-256 contract.
- restore prefers the combined manifest; legacy split state
  (``offsets.json`` + ``history.json``) is a read-only fallback.
"""

from __future__ import annotations

import json
import os
import tempfile

from plugin_debezium_ray.stages.apply import FINGERPRINT_SCHEME

CURRENT = "CURRENT"
LEGACY_OFFSETS = "offsets.json"
LEGACY_HISTORY = "history.json"


def _atomic_write(path: str, data: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class CheckpointManager:
    """Owns the manifest directory of one lake table."""

    def __init__(self, table_dir: str, *, needs_schema_history: bool = True):
        self.table_dir = table_dir
        self.meta_dir = os.path.join(table_dir, "_meta")
        self.needs_schema_history = needs_schema_history

    # ------------------------------------------------------------ save

    def save(self, manifest: dict) -> str | None:
        """Atomically commit a manifest; returns its path, or **None
        (writing nothing)** if the save would be inconsistent — offsets
        (ledger) present but schema snapshot missing while the source
        needs schema history (`AbstractDebeziumTask.java:700-732`)."""
        if (
            self.needs_schema_history
            and manifest.get("ledger")
            and manifest.get("schema") is None
        ):
            return None
        version = int(manifest["version"])
        path = os.path.join(self.meta_dir, f"manifest-v{version:06d}.json")
        _atomic_write(path, json.dumps(manifest, sort_keys=True, indent=1))
        _atomic_write(os.path.join(self.meta_dir, CURRENT), str(version))
        return path

    # --------------------------------------------------------- restore

    def restore(self) -> dict | None:
        """Combined manifest first; legacy two-file state as fallback
        (combined takes precedence — AtomicStateTest 'combined-takes-
        precedence').  Corrupt/absent state is a non-fatal None (worst
        case: re-snapshot), mirroring OffsetMigrationTest tolerance."""
        cur = os.path.join(self.meta_dir, CURRENT)
        try:
            with open(cur) as f:
                version = int(f.read().strip())
            with open(
                os.path.join(self.meta_dir, f"manifest-v{version:06d}.json")
            ) as f:
                return json.load(f)
        except (OSError, ValueError, json.JSONDecodeError):
            pass
        return self._restore_legacy()

    def restore_version(self, version: int) -> dict:
        """Time-travel restore: the manifest of an EXPLICIT committed
        version (``restore()`` follows CURRENT).  Unlike ``restore()``'s
        tolerant None, an explicitly requested version that is absent —
        never committed, or GC'd by ``vacuum`` — raises, because the
        caller named a commit they expect to exist.
        ``vacuum(keep_manifests=K)`` bounds how far back travel
        reaches.  Versions beyond the CURRENT pointer are torn writes
        (save() crashed before the flip), not commits — the next run
        overwrites that number with different data — so they raise
        too."""
        if int(version) > self.current_version():
            raise FileNotFoundError(
                f"version {version} was never committed under "
                f"{self.meta_dir} (beyond the CURRENT pointer; a "
                "manifest file there is a torn write, not a commit)"
            )
        path = os.path.join(
            self.meta_dir, f"manifest-v{int(version):06d}.json"
        )
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            raise FileNotFoundError(
                f"no readable manifest for version {version} under "
                f"{self.meta_dir} (never committed, or vacuumed — keep "
                "more history via vacuum(keep_manifests=...))"
            ) from e

    def _restore_legacy(self) -> dict | None:
        off_p = os.path.join(self.meta_dir, LEGACY_OFFSETS)
        hist_p = os.path.join(self.meta_dir, LEGACY_HISTORY)
        try:
            with open(off_p) as f:
                offsets = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        schema = None
        try:
            with open(hist_p) as f:
                schema = json.load(f)
        except (OSError, json.JSONDecodeError):
            if self.needs_schema_history:
                # offsets without required history → unusable; re-snapshot
                return None
        return {
            "version": int(offsets.get("version", 0)),
            "connector_id": offsets.get("connector_id"),
            "ledger": offsets.get("ledger", {}),
            "buckets": offsets.get("buckets", {}),
            "schema": schema,
            "legacy": True,
        }

    # --------------------------------------------------------- helpers

    def current_version(self) -> int:
        m = self.restore()
        return int(m["version"]) if m else 0

    def ledger(self) -> dict[int, tuple[int, int]]:
        m = self.restore()
        if not m:
            return {}
        return {int(k): (int(v[0]), int(v[1])) for k, v in m.get("ledger", {}).items()}

    def bucket_paths(self) -> dict[int, str]:
        m = self.restore()
        if not m:
            return {}
        return {int(k): v["path"] for k, v in m.get("buckets", {}).items()}

    def bucket_fingerprints(self) -> dict[int, str]:
        """Prior bucket digests usable for the incremental XOR update.

        Returns ``{}`` when the restored manifest was committed under a
        different (or missing, pre-versioned) fingerprint scheme: XOR-ing
        new-scheme removed/added digests into an old-scheme value would
        silently break the incremental-equals-full invariant, so touched
        buckets fall back to a full digest recompute instead."""
        m = self.restore()
        if not m:
            return {}
        if m.get("fingerprint_scheme") != FINGERPRINT_SCHEME:
            return {}
        return {
            int(k): v["fingerprint"]
            for k, v in m.get("buckets", {}).items()
            if v.get("fingerprint")
        }


def build_manifest(
    *,
    version: int,
    connector_id: str | None,
    stats_rows: list[dict],
    parent: dict | None,
    schema_snapshot: dict | None,
    extra_metrics: dict | None = None,
) -> dict:
    """Fold per-bucket apply stats into the next manifest, carrying
    forward untouched buckets from the parent (so unchanged partitions
    are never rewritten — the resumable-output layout)."""
    ledger: dict[str, list[int]] = dict((parent or {}).get("ledger", {}))
    buckets: dict[str, dict] = dict((parent or {}).get("buckets", {}))
    if parent and parent.get("fingerprint_scheme") != FINGERPRINT_SCHEME:
        # the new manifest is stamped with the CURRENT scheme, so any
        # old-scheme digest carried forward verbatim would masquerade as
        # current one commit later and feed the incremental XOR with
        # garbage.  Untouched buckets keep path/rows but drop their
        # fingerprint — they recompute in full when next touched.
        buckets = {
            k: {**v, "fingerprint": None} for k, v in buckets.items()
        }
    total_applied = 0
    total_seen = 0
    for r in stats_rows:
        if r.get("bucket") is None:
            continue
        b = str(int(r["bucket"]))
        if r.get("last_lsn") is not None:
            prev = ledger.get(b)
            cand = [int(r["last_lsn"]), int(r["last_seq"])]
            if prev is None or cand > list(prev):
                ledger[b] = cand
        buckets[b] = {
            "path": r["path"],
            "rows": int(r["rows"]),
            "fingerprint": r["fingerprint"],
            "events_applied": int(r["events_applied"] or 0),
            "events_seen": int(r["events_seen"] or 0),
            "apply_seconds": float(r["apply_seconds"] or 0.0),
        }
        total_applied += int(r["events_applied"] or 0)
        total_seen += int(r["events_seen"] or 0)
    return {
        "version": version,
        "connector_id": connector_id,
        "parent": (parent or {}).get("version"),
        "fingerprint_scheme": FINGERPRINT_SCHEME,
        "ledger": ledger,
        "buckets": buckets,
        "schema": schema_snapshot,
        "metrics": {
            "events_applied": total_applied,
            "events_seen": total_seen,
            "buckets_touched": sum(1 for r in stats_rows if r.get("bucket") is not None),
            **(extra_metrics or {}),
        },
    }
