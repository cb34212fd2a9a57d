"""Incremental materialized aggregates over the CDC lake.

A long-running CDC stream usually feeds dashboards or mixture
controllers that want an aggregate of the CURRENT table after every
commit.  Recomputing from scratch reads the whole lake each time; this
module maintains the aggregate INCREMENTALLY using the commit protocol
the engine already has:

* every commit rewrites ONLY the buckets it touched (untouched buckets
  carry their prior file path forward in the manifest — see
  ``state/checkpoint.py``), and
* per-bucket partial aggregates are associative (count / sum fold).

So ``refresh()`` diffs the CURRENT manifest against the cached
per-bucket partials, re-reads only the buckets whose file changed (one
Ray task per changed bucket, column-pruned), folds all partials on the
driver (O(buckets × groups) scalars), and persists the new cache
atomically next to the lake's own metadata (write-then-rename, keyed
by manifest version).  Steady-state cost per commit is proportional to
the buckets the commit touched — not to the table.

Crash-safe by construction: the cache is advisory (derived data) — a
missing or torn cache file just degrades the next refresh to a full
recompute of whatever partials are absent.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray

from plugin_debezium_ray.state.checkpoint import CheckpointManager


@ray.remote
def _bucket_partial(path: str, group_col: str, sum_col: "str | None"):
    """One bucket file → [[group, count, sum, n_sum_nonnull], ...]
    (sum fields omitted without a sum_col).  Column-pruned read; the
    fold itself is ONE Arrow group_by aggregate (vectorized — never a
    Python loop over rows); runs as an ordinary Ray task so changed
    buckets recompute in parallel across the cluster.

    Group keys keep their native JSON-scalar types (str/int/float/
    bool/null); other key types (dates, ...) round-trip through the
    JSON cache as strings — documented on the class."""
    import pyarrow.parquet as pq

    cols = [group_col] + ([sum_col] if sum_col else [])
    t = pq.read_table(path, columns=cols)
    if t.num_rows == 0:
        return []
    if sum_col:
        styp = t[sum_col].type
        if not (pa.types.is_integer(styp) or pa.types.is_floating(styp)):
            raise TypeError(
                f"sum_col must be integer or float, got {styp} — exact "
                "decimal aggregation belongs in a full query, not the "
                "float-folding MV cache"
            )
        agg = t.group_by([group_col]).aggregate(
            [(sum_col, "sum"), (sum_col, "count"), ([], "count_all")]
        )
        return [
            [_key(g), int(n), (0 if s is None else s), int(nv)]
            for g, s, nv, n in zip(
                agg[group_col].to_pylist(),
                agg[f"{sum_col}_sum"].to_pylist(),
                agg[f"{sum_col}_count"].to_pylist(),
                agg["count_all"].to_pylist(),
            )
        ]
    agg = t.group_by([group_col]).aggregate([([], "count_all")])
    return [
        [_key(g), int(n)]
        for g, n in zip(agg[group_col].to_pylist(),
                        agg["count_all"].to_pylist())
    ]


def _key(k):
    """JSON-cache-safe group key: native JSON scalars pass through
    TYPED; anything else (dates, decimals) degrades to str."""
    if k is None or isinstance(k, (str, int, float, bool)):
        return k
    return str(k)


class MaterializedAggregate:
    """Per-group ``count(*)`` (+ optional ``sum(sum_col)``) over the
    lake table, maintained incrementally across commits.

    ``refresh()`` returns the aggregate of the CURRENT committed
    version as ``[{group, n_rows[, total]}]`` rows and records how many
    buckets were re-read (``last_recomputed`` — the observable that the
    maintenance really is incremental)."""

    def __init__(self, table_dir: str, *, group_col: str,
                 sum_col: "str | None" = None, name: str = "mv"):
        self.table_dir = table_dir
        self.group_col = group_col
        self.sum_col = sum_col
        self.ckpt = CheckpointManager(table_dir)
        self.cache_path = os.path.join(
            table_dir, "_meta", f"{name}-{group_col}-{sum_col or 'count'}.json"
        )
        self.last_recomputed: int | None = None

    # ------------------------------------------------------------ cache

    def _load_cache(self) -> dict:
        try:
            with open(self.cache_path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {"partials": {}}

    def _save_cache(self, cache: dict) -> None:
        tmp = self.cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.replace(tmp, self.cache_path)  # atomic publish

    # ---------------------------------------------------------- refresh

    def refresh(self) -> "list[dict]":
        manifest = self.ckpt.restore()
        if manifest is None:
            self.last_recomputed = 0
            return []
        buckets = manifest.get("buckets", {})
        prior = self._load_cache()["partials"]

        # cache key = (path, fingerprint): untouched buckets carry the
        # same path forward; a rewritten bucket gets a new version dir
        todo: dict[str, str] = {}
        keep: dict[str, dict] = {}
        for info in buckets.values():
            ck = f"{info['path']}#{info.get('fingerprint')}"
            if ck in prior:
                keep[ck] = prior[ck]
            else:
                todo[ck] = info["path"]

        if todo:
            fresh = ray.get([
                _bucket_partial.remote(p, self.group_col, self.sum_col)
                for p in todo.values()
            ])
            keep.update(zip(todo.keys(), fresh))
        self.last_recomputed = len(todo)

        self._save_cache({
            "version": int(manifest.get("version", 0)),
            "group_col": self.group_col,
            "sum_col": self.sum_col,
            "partials": keep,
        })

        folded: dict = {}
        for part in keep.values():
            for entry in part:
                k, acc = entry[0], entry[1:]
                tgt = folded.setdefault(k, [0] * len(acc))
                for i, v in enumerate(acc):
                    tgt[i] += v
        rows = []
        for k in sorted(folded, key=lambda g: (g is None, str(g))):
            row = {self.group_col: k, "n_rows": folded[k][0]}
            if self.sum_col:
                # SQL SUM over an all-null group is NULL, not 0
                row["total"] = folded[k][1] if folded[k][2] else None
            rows.append(row)
        return rows
