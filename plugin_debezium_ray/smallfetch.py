"""Driver-side fetch of a PROVABLY-SMALL Dataset result.

``Dataset.take_all()`` fetches block-by-block through the iterator
machinery — on a post-shuffle dataset that's one round-trip per tiny
block (measured: 2.6 s for 3.2k rows across 64 blocks).  When the whole
result is known to be bounded (a verified pair set under a measured
cap, per-bucket stats rows, a k×queries top-k), fetching every block
ref in ONE ``ray.get`` and concatenating is the same data with none of
the per-block latency (measured: 0.04 s for the same result — 65×).

Use ONLY where a bound on the result size is already established — this
is a driver materialization by design, the same contract as the
``take_all`` calls it replaces.
"""

from __future__ import annotations

import pyarrow as pa
import ray


def fetch_small_table(ds: "ray.data.Dataset") -> pa.Table:
    """All rows of a small Dataset as ONE Arrow table (parallel block
    fetch, one ray.get).

    Materializes FIRST: ``to_arrow_refs()`` on a lazy Dataset calls
    ``schema()`` internally, which spawns a separate limit-1 plan that
    RE-EXECUTES the whole upstream (measured: doubled the latency of
    every call site).  On a ``MaterializedDataset`` both the refs and
    the schema come from the already-computed blocks."""
    mds = ds.materialize()
    tabs = [t for t in ray.get(mds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        # fetch_schema may itself be None on a fully-empty dataset
        # (e.g. zero events after the ledger filter) — no rows either way
        sch = mds.schema()
        if sch is None:
            return pa.table({})
        return pa.table(
            {n: pa.array([], t) for n, t in zip(sch.names, sch.types)}
        )
    return pa.concat_tables(tabs, promote_options="default")


def fetch_small_rows(ds: "ray.data.Dataset") -> list[dict]:
    """All rows of a small Dataset as dicts (drop-in for take_all)."""
    return fetch_small_table(ds).to_pylist()
