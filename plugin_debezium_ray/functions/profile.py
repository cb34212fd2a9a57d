"""One-pass dataset profiling — the "what is in this 100-TB table"
operator.

Every per-column statistic folds through ONE streaming
``Dataset.aggregate`` with NO shuffle: exact count / null count / min /
max / sum (numeric) merge associatively; distinct cardinality is the
HLL sketch and quantiles the KLL sketch from ``functions/sketches.py``
/ ``functions/quantiles.py`` (both mergeable, both O(small) state per
block).  The driver receives one state blob per profiled column and
renders a small DataFrame — rows never leave the workers.

The accumulator travels as pickled bytes (same reasoning as the
Misra-Gries lane in ``sketches.py``: tuple/dict states make Ray's
aggregate log ArrowConversionError tracebacks before falling back)."""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

from .quantiles import _kll_add_block, _kll_merge, _kll_query
from .sketches import hll_accumulate, hll_estimate

_HLL_P = 12  # 4 KiB per column per state — profiling precision (~1.6%)
_KLL_K = 192


def _new_state(cols):
    return {
        c: {
            "n": 0, "nulls": 0, "min": None, "max": None,
            "sum": 0.0, "numeric": None,
            "hll": np.zeros(1 << _HLL_P, dtype=np.uint8),
            "kll": ([np.empty(0, dtype=np.float64)], 0, 0),
        }
        for c in cols
    }


def _np_values(block, c):
    col = block[c]
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        return col.to_numpy(zero_copy_only=False)
    return np.asarray(col)


def _fold_column(s: dict, arr: np.ndarray) -> None:
    n = len(arr)
    s["n"] += n
    mask = pd.notna(arr)
    nn = int(mask.sum())
    s["nulls"] += n - nn
    if nn == 0:
        return
    vals = arr[mask]
    if s["numeric"] is None:  # decide once, from the first non-null data
        s["numeric"] = bool(
            np.issubdtype(np.asarray(vals[:1]).dtype, np.number)
            and not isinstance(vals[0], (bool, np.bool_))
        )
    s["hll"] = hll_accumulate(s["hll"], vals, _HLL_P)
    if s["numeric"]:
        fv = vals.astype(np.float64, copy=False)
        lo, hi = float(np.min(fv)), float(np.max(fv))
        s["min"] = lo if s["min"] is None else min(s["min"], lo)
        s["max"] = hi if s["max"] is None else max(s["max"], hi)
        s["sum"] += float(fv.sum())
        s["kll"] = _kll_add_block(s["kll"], fv, _KLL_K)
    else:
        try:  # lexical min/max for orderable non-numerics
            lo, hi = min(vals), max(vals)
            s["min"] = lo if s["min"] is None else min(s["min"], lo)
            s["max"] = hi if s["max"] is None else max(s["max"], hi)
        except TypeError:
            pass  # unorderable mixed payloads: no min/max


def _merge_column(a: dict, b: dict) -> dict:
    out = {
        "n": a["n"] + b["n"],
        "nulls": a["nulls"] + b["nulls"],
        "sum": a["sum"] + b["sum"],
        "numeric": a["numeric"] if a["numeric"] is not None else b["numeric"],
        "hll": np.maximum(a["hll"], b["hll"]),
        "kll": _kll_merge(a["kll"], b["kll"], _KLL_K),
    }
    if (a["numeric"] is not None and b["numeric"] is not None
            and a["numeric"] != b["numeric"]):
        # object columns can mix numbers and strings ACROSS blocks: the
        # two accumulators then hold incomparable min/max — demote the
        # column to non-numeric rather than crash crossing the types
        out["numeric"] = False
        out["min"] = None
        out["max"] = None
        return out
    mins = [v for v in (a["min"], b["min"]) if v is not None]
    maxs = [v for v in (a["max"], b["max"]) if v is not None]
    out["min"] = min(mins) if mins else None
    out["max"] = max(maxs) if maxs else None
    return out


def profile(
    ds: "ray.data.Dataset",
    columns: "list[str] | None" = None,
    *,
    quantiles: "tuple" = (0.25, 0.5, 0.75),
) -> pd.DataFrame:
    """Profile ``columns`` (default: all) in ONE streaming pass.

    Returns one row per column: exact ``count`` / ``nulls`` / ``min`` /
    ``max`` (numeric AND lexical-string) / ``mean`` (numeric), plus
    ``approx_distinct`` (HLL, ~1.6% stderr) and approximate quantiles
    (KLL) for numeric columns.  Boolean columns profile as
    non-numeric.  Column list resolves eagerly from the schema
    (materialize an expensive lazy input first)."""
    names = list(ds.schema().names)
    cols = list(columns) if columns is not None else names
    missing = [c for c in cols if c not in names]
    if missing:
        # fail fast, not as an opaque KeyError in a Ray worker after
        # the scan already started
        raise ValueError(f"columns not in dataset schema: {missing}")

    def _acc(state, block):
        st = pickle.loads(state)
        for c in cols:
            _fold_column(st[c], _np_values(block, c))
        return pickle.dumps(st)

    def _merge(a, b):
        sa, sb = pickle.loads(a), pickle.loads(b)
        return pickle.dumps({c: _merge_column(sa[c], sb[c]) for c in cols})

    agg = AggregateFn(
        init=lambda _: pickle.dumps(_new_state(cols)),
        accumulate_block=_acc,
        merge=_merge,
        name="profile",
    )
    out = ds.aggregate(agg)
    states = (
        pickle.loads(out["profile"]) if out is not None
        else _new_state(cols)
    )
    rows = []
    for c in cols:
        s = states[c]
        non_null = s["n"] - s["nulls"]
        numeric = bool(s["numeric"])
        row = {
            "column": c,
            "count": s["n"],
            "nulls": s["nulls"],
            "approx_distinct": (
                int(round(hll_estimate(s["hll"]))) if non_null else 0
            ),
            "min": s["min"],
            "max": s["max"],
            "mean": (s["sum"] / non_null) if numeric and non_null else None,
        }
        qvals = (
            _kll_query(s["kll"], list(quantiles))
            if numeric and s["kll"][2] > 0 else [None] * len(quantiles)
        )
        for q, v in zip(quantiles, qvals):
            row[f"p{int(round(q * 100))}"] = v
        rows.append(row)
    return pd.DataFrame(rows)
