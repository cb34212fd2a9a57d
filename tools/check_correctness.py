#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against ``oracle_sql()`` (DuckDB over the
same sf parquet tables, registered as views) and compares row count,
column names, dtypes and values (columns sorted by name, rows sorted by
all columns — the driver's order-insensitive compare).  Reports
rows-only for queries with no oracle.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(out) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(out, pd.DataFrame):
        return out.reset_index(drop=True)
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            # driver's value-hash is resolution-insensitive; mirror that
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> dict:
    res = {"rows_match": len(ray_df) == len(ora_df)}
    res["schema_match"] = sorted(ray_df.columns) == sorted(ora_df.columns)
    if not (res["rows_match"] and res["schema_match"]):
        res["hash_match"] = False
        res["detail"] = (
            f"rows {len(ray_df)} vs {len(ora_df)}; "
            f"cols {sorted(ray_df.columns)} vs {sorted(ora_df.columns)}"
        )
        return res
    a, b = canon(ray_df), canon(ora_df)
    mismatch = []
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if str(a[c].dtype) != str(b[c].dtype):
            mismatch.append(f"dtype[{c}]: {a[c].dtype} vs {b[c].dtype}")
        try:
            if a[c].dtype.kind == "f":
                ok = np.allclose(av.astype(float), bv.astype(float),
                                 rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = (pd.Series(av).fillna("~N") == pd.Series(bv).fillna("~N")).all()
        except Exception as e:  # noqa: BLE001
            ok = False
            mismatch.append(f"cmp[{c}] error: {e}")
        if not ok:
            mismatch.append(f"values[{c}]")
    res["hash_match"] = not mismatch
    if mismatch:
        res["detail"] = "; ".join(mismatch[:5])
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(ray_df)} rows, no oracle)")
            continue
        try:
            ora_df = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        res = compare(name, ray_df, ora_df)
        tag = "PASS" if res["hash_match"] else "FAIL"
        if tag == "FAIL":
            failures += 1
        print(f"{tag} {name}: {res}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
