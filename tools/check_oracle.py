"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name](sf_dir)`` and compares against
``oracle_sql()[name]`` via DuckDB: row count, schema (column names),
and an order-insensitive value hash over columns sorted by name.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif "float" in str(col.dtype):
            df[c] = col.round(6)
        elif "datetime" in str(col.dtype):
            df[c] = col.astype("int64")
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].startswith("/") else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not a.startswith("/")]

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name:24s} ray error: {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name:24s} rows={len(got)} ({dt:.1f}s) [rows-only]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name:24s} sql error: {ex}")
            fails.append(name)
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif value_hash(got) != value_hash(want):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name:24s} {'; '.join(problems)} ({dt:.1f}s)")
            if sorted(got.columns) == sorted(want.columns) and not got.empty and not want.empty:
                g = got[sorted(got.columns)].sort_values(sorted(got.columns)[:2]).head(3)
                w = want[sorted(want.columns)].sort_values(sorted(want.columns)[:2]).head(3)
                print("  got:", g.to_dict("records"))
                print("  want:", w.to_dict("records"))
            fails.append(name)
        else:
            print(f"OK    {name:24s} rows={len(got)} ({dt:.1f}s)")
    ray.shutdown()
    if fails:
        print("FAILED:", fails)
        sys.exit(1)
    print("all ok")


if __name__ == "__main__":
    main()
