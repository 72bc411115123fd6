"""Local stand-in for the driver's correctness gate: run every
`queries()` entry and its `oracle_sql()` twin over the same sf dir, compare
row count + column names + order-insensitive values.

Usage: python scripts/check_queries.py [sf_dir] [query_prefix ...]
(any number of prefixes; no prefix = the full registry)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT {len(a)} vs {len(b)}"
    # dtype-strict, like the driver's typed hash: a float64-vs-int64 column
    # (e.g. DuckDB HUGEINT sum → float64 via .df()) must FAIL here even when
    # the values compare equal — this exact class hid the round-1 q09/q17
    # driver hash mismatches behind the value-tolerant compare
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            return f"DTYPE col {c}: ray={a[c].dtype} vs sql={b[c].dtype}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                eq = (
                    (av.astype(float) == bv.astype(float))
                    | (av.isna() & bv.isna())
                )
            else:
                eq = av.astype(str) == bv.astype(str)
        except Exception as e:
            return f"CMP-ERR col {c}: {e}"
        if not bool(eq.all()):
            idx = (~eq).idxmax()
            return (
                f"VALUES col {c} row {idx}: ray={a[c][idx]!r} sql={b[c][idx]!r}"
            )
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefixes = sys.argv[2:]

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from basicocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    failures = 0
    for name, fn in QUERIES.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{name:26s} RAY-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"{name:26s} rows-only n={len(ray_df)} ({time.time()-t0:.1f}s)")
            continue
        try:
            sql_df = con.sql(sql).df()
        except Exception as e:
            print(f"{name:26s} SQL-ERROR {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        status = "ok" if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures += 1
        print(f"{name:26s} {status} n={len(ray_df)} ({time.time()-t0:.1f}s) {verdict if verdict != 'OK' else ''}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
