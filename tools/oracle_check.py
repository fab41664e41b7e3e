#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet, executes the corresponding oracle SQL in
DuckDB over the same testdata parquet and compares as a sorted multiset
(columns sorted by name, rows sorted by all columns, exact values).

Usage: python3 tools/oracle_check.py [sfDir] [outDir]
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(res_dir)
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL     {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        # the driver's hash is dtype-sensitive (a DuckDB HUGEINT landing
        # as float64 vs Spark's int64 hash-mismatches even on identical
        # values) — fail on numeric-kind divergence, not just values
        kind_bad = [c for c in g.columns if g[c].dtype.kind != w[c].dtype.kind
                    and {g[c].dtype.kind, w[c].dtype.kind} <= {"i", "u", "f"}
                    and "f" in {g[c].dtype.kind, w[c].dtype.kind}]
        if kind_bad:
            print(f"FAIL     {name}: dtype kind mismatch on {kind_bad}: "
                  f"{[(str(g[c].dtype), str(w[c].dtype)) for c in kind_bad]}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL     {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"PASS     {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL     {name}: {str(e).splitlines()[-1][:200]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
