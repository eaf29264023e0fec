#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  <outDir> is what `graft.Verify` wrote: one parquet dir per query +
  oracle_sql.json. Compares each query's Spark result against DuckDB
  running the oracle SQL over the same source parquet tables:
  row count, column names (sorted), and exact values on row-sorted frames.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # duckdb hugeint/decimal -> object; unify numerics as strings repr
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        qdir = f"{outdir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {qdir}")
            n_fail += 1
            continue
        try:
            mine = normalize(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
            theirs = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(theirs.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs oracle {list(theirs.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(theirs):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(theirs)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, theirs, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            # show first few diffs
            neq = (mine != theirs) & ~(mine.isna() & theirs.isna())
            rows = neq.any(axis=1)
            print("  mine:  ", mine[rows].head(3).to_dict("records"))
            print("  oracle:", theirs[rows].head(3).to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
