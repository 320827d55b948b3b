#!/usr/bin/env python3
"""Self-check harness replicating the driver's DuckDB oracle compare:
run each oracle SQL in DuckDB over the sf tables, load the Spark result
parquet, sort columns by name and rows by all columns, compare values.

Usage: oracle_check.py [sfdir] [verify_outdir]
"""
import sys, json, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

sqls = json.load(open(f"{outdir}/oracle_sql.json"))
spark_only = []
for d in sorted(glob.glob(f"{outdir}/*/")):
    q = d.rstrip("/").split("/")[-1]
    if q not in sqls:
        spark_only.append(q)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for q, sql in sorted(sqls.items()):
    try:
        want = con.execute(sql).df()
    except Exception as e:
        fails.append(q); print(f"FAIL {q}: oracle error: {str(e)[:200]}"); continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')").df()
    except Exception as e:
        fails.append(q); print(f"FAIL {q}: spark result unreadable: {str(e)[:200]}"); continue
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        fails.append(q); print(f"FAIL {q}: columns {list(got.columns)} vs {list(want.columns)}"); continue
    if len(got) != len(want):
        fails.append(q); print(f"FAIL {q}: rows {len(got)} vs {len(want)}"); continue
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        print(f"OK   {q} ({len(got)} rows)")
    except AssertionError as e:
        fails.append(q)
        print(f"FAIL {q}: value mismatch: {str(e).splitlines()[-1][:300]}")
        diff = (got != want) & ~(got.isna() & want.isna())
        bad = diff.any(axis=1)
        if bad.any():
            idx = bad[bad].index[:3]
            for i in idx:
                print("  got:", got.loc[i].to_dict())
                print("  want:", want.loc[i].to_dict())

print(f"\n{len(sqls) - len(fails)}/{len(sqls)} oracle queries match; rows-only (no oracle): {spark_only}")
sys.exit(1 if fails else 0)
