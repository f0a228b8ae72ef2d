#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Spark parquet dump
(column-name-sorted, row-sorted, exact value match)."""
import json, sys, glob
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2"
ONLY = set(sys.argv[3:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        except Exception:
            pass
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    for name in sorted(oracle):
        if ONLY and name not in ONLY:
            continue
        files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
        if not files:
            print(f"{name:20s} NO SPARK DUMP")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:20s} ORACLE ERR: {str(e)[:160]}")
            continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"{name:20s} SCHEMA MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
            continue
        if len(s) != len(d):
            print(f"{name:20s} ROWS spark={len(s)} duck={len(d)}")
            continue
        s = s.sort_values(list(s.columns)).reset_index(drop=True)
        d = d.sort_values(list(d.columns)).reset_index(drop=True)
        ok = True
        for c in s.columns:
            sv, dv = s[c], d[c]
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                eq = ((sv - dv).abs() < 1e-12) | (sv.isna() & dv.isna())
            else:
                eq = (sv.astype(str) == dv.astype(str))
            if not eq.all():
                bad = (~eq).idxmax()
                print(f"{name:20s} VALUE MISMATCH col={c} row={bad} spark={sv[bad]!r} duck={dv[bad]!r} (n_bad={int((~eq).sum())})")
                ok = False
                break
        if ok:
            print(f"{name:20s} OK rows={len(s)}")

if __name__ == "__main__":
    main()
