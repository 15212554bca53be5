#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB against the parquet tables in <sfDir> (registered under bare table
names), loads the Spark result parquet from <outDir>/<name>/, sorts columns
by name and rows by all columns, and reports exact / near mismatches.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns differ spark={list(s.columns)} duck={list(d.columns)}")
        return False
    if len(s) != len(d):
        print(f"FAIL {name}: row count spark={len(s)} duck={len(d)}")
        return False
    ok = True
    for c in s.columns:
        sv, dv = s[c], d[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype(float); dv = dv.astype(float)
            both_nan = sv.isna() & dv.isna()
            exact = ((sv == dv) | both_nan)
            if not exact.all():
                diff = (sv - dv).abs()
                bad = (~exact)
                print(f"FAIL {name}.{c}: {bad.sum()}/{len(sv)} inexact, max |diff|={diff[bad].max()}")
                idx = np.where(bad)[0][:3]
                for i in idx:
                    print(f"   row {i}: spark={s.iloc[i].to_dict()} duck={d.iloc[i].to_dict()}")
                ok = False
        else:
            eq = (sv.astype(str) == dv.astype(str))
            if not eq.all():
                print(f"FAIL {name}.{c}: {(~eq).sum()}/{len(sv)} mismatched values")
                idx = np.where(~eq)[0][:3]
                for i in idx:
                    print(f"   row {i}: spark={s.iloc[i].to_dict()} duck={d.iloc[i].to_dict()}")
                ok = False
    return ok


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet in {out}/{name}/")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if compare(name, spark_df, duck_df):
            print(f"OK   {name}: {len(spark_df)} rows")
            n_ok += 1
        else:
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
