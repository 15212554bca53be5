#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB against the parquet tables in <sfDir> (registered under bare table
names), loads the Spark result parquet from <outDir>/<name>/, and compares
the way the driver does: sort columns by name, sort rows, hash VALUES.

Canonicalization is dtype-sensitive on the int/float axis, matching the
driver's observed behavior on round-1 artifacts:
  - int64 0 != float64 0.0  (DuckDB HUGEINT -> pandas float64 broke 15
    queries whose values compared numerically equal)
  - int32 1 == int64 1      (b14 passed with Spark int32 vs DuckDB BIGINT)
  - None != NaN
This is achieved by hashing str(value) per cell: str() collapses integer
widths but distinguishes int from float and None from nan.

Also mirrors the driver's crash mode: a top-level array/map column makes
pandas sort_values throw (unhashable numpy.ndarray) -> reported as ERR.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful canonical form: columns sorted by name, every cell
    stringified (dtype-sensitively), rows sorted."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.datetime64):
            out[c] = col.astype("datetime64[us]").astype(str)
        else:
            # mimic the driver's pandas sort: an ndarray cell is unhashable
            bad = col.map(lambda v: isinstance(v, (np.ndarray, list, dict)))
            if bad.any():
                raise TypeError(f"unhashable type in column '{c}' "
                                "(top-level array/map output crashes the driver)")
            out[c] = col.map(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(name, spark_df, duck_df):
    try:
        s, d = canon(spark_df), canon(duck_df)
    except TypeError as e:
        print(f"ERR  {name}: {e}")
        return False
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns differ spark={list(s.columns)} duck={list(d.columns)}")
        return False
    if len(s) != len(d):
        print(f"FAIL {name}: row count spark={len(s)} duck={len(d)}")
        return False
    ok = True
    for c in s.columns:
        eq = (s[c] == d[c])
        if not eq.all():
            print(f"FAIL {name}.{c}: {(~eq).sum()}/{len(eq)} mismatched values "
                  f"(spark dtype={spark_df[c].dtype}, duck dtype={duck_df[c].dtype})")
            idx = np.where(~eq)[0][:3]
            for i in idx:
                print(f"   row {i}: spark={s.iloc[i].to_dict()} duck={d.iloc[i].to_dict()}")
            ok = False
    return ok


def fresh_con(sf):
    """One connection per query: a query that dies inside DuckDB's
    allocator (observed: spurious tiny-block OOMs then a segfault after
    heavy list/recursive oracles) must not poison the connection every
    later query runs on. Views over parquet are lazy, so per-query
    setup costs ~nothing."""
    con = duckdb.connect()
    # modest limits: DuckDB's defaults (threads = ncpu = 32, memory
    # target 80% of RAM) are tuned for a machine it doesn't share. 12GB
    # keeps sf0.1 oracle headroom (a genuinely over-limit query would
    # otherwise burn the retry loop's full backoff before FAILing);
    # threads stay low because the co-loaded host refuses allocation
    # bursts, and fewer threads touch less memory at once.
    # env overrides for standalone scale-evidence runs (sf1 rehearsal:
    # the blocked-Jaccard edge oracles want real parallelism); driver
    # behavior unchanged when the vars are unset
    import os
    con.execute(f"SET threads = {int(os.environ.get('GRAFT_DUCK_THREADS', 4))}")
    con.execute(f"SET memory_limit = '{os.environ.get('GRAFT_DUCK_MEM', '12GB')}'")
    # spill OUTSIDE the repo: DuckDB's default temp dir is cwd/.tmp,
    # which a `git add -A` can sweep into history (it did, once)
    con.execute("SET temp_directory = '/tmp/graft_duck_tmp'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con


def run_oracle(sf, sql):
    con = fresh_con(sf)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
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
        # Allocation failures come in bursts on this co-loaded host
        # (observed: a fresh process failing 256K mallocs with 123G
        # "free" for ~a minute, then recovering) — retry with backoff.
        import time
        duck_df = err = None
        retry_deadline = time.monotonic() + 120  # cap total retry time per query
        for attempt in range(4):
            try:
                duck_df = run_oracle(sf, sql)
                if attempt > 0:
                    # an absorbed OOM retry must stay visible in the run
                    # output, not be silently recorded as a slow pass
                    print(f"WARN {name}: oracle succeeded on retry "
                          f"{attempt + 1} after: {err}")
                break
            except Exception as e:
                err = e
                if "Out of Memory" not in str(e) and "allocat" not in str(e):
                    break
                if time.monotonic() >= retry_deadline:
                    print(f"WARN {name}: retry budget exhausted after "
                          f"attempt {attempt + 1}")
                    break
                print(f"WARN {name}: oracle attempt {attempt + 1} failed "
                      f"({e}); retrying")
                time.sleep(10 * (attempt + 1))
        if duck_df is None:
            print(f"FAIL {name}: duckdb error: {err}")
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
