#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: tools/compare.py SF_DIR OUT_DIR
  SF_DIR  testdata dir (e.g. /root/testdata/sf0.01)
  OUT_DIR Verify output dir (per-query parquet + oracle_sql.json)

For each query in oracle_sql.json: runs the oracle in DuckDB with the
testdata tables registered as views, loads the Spark result parquet, then
compares row count, column names/dtypes, and values (exact for
ints/strings, exact-then-approx report for floats) after sorting columns
by name and rows by all columns.
"""
import duckdb
import json
import sys
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
            res = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        problems = []
        if set(exp.columns) != set(res.columns):
            problems.append(f"columns oracle={sorted(exp.columns)} result={sorted(res.columns)}")
        elif len(exp) != len(res):
            problems.append(f"rows oracle={len(exp)} result={len(res)}")
        else:
            e_c, r_c = canon(exp), canon(res)
            for c in e_c.columns:
                ev, rv = e_c[c], r_c[c]
                if str(ev.dtype) != str(rv.dtype):
                    problems.append(f"dtype[{c}] oracle={ev.dtype} result={rv.dtype}")
                try:
                    if ev.dtype.kind == "f":
                        both_nan = ev.isna() & rv.isna()
                        neq = ~both_nan & (ev != rv)
                        if neq.any():
                            md = float(np.nanmax(np.abs(ev[neq] - rv[neq])))
                            problems.append(f"values[{c}] {int(neq.sum())} diffs, maxabs={md:.3e}")
                    else:
                        neq = ~(ev.isna() & rv.isna()) & (ev.astype(str) != rv.astype(str))
                        if neq.any():
                            i = int(np.argmax(neq.values))
                            problems.append(
                                f"values[{c}] {int(neq.sum())} diffs, first@{i}: "
                                f"oracle={ev.iloc[i]!r} result={rv.iloc[i]!r}")
                except Exception as e:
                    problems.append(f"compare[{c}] error: {e}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"  - {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(exp)} rows)")
    # queries without an oracle: rows-only
    import os
    for d in sorted(os.listdir(outdir)):
        full = os.path.join(outdir, d)
        if os.path.isdir(full) and d not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{full}/*.parquet'").fetchone()[0]
                print(f"ROWS-ONLY {d}: {n} rows")
            except Exception as e:
                print(f"ROWS-ONLY {d}: load error {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
