#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL on the same testdata tables, compare as
column-name-sorted, row-sorted value sets. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import duckdb
import json
import math
import os
import sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
        df[c] = df[c].map(lambda v: str(v) if v is not None else "\x00NULL")
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    return rows


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    errs_path = f"{out}/_errors.json"
    errored = set()
    if os.path.exists(errs_path):
        for name, msg in sorted(json.load(open(errs_path)).items()):
            print(f"ERR  {name}: {msg}")
            n_fail += 1
            errored.add(name)
    for name in sorted(oracle):
        if name in errored:
            # already counted via _errors.json; comparing would either
            # double-count the failure or PASS against a stale dump from
            # a prior run into the same outDir
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        pdir = f"{out}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        got = pd.read_parquet(pdir)
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns differ spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}")
            only_g = [r for r in g if r not in set(e)][:3]
            only_e = [r for r in e if r not in set(g)][:3]
            print(f"  spark-only: {only_g}\n  oracle-only: {only_e}")
            n_fail += 1
        elif g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs (spark vs oracle): {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    qnames = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    for name in sorted(set(qnames) - set(oracle)):
        got = pd.read_parquet(f"{out}/{name}")
        print(f"ROWS {name}: {len(got)} rows (no oracle)")
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total with oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
