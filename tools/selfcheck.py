#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
outputs, run each oracle SQL in DuckDB over the same sf tables, and
compare (columns sorted by name, rows sorted, exact values).

Usage: selfcheck.py [sfDir] [outDir]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for an order-insensitive, type-tolerant exact compare
    out = df.map(lambda v: repr(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ, e.g.:")
            for i in idx:
                print(f"  spark: {g.loc[i].to_dict()}")
                print(f"  duck : {w.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
