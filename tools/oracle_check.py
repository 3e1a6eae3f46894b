#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Loads each Verify output parquet, runs the matching oracle SQL in DuckDB
over the same testdata tables, sorts columns by name and rows by all
columns, and diffs values.
"""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
ok = fail = 0
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fail += 1; continue
    got = con.sql(f"SELECT * FROM '{files[0]}'").df()
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows)" )
        ok += 1
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e).splitlines()[0]}"); fail += 1; continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"{name}: SCHEMA MISMATCH got={gcols} want={wcols}"); fail += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    w = want[wcols].sort_values(wcols).reset_index(drop=True)
    if len(g) != len(w):
        print(f"{name}: ROWCOUNT {len(g)} vs {len(w)}"); fail += 1; continue
    try:
        import pandas as pd
        eq = g.astype(str).equals(w.astype(str))
    except Exception as e:
        print(f"{name}: COMPARE ERROR {e}"); fail += 1; continue
    if eq:
        print(f"{name}: OK ({len(g)} rows)"); ok += 1
    else:
        diff = (g.astype(str) != w.astype(str)).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"{name}: VALUE MISMATCH ({diff.sum()}/{len(g)} rows)")
        for i in idx:
            print(f"  got : {g.loc[i].to_dict()}")
            print(f"  want: {w.loc[i].to_dict()}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
