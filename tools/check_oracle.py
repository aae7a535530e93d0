#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and compare (columns sorted by name, rows
sorted, values stringified)."""
import json, sys, glob, os
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)]
    def cell(v):
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    rows = sorted(df.astype(object).values.tolist(),
                  key=lambda r: [cell(x) for x in r])
    return [[cell(x) for x in r] for r in rows]

fails = 0
for name in sorted(oracle):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        print(f"MISSING  {name}"); fails += 1; continue
    got = pd.read_parquet(pq)
    exp = con.sql(oracle[name]).df()
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        print(f"ROWS     {name}: got {len(g)} expected {len(e)}"); fails += 1
        continue
    if sorted(got.columns.str.lower()) != sorted(exp.columns.str.lower()):
        print(f"SCHEMA   {name}: got {sorted(got.columns)} expected {sorted(exp.columns)}")
        fails += 1; continue
    bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
    if bad:
        i = bad[0]
        print(f"VALUES   {name}: {len(bad)} rows differ; first @{i}:")
        print(f"  got {g[i]}")
        print(f"  exp {e[i]}")
        fails += 1
    else:
        print(f"OK       {name} ({len(g)} rows)")

# rows-only queries
for pq in sorted(glob.glob(f"{out_dir}/*")):
    name = os.path.basename(pq)
    if name in oracle or not os.path.isdir(pq):
        continue
    n = len(pd.read_parquet(pq))
    print(f"{'OK-ROWS ' if n > 0 else 'EMPTY!! '} {name} ({n} rows)")
    if n == 0: fails += 1

print("FAILURES:", fails)
sys.exit(1 if fails else 0)
