#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet in OUTDIR, run the matching oracle SQL in DuckDB over the sf
fixture tables, sort columns by name, sort rows, and value-compare.

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, math, os, sys

import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

fails, passes = [], []
for name in sorted(oracle):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        fails.append((name, "NO SPARK RESULT"))
        continue
    try:
        sp = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        sp_rows, sp_cols = sp.fetchall(), [c[0] for c in sp.description]
        du = con.execute(oracle[name])
        du_rows, du_cols = du.fetchall(), [c[0] for c in du.description]
    except Exception as e:
        fails.append((name, f"ERR {e}"))
        continue
    if sorted(sp_cols) != sorted(du_cols):
        fails.append((name, f"SCHEMA spark={sorted(sp_cols)} duck={sorted(du_cols)}"))
        continue
    if len(sp_rows) != len(du_rows):
        fails.append((name, f"ROWS spark={len(sp_rows)} duck={len(du_rows)}"))
        continue
    a, b = canon(sp_rows, sp_cols), canon(du_rows, du_cols)
    if a != b:
        diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
        fails.append((name, f"HASH first-diff row {diff[0]}:\n  spark={diff[1]!r}\n  duck ={diff[2]!r}"))
    else:
        passes.append(name)

print(f"PASS {len(passes)}/{len(oracle)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
