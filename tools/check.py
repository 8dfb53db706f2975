#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet in OUTDIR, run the matching oracle SQL in DuckDB over the sf
fixture tables, sort columns by name, sort rows, and value-compare —
plus a TYPE audit the driver's hash is sensitive to but a plain Python
value compare is not (fetchall() coerces HUGEINT->int, the round-5
lesson): each oracle output column's DuckDB type must match the type
DuckDB assigns the Spark result parquet column, and HUGEINT/UHUGEINT
are banned from oracle output outright.

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
                # exact (repr round-trips doubles); %.6g masked real diffs
                v = "NaN" if math.isnan(v) else repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def col_types(sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}

INT_T = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
         "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

def tfamily(t):
    t = str(t)
    if t in INT_T:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t  # VARCHAR, DATE, BOOLEAN, lists, ... compare exactly

def type_issues(sp_t, du_t):
    """Driver-hash-faithful type audit (calibrated on CORRECTNESS_r05:
    int-width mismatches pass the driver's hash; HUGEINT does not).
    Ban HUGEINT/UHUGEINT in oracle output; flag cross-family mismatches."""
    out = []
    for c in sorted(du_t):
        if "HUGEINT" in str(du_t[c]):
            out.append(f"{c}: oracle emits {du_t[c]} (banned — CAST to BIGINT)")
        elif c in sp_t and tfamily(sp_t[c]) != tfamily(du_t[c]):
            out.append(f"{c}: family mismatch spark={sp_t[c]} duck={du_t[c]}")
    return out

fails, passes = [], []
for name in sorted(oracle):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        fails.append((name, "NO SPARK RESULT"))
        continue
    try:
        sp_sql = f"SELECT * FROM read_parquet('{d}/*.parquet')"
        sp = con.execute(sp_sql)
        sp_rows, sp_cols = sp.fetchall(), [c[0] for c in sp.description]
        du = con.execute(oracle[name])
        du_rows, du_cols = du.fetchall(), [c[0] for c in du.description]
        sp_t, du_t = col_types(sp_sql), col_types(oracle[name])
    except Exception as e:
        fails.append((name, f"ERR {e}"))
        continue
    if sorted(sp_cols) != sorted(du_cols):
        fails.append((name, f"SCHEMA spark={sorted(sp_cols)} duck={sorted(du_cols)}"))
        continue
    bad_t = type_issues(sp_t, du_t)
    if bad_t:
        fails.append((name, "TYPE " + "; ".join(bad_t)))
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
