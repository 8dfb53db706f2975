#!/usr/bin/env python3
"""DESCRIBE every oracle in DuckDB and ban HUGEINT/UHUGEINT output
columns. DuckDB types sum(BIGINT/INT) — including window sums — as
HUGEINT while Spark emits BIGINT; the driver's correctness gate hashes
typed values, so an untyped sum in an oracle's output fails the driver
even when every value matches (the round-5 lesson: a11_peak_concurrency,
d_pack_sequences, t_vocab_coverage). This audit is invoked both by
tools/check.py's sibling path and by OracleHygieneSpec (which dumps
SparkEntry.oracleSql to JSON and shells out here), so the ban holds at
`sbt test` time without needing a Verify run.

Usage: python3 tools/type_audit.py oracle_sql.json /root/testdata/sf0.001
Exit 0 = clean; exit 1 = offenders printed one per line.
"""
import json, os, sys

import duckdb

oracle = json.load(open(sys.argv[1]))
sfdir = sys.argv[2]
# Verify.scala writes metadata keys alongside the SQL strings; skip them.
oracle = {k: v for k, v in oracle.items() if not k.startswith("_")}

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

offenders = []
for name in sorted(oracle):
    try:
        cols = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        offenders.append(f"{name}: DESCRIBE failed: {e}")
        continue
    for c, t, *_ in cols:
        if "HUGEINT" in str(t):
            offenders.append(
                f"{name}: column {c} is {t} — wrap in CAST(... AS BIGINT)")

for o in offenders:
    print(o)
print(f"audited {len(oracle)} oracles, {len(offenders)} offender(s)")
sys.exit(1 if offenders else 0)
