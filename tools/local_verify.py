#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs DuckDB oracle SQL
against the testdata parquet and compares with the Verify.scala parquet dumps
(columns sorted by name, rows sorted, values hashed)."""
import json, sys, glob, os
import duckdb, pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    if not os.path.isdir(path):
        results[name] = "MISSING_SPARK_OUTPUT"; continue
    try:
        got = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ERROR: {e}"; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        results[name] = f"COLS got={list(got.columns)} exp={list(exp.columns)}"; continue
    if len(got) != len(exp):
        results[name] = f"ROWS got={len(got)} exp={len(exp)}"; continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    schema_note = ""
    if [str(t) for t in gs.dtypes] != [str(t) for t in es.dtypes]:
        schema_note = f" SCHEMA got={[str(t) for t in gs.dtypes]} exp={[str(t) for t in es.dtypes]}"
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        results[name] = "OK" + schema_note
    except AssertionError as e:
        results[name] = "VALUES " + str(e).split("\n")[0] + str(e).split("\n")[-1][:200] + schema_note

# queries without oracle -> rows-only
all_q = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
for name in sorted(all_q - set(oracle)):
    n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
    results[name] = f"ROWS_ONLY n={n}" + (" (EMPTY!)" if n == 0 else "")

ok = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in results.items():
    print(("PASS " if v.startswith("OK") else "---- ") + k + ": " + v)
print(f"\n{ok}/{len(oracle)} oracle-checked queries PASS")
