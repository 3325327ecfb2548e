#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet tables
and compare (rows, schema-by-name, value hash after sorting columns by name
and rows by value)."""
import json, os, subprocess, sys, hashlib
import duckdb, pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
RUN_VERIFY = os.environ.get("SKIP_VERIFY", "") != "1"

if RUN_VERIFY:
    r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
                       cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], r.stderr[-4000:])
        sys.exit(1)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize to strings for a robust sort/hash across engines
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    s = df.apply(lambda row: "|".join(cell(v) for v in row), axis=1)
    return s.sort_values().reset_index(drop=True)

results = {}
for name in sorted(oracle):
    path = f"{OUT}/{name}"
    try:
        spark_df = duckdb.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    except Exception as e:
        results[name] = f"SPARK_READ_ERR {e}"
        continue
    try:
        ora_df = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE_ERR {str(e)[:200]}"
        continue
    rows = len(spark_df) == len(ora_df)
    schema = sorted(spark_df.columns) == sorted(ora_df.columns)
    hs = hm = False
    if rows and schema:
        a, b = canon(spark_df), canon(ora_df)
        hm = a.equals(b)
        if not hm:
            diff = (a != b)
            ex = [(a[i], b[i]) for i in diff[diff].index[:3]]
            results[name] = f"HASH_MISMATCH rows={len(a)} ex={ex}"
            continue
    if not rows:
        results[name] = f"ROWS {len(spark_df)} vs {len(ora_df)}"
    elif not schema:
        results[name] = f"SCHEMA {sorted(spark_df.columns)} vs {sorted(ora_df.columns)}"
    else:
        results[name] = "OK"

nok = {k: v for k, v in results.items() if v != "OK"}
print(f"{len(results)-len(nok)}/{len(results)} OK")
for k, v in sorted(nok.items()):
    print(f"  {k}: {v}")
# queries without oracle
missing = [q for q in os.listdir(OUT)
           if os.path.isdir(f"{OUT}/{q}") and q not in oracle]
if missing:
    print("NO_ORACLE:", sorted(missing))
