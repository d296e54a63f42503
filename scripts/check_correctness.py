#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate:
run graft.Verify at a given SF dir, then execute each oracle SQL in DuckDB
over the same parquet tables and compare (column names sorted, rows sorted,
exact value equality) against the Spark parquet output.

Usage: python3 scripts/check_correctness.py [sfdir] [outdir] [--skip-verify]
"""
import json, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    if "[verify]" in r.stdout + r.stderr:
        print("\n".join(l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l))

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.loads(Path(OUT, "oracle_sql.json").read_text())
results = {}
for name, sql in sorted(oracle.items()):
    spark_dir = Path(OUT, name)
    if not spark_dir.exists():
        results[name] = "SPARK-MISSING"
        continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE-ERROR: {e}"
        continue
    sdf = pd.read_parquet(spark_dir)
    cols_o, cols_s = sorted(odf.columns), sorted(sdf.columns)
    if cols_o != cols_s:
        results[name] = f"SCHEMA: oracle={cols_o} spark={cols_s}"
        continue
    odf, sdf = odf[cols_o], sdf[cols_o]
    if len(odf) != len(sdf):
        results[name] = f"ROWS: oracle={len(odf)} spark={len(sdf)}"
        continue
    o = odf.sort_values(cols_o).reset_index(drop=True)
    s = sdf.sort_values(cols_o).reset_index(drop=True)
    bad = []
    for c in cols_o:
        ov, sv = o[c], s[c]
        # The driver hashes RENDERED strings after sorting, so a dtype-kind
        # mismatch (oracle float64 from an uncast DuckDB HUGEINT vs Spark
        # int64) renders "0.0" vs "0" and fails the driver even when values
        # are numerically equal. Reproduce that: dtype-kind mismatch between
        # float and integer intent is an outright failure, and only
        # float-vs-float columns get numeric comparison.
        ok_kind, sk_kind = ov.dtype.kind, sv.dtype.kind
        if (ok_kind == "f") != (sk_kind == "f"):
            bad.append(f"{c}: DTYPE-KIND oracle={ov.dtype} spark={sv.dtype} "
                       f"(driver hashes rendered strings; cast the oracle column)")
            continue
        if ok_kind == "f" and sk_kind == "f":
            eq = (ov.astype(float).fillna(-1e308) == sv.astype(float).fillna(-1e308))
        else:
            try:
                eq = ov.astype(str) == sv.astype(str)
            except Exception:
                eq = ov == sv
        if not bool(eq.all()):
            i = int(np.argmin(eq.values))
            bad.append(f"{c}[row{i}]: oracle={ov.iloc[i]!r} spark={sv.iloc[i]!r} ({int((~eq).sum())} diffs)")
    results[name] = "OK" if not bad else "VALUES: " + "; ".join(bad[:3])

n_ok = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    print(f"{'PASS' if v == 'OK' else 'FAIL'} {name}: {v}")
missing_oracle = set()
for d in Path(OUT).iterdir():
    if d.is_dir() and d.name not in oracle:
        n = len(pd.read_parquet(d))
        print(f"INFO {d.name}: rows-only, {n} rows")
print(f"\n{n_ok}/{len(oracle)} oracle queries pass")
sys.exit(0 if n_ok == len(oracle) else 2)
