#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate:
run graft.Verify at a given SF dir, then execute each oracle SQL in DuckDB
over the same parquet tables and compare (column names sorted, rows sorted,
exact value equality) against the Spark parquet output.

Usage: python3 scripts/check_correctness.py [sfdir] [outdir] [--skip-verify]
                                             [--timeout SECS] [--json PATH]

The quadratic-oracle EXEMPT set is empty as of round 11: the six former
members (x06/x07/x14/x44/x71/x76) were rewritten as lossless
inverted-index miners (see SparkEntry.invJaccardPairsSql), so every
oracle now runs at bench scale. The exemption machinery is retained so
a future genuinely-quadratic oracle can declare itself; any NON-exempt
oracle that times out is a failure.
Pass --json to write a driver-style per-query artifact (e.g.
CORRECTNESS_sf0.1_r9.json) so "benchmarked at sf0.1" and "verified at
sf0.1" are the same claim.
"""
import json, subprocess, sys, threading
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT = args[1] if len(args) > 1 else "/tmp/verify_out"
TIMEOUT = 150.0
if "--timeout" in sys.argv:
    TIMEOUT = float(sys.argv[sys.argv.index("--timeout") + 1])
JSON_PATH = None
if "--json" in sys.argv:
    JSON_PATH = sys.argv[sys.argv.index("--json") + 1]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
# Quadratic-oracle exemption class: formerly the 6 Jaccard/containment
# closures, now EMPTY — their oracles were rewritten as lossless
# inverted-index miners (shared-shingle equi-join; a pair above any
# positive threshold must share a shingle), so they run in seconds at
# bench scale and are fully hash-checked like everything else.
EXEMPT_QUADRATIC = set()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    if "[verify]" in r.stdout + r.stderr:
        print("\n".join(l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l))

def connect():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c

con = connect()

def run_oracle(sql, budget):
    """Run one oracle with a wall-clock budget; on timeout interrupt the
    query, reconnect (a fresh connection is cheap and guaranteed clean),
    and raise TimeoutError."""
    global con
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        return con.sql(sql).df()
    except (duckdb.InterruptException, RuntimeError) as e:
        if "INTERRUPT" in str(e).upper() or isinstance(e, duckdb.InterruptException):
            con = connect()
            raise TimeoutError(f"oracle exceeded {budget:.0f}s")
        raise
    finally:
        timer.cancel()

oracle = json.loads(Path(OUT, "oracle_sql.json").read_text())
results = {}
for name, sql in sorted(oracle.items()):
    spark_dir = Path(OUT, name)
    if not spark_dir.exists():
        results[name] = "SPARK-MISSING"
        continue
    try:
        # a known-quadratic oracle gets a cheap PROBE budget: at small SFs
        # it finishes and is fully checked; at bench SF it would burn the
        # full budget 6 times over just to confirm the documented exemption
        budget = min(TIMEOUT, 30.0) if name in EXEMPT_QUADRATIC else TIMEOUT
        odf = run_oracle(sql, budget)
    except TimeoutError as e:
        if name in EXEMPT_QUADRATIC:
            n = len(pd.read_parquet(spark_dir))
            results[name] = f"EXEMPT-QUADRATIC-ORACLE ({e}; spark rows={n})"
        else:
            results[name] = f"ORACLE-TIMEOUT: {e}"
        continue
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
n_exempt = sum(1 for v in results.values() if v.startswith("EXEMPT"))
for name, v in sorted(results.items()):
    tag = "PASS" if v == "OK" else ("EXEMPT" if v.startswith("EXEMPT") else "FAIL")
    print(f"{tag} {name}: {v}")
missing_oracle = set()
for d in Path(OUT).iterdir():
    if d.is_dir() and d.name not in oracle:
        n = len(pd.read_parquet(d))
        print(f"INFO {d.name}: rows-only, {n} rows")
print(f"\n{n_ok}/{len(oracle) - n_exempt} checkable oracle queries pass"
      f" ({n_exempt} quadratic-oracle exempt)")
if JSON_PATH:
    art = {}
    for name, v in sorted(results.items()):
        spark_dir = Path(OUT, name)
        n = len(pd.read_parquet(spark_dir)) if spark_dir.exists() else None
        art[name] = {
            "rows_match": v == "OK", "schema_match": v == "OK",
            "hash_match": v == "OK", "spark_rows": n,
            "oracle_rows": n if v == "OK" else None,
            "err": None if v == "OK" else v,
            "exempt": v.startswith("EXEMPT"),
        }
    Path(JSON_PATH).write_text(json.dumps(art, indent=1) + "\n")
    print(f"wrote {JSON_PATH}")
sys.exit(0 if n_ok + n_exempt == len(oracle) else 2)
