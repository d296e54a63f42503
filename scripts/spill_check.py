#!/usr/bin/env python3
"""Constrained-memory spill gate (round-13 verdict #2).

Runs graft.SpillBench twice over the same SF dir — once at the normal
16 GiB heap (reference answers) and once at a small heap (default 3 GiB,
where the 20 heaviest queries must SPILL to survive) — then asserts every
query finished (zero OOM/err) with identical row counts and identical
order-independent content hashes. Memory pressure may change timing and
spill volume, never answers.

Usage: python3 scripts/spill_check.py [sfdir] [--heap 3g] [--out BENCH_spill_rN.json]
       python3 scripts/spill_check.py --compare-only  # reuse /tmp jsons
"""
import json, subprocess, sys
from pathlib import Path

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = args[0] if args else "/root/testdata/sf0.1"
HEAP = sys.argv[sys.argv.index("--heap") + 1] if "--heap" in sys.argv else "3g"
OUT = (sys.argv[sys.argv.index("--out") + 1]
       if "--out" in sys.argv else "BENCH_spill_r13.json")
REF_JSON, SMALL_JSON = "/tmp/spill_ref.json", "/tmp/spill_small.json"

def run(heap, out):
    print(f"[spill_check] SpillBench heap={heap} -> {out}", flush=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.SpillBench {SF} {out}"],
        cwd="/root/repo", capture_output=True, text=True,
        env={**__import__("os").environ, "SPARK_DRIVER_MEM": heap})
    if r.returncode != 0:
        print("\n".join((r.stdout + r.stderr).splitlines()[-30:]))
        sys.exit(1)

if "--compare-only" not in sys.argv:
    run("16g", REF_JSON)
    run(HEAP, SMALL_JSON)

ref = json.loads(Path(REF_JSON).read_text())
small = json.loads(Path(SMALL_JSON).read_text())
bad, rows = [], {}
for name, rq in ref["queries"].items():
    sq = small["queries"].get(name)
    ok = (sq is not None and rq["err"] is None and sq["err"] is None
          and rq["rows"] == sq["rows"] and rq["hash"] == sq["hash"]
          and rq["rows"] >= 0)
    if not ok:
        bad.append(f"{name}: ref={rq} small={sq}")
    rows[name] = {
        "rows": rq["rows"], "hash": rq["hash"],
        "wall_ref": rq["wall"], "wall_small": sq["wall"] if sq else None,
        "err_small": sq["err"] if sq else "MISSING", "match": ok}
    tag = "PASS" if ok else "FAIL"
    print(f"{tag} {name}: rows={rq['rows']} wall {rq['wall']:.2f}s -> "
          f"{sq['wall'] if sq else '?'}s under {small['heap_mb']}MB")

artifact = {
    "metric": "spill_tier", "sf_dir": SF,
    "heap_ref_mb": ref["heap_mb"], "heap_small_mb": small["heap_mb"],
    "cpus": small["cpus"], "n_queries": len(ref["queries"]),
    "n_match": sum(1 for v in rows.values() if v["match"]),
    "all_match": not bad, "queries": rows}
Path(OUT).write_text(json.dumps(artifact, indent=1))
print(f"\n{artifact['n_match']}/{artifact['n_queries']} heavy queries "
      f"hash-identical under the {small['heap_mb']}MB heap -> {OUT}")
sys.exit(0 if not bad else 2)
