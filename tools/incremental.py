#!/usr/bin/env python3
"""Day-2 incremental-pipeline measurement → INCREMENTAL.json (repo root).

The persistent stage tier (SPARK_GRAFT_STAGE_ROOT + per-dataset
manifest, SparkEntry) exists so tomorrow's run deltas against today's
staged indexes instead of rebuilding them — the cross-run analogue of
the reference's staging+merge load (/root/reference/src/load.py:30-43).
StagePersistSpec proves adoption/invalidation semantics; this tool
measures the ECONOMICS the r13 verdict asked for: the same four delta
queries timed in two fresh JVMs against the same persistent store —

  * run 1 (COLD, "day 1"): empty store; each query's first-run number
    includes building every stage it needs (prewarm disabled via
    SPARK_GRAFT_SKIP_PREWARM so those builds stay in the timed cells);
  * run 2 (ADOPTED, "day 2"): a fresh JVM adopts the manifest-valid
    store, so the first-run numbers are the true incremental path —
    delta work against the standing index.

Both runs go through `graft.Bench --only …` (the same timing harness,
quiet gates and artifact discipline as the per-round bench).

Usage: incremental.py [--sf /root/testdata/sf0.1] [--store DIR]
Writes INCREMENTAL.json:
  {"queries": {q: {"cold": s, "adopted": s, "speedup": x}},
   "total": {"cold": s, "adopted": s, "speedup": x}, …}
"""
import sys, os, json, shutil, subprocess, re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["q_ann_ivf_delta", "q_dedup_minhash_delta",
           "q_dedup_prefix_delta", "q_dedup_cluster_delta"]


def run_bench(sf, store):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_CPUS="8",
               SPARK_GRAFT_STAGE_ROOT=store,
               SPARK_GRAFT_SKIP_PREWARM="1",
               SPARK_GRAFT_QUIET_MAX_WAIT_SEC="120",
               SPARK_GRAFT_MIDRUN_WAIT_BUDGET_SEC="120")
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench --only %s" % ",".join(QUERIES)],
        cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:], file=sys.stderr)
        print(r.stderr[-3000:], file=sys.stderr)
        sys.exit(2)
    lines = [l for l in r.stdout.splitlines()
             if l.startswith("{") and '"queries":' in l]
    if not lines:
        print("no bench JSON line in output", file=sys.stderr)
        sys.exit(2)
    art = json.loads(lines[-1])
    return art


def main(argv):
    sf, store = "/root/testdata/sf0.1", "/tmp/graft_incr_store"
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--store":
            store = next(it)
    shutil.rmtree(store, ignore_errors=True)
    cold = run_bench(sf, store)
    adopted = run_bench(sf, store)
    per = {}
    for q in QUERIES:
        c, a = cold["queries"].get(q, -1), adopted["queries"].get(q, -1)
        per[q] = {"cold_s": c, "adopted_s": a,
                  "speedup": round(c / a, 2) if c > 0 and a > 0 else None}
    ct = sum(v["cold_s"] for v in per.values() if v["cold_s"] > 0)
    at = sum(v["adopted_s"] for v in per.values() if v["adopted_s"] > 0)
    art = {
        "tool": "tools/incremental.py",
        "sf": sf,
        "queries": per,
        "total": {"cold_s": round(ct, 3), "adopted_s": round(at, 3),
                  "speedup": round(ct / at, 2) if at > 0 else None},
        # run-condition evidence so a loaded-box artifact self-adjudicates
        "conditions": {
            "cold": {k: cold.get(k) for k in
                     ("load_avg_before", "load_avg_1m", "max_load_1m",
                      "first_suspect", "errors", "persistent_stage_root")},
            "adopted": {k: adopted.get(k) for k in
                        ("load_avg_before", "load_avg_1m", "max_load_1m",
                         "first_suspect", "errors", "persistent_stage_root")},
        },
    }
    with open(os.path.join(REPO, "INCREMENTAL.json"), "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(json.dumps(art["total"]))
    for q, v in per.items():
        print(f"  {q}: cold {v['cold_s']}s -> adopted {v['adopted_s']}s "
              f"({v['speedup']}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
