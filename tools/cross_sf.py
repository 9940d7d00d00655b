#!/usr/bin/env python3
"""Cross-SF correctness gate → CROSS_SF.json (repo root).

The per-round driver verifies every query at sf0.01 only. PROGRESS.md
has long claimed "green at sf0.001/sf0.01/sf0.1 as well" for each new
query — this tool turns that claim into a committed, judge-readable
artifact: it runs graft.Verify + the DuckDB compare at

  * sf0.001 — EVERY query (cheap; catches empty-slice degeneracies the
    bigger fixtures hide), and
  * sf0.1 — a deterministic ROTATING subset (md5(name + salt) % k == 0)
    plus any names passed with --must, so over rounds the whole
    registry cycles through the expensive leg while each run stays
    bounded.

Usage: cross_sf.py [--salt N] [--mod K] [--must q_a,q_b] [--skip-run]
  --salt     rotation salt (default: 0); bump per round to rotate
  --mod      subset modulus for sf0.1 (default 6 → ~1/6 of queries)
  --must     comma-separated names forced into the sf0.1 leg
  --skip-run reuse existing /tmp/cross_sf_* verify output (dev loop)

Writes CROSS_SF.json:
  {"salt": …, "sf0.001": {"q_x": "ok" | "<failure tag>"…},
   "sf0.1": {…}, "degeneracy": {"sf0.001": {"flagged": {}, …}, …},
   "summary": {"sf0.001": [ok, bad], "sf0.1": [ok, bad]}}

The `degeneracy` block embeds each leg's Verify degeneracy sidecar
(the q_ab_test-class gate) so it is judge-readable from the committed
artifact without re-running Verify; non-empty `flagged` fails the run.
"""
import sys, os, subprocess, json, glob, hashlib, math
import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns),
                        key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def compare(sf_dir, out_dir, names=None):
    """Per-query status map, mimicking the driver's DuckDB compare."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    status = {}
    for name in sorted(oracle):
        if names is not None and name not in names:
            continue
        qdir = f"{out_dir}/{name}"
        if not glob.glob(f"{qdir}/*.parquet"):
            status[name] = "miss: no spark output"
            continue
        try:
            got = canon(con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df())
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            status[name] = f"err: {str(e)[:120]}"
            continue
        if list(got.columns) != list(exp.columns):
            status[name] = f"cols: spark={list(got.columns)} oracle={list(exp.columns)}"
        elif len(got) != len(exp):
            status[name] = f"rows: spark={len(got)} oracle={len(exp)}"
        elif (got.astype(object).map(cell) != exp.astype(object).map(cell)).any().any():
            status[name] = "hash: value mismatch"
        else:
            status[name] = "ok"
    return status


def run_verify(sf_dir, out_dir, names=None):
    cmd = ["sbt", "-batch",
           "runMain graft.Verify %s %s%s" % (
               sf_dir, out_dir, (" " + ",".join(sorted(names))) if names else "")]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(cmd, cwd=REPO, env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if r.returncode != 0:
        print(f"verify failed for {sf_dir}", file=sys.stderr)
        sys.exit(2)


def main(argv):
    salt, mod, must, skip_run = 0, 6, set(), False
    it = iter(argv)
    for a in it:
        if a == "--salt":
            salt = int(next(it))
        elif a == "--mod":
            mod = int(next(it))
        elif a == "--must":
            must = set(next(it).split(","))
        elif a == "--skip-run":
            skip_run = True
    out001 = "/tmp/cross_sf0.001"
    out01 = "/tmp/cross_sf0.1"
    if not skip_run:
        run_verify("/root/testdata/sf0.001", out001)
    s001 = compare("/root/testdata/sf0.001", out001)
    names = sorted(s001)
    subset = sorted(
        {n for n in names
         if int(hashlib.md5(f"{n}:{salt}".encode()).hexdigest(), 16) % mod == 0}
        | (must & set(names)))
    if not skip_run:
        run_verify("/root/testdata/sf0.1", out01, subset)
    s01 = compare("/root/testdata/sf0.1", out01, set(subset))

    # Fold the Verify degeneracy sidecars into the committed artifact
    # (r13 verdict #3: the gate was only readable by re-running Verify).
    # `flagged` must be {} at every leg; `allowlisted` stays visible so
    # a reader can check each excuse against SparkEntry.allowDegenerate.
    def degeneracy(out_dir):
        p = f"{out_dir}/degeneracy.json"
        if not os.path.exists(p):
            return {"flagged": None, "allowlisted": None,
                    "err": "degeneracy.json missing"}
        return json.load(open(p))

    deg = {"sf0.001": degeneracy(out001), "sf0.1": degeneracy(out01)}
    art = {
        "tool": "tools/cross_sf.py",
        "salt": salt, "mod": mod,
        "sf0.001": s001,
        "sf0.1": s01,
        "degeneracy": deg,
        "summary": {
            "sf0.001": [sum(v == "ok" for v in s001.values()),
                        sum(v != "ok" for v in s001.values())],
            "sf0.1": [sum(v == "ok" for v in s01.values()),
                      sum(v != "ok" for v in s01.values())],
        },
    }
    with open(os.path.join(REPO, "CROSS_SF.json"), "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"sf0.001: {art['summary']['sf0.001']}  "
          f"sf0.1({len(subset)} queries): {art['summary']['sf0.1']}")
    n_deg = sum(len(deg[sf].get("flagged") or {}) for sf in deg)
    for sf in deg:
        for n, fs in sorted((deg[sf].get("flagged") or {}).items()):
            print(f"  DEGENERATE {sf} {n}: {fs}")
    bad = (art["summary"]["sf0.001"][1] + art["summary"]["sf0.1"][1]
           + n_deg)
    for sf in ("sf0.001", "sf0.1"):
        for n, v in sorted(art[sf].items()):
            if v != "ok":
                print(f"  BAD {sf} {n}: {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
