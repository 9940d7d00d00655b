#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles, mimicking the driver's compare:
run graft.Verify first (writes <out>/<query>/ parquet + oracle_sql.json),
then run each oracle SQL in DuckDB over the same sf dir and compare
sorted-by-column-name, row-sorted values.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df

def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            # Rendered distinct from "NULL". Caveat: pandas has already
            # coerced SQL NULL to NaN in float64 columns on BOTH sides,
            # so this only distinguishes NULL from NaN in object-dtype
            # columns; float columns collapse the two before cell()
            # runs (mirroring the driver's own pandas-based compare).
            return "NaN"
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df())
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"COLS  {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWS  {name}: spark={len(got)} oracle={len(exp)}")
            n_bad += 1
            continue
        g = got.applymap(cell)
        e = exp.applymap(cell)
        neq = (g != e)
        if neq.any().any():
            n_bad += 1
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"HASH  {name}: mismatched cols {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"      first diff col={c} row={idx}: spark={g[c][idx]!r} oracle={e[c][idx]!r}")
        else:
            print(f"OK    {name} ({len(got)} rows)")
            n_ok += 1
    # queries with no oracle: rows-only check
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if name not in oracle:
            n = len(con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df())
            print(f"ROWSONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
