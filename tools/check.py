#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run DuckDB on each oracle SQL
and compare, row by row / column-sorted-by-name, with the parquet dumped by
graft.Verify. Usage: python3 tools/check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            duck = con.execute(sql)
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        files = sorted(glob.glob(f"{out}/{name}/part-*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        sq = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [c[0] for c in sq.description]
        srows = sq.fetchall()
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns duck={sorted(dcols)} spark={sorted(scols)}")
            n_bad += 1
            continue
        dperm = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        dnorm = [tuple(norm(r[i]) for i in dperm) for r in drows]
        snorm = [tuple(norm(r[i]) for i in sperm) for r in srows]
        if len(dnorm) != len(snorm):
            print(f"FAIL {name}: rows duck={len(dnorm)} spark={len(snorm)}")
            n_bad += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(dnorm, snorm)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(dnorm)} rows differ; first @{i}:\n  duck : {a}\n  spark: {b}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(dnorm)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
