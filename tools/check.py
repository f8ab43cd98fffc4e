#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each parquet table in <sfDir> as a DuckDB view, runs every
query in <verifyOutDir>/oracle_sql.json, and compares against the
Spark-written parquet in <verifyOutDir>/<name>/ — columns sorted by
name, rows sorted, exact value compare (floats via repr).
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in idx))
    return sorted(out), [cols[i] for i in idx]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        s = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        og, oc = norm(orows, ocols)
        sg, sc = norm(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}"); n_fail += 1; continue
        if len(og) != len(sg):
            print(f"FAIL {name}: rowcount spark={len(sg)} oracle={len(og)}"); n_fail += 1; continue
        if og != sg:
            bad = [(a, b) for a, b in zip(sg, og) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs (spark vs oracle): {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(sg)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
