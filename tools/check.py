#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate — STRICT.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each parquet table in <sfDir> as a DuckDB view, runs every
query in <verifyOutDir>/oracle_sql.json, and compares against the
Spark-written parquet in <verifyOutDir>/<name>/ at the ARROW level:
  - column names (sorted) must match;
  - arrow types must match exactly after name-sort (timestamp unit and
    tz included — a timestamp[ns] vs timestamp[us] divergence is a FAIL
    even when the values print identically);
  - values compared in RESULT ORDER (not re-sorted) — queries must
    carry a total ORDER BY;
  - values compared by as_py() exact equality AND by raw-type repr.
Any residual divergence from the driver's CORRECTNESS_r*.json should be
treated as a harness bug here and fixed.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            ot = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        import pyarrow as pa
        st = pa.concat_tables([pq.read_table(f) for f in files])
        scols, ocols = sorted(st.schema.names), sorted(ot.schema.names)
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1; continue
        tmis = [(c, str(st.schema.field(c).type), str(ot.schema.field(c).type))
                for c in scols
                if st.schema.field(c).type != ot.schema.field(c).type]
        if tmis:
            print(f"FAIL {name}: arrow types differ {tmis}"); n_fail += 1; continue
        if st.num_rows != ot.num_rows:
            print(f"FAIL {name}: rowcount spark={st.num_rows} oracle={ot.num_rows}")
            n_fail += 1; continue
        sp = [tuple(st.column(c)[i].as_py() for c in scols) for i in range(st.num_rows)]
        dp = [tuple(ot.column(c)[i].as_py() for c in scols) for i in range(ot.num_rows)]
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sp, dp))
                 if a != b or repr(a) != repr(b)]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} row diffs, first (spark vs oracle): "
                  f"{diffs[0]}")
            n_fail += 1; continue
        print(f"PASS {name} ({st.num_rows} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
