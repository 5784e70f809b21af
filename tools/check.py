#!/usr/bin/env python3
"""Local pre-verification harness (dev tool only, mirrors the driver's gate):
runs graft.Verify output dirs against the DuckDB oracle and compares
row-for-row, column names sorted, values exact (with a float ulp report).

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark_result(d):
    return ds.dataset(d, format="parquet").to_table().to_pandas()

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = load_spark_result(spark_dir)
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # sort rows deterministically on all columns (stringified) like a
        # hash gate would; vectorized string concat (not .apply) so sf1-scale
        # results (millions of rows) compare in seconds
        import pandas as pd
        def rowkeys(df):
            if not len(df):
                return pd.Series([], dtype=str)
            s = df.iloc[:, 0].astype(str)
            for c in df.columns[1:]:
                s = s + "|" + df[c].astype(str)
            return s.sort_values().reset_index(drop=True)
        gs = rowkeys(got)
        es = rowkeys(exp)
        if gs.equals(es):
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            diff = (gs != es)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())}/{len(gs)} rows differ")
            for i in idx:
                print(f"   spark: {gs[i]}\n   duck : {es[i]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
