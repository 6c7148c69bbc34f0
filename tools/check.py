#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only; the
engine itself is pure Scala/Spark). Usage: check.py <sfDir> <verifyOutDir>.

Mirrors the described contract: run each oracle SQL in DuckDB over views of
the fixture parquet, load the Spark result parquet, sort columns by name,
sort rows, compare values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable sort/compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        rp = f"{outdir}/{name}"
        if not glob.glob(f"{rp}/*.parquet"):
            print(f"FAIL {name}: no spark result at {rp}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{rp}/*.parquet')").fetchdf()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {str(ex)[:500]}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # zero comparisons (empty oracle_sql.json / wrong outDir) is NOT a pass
    return 1 if n_fail or not n_pass else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
