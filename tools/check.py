#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only; the
engine itself is pure Scala/Spark).
Usage: check.py <sfDir> <verifyOutDir> [--json <summary.json>].

Mirrors the described contract: run each oracle SQL in DuckDB over views of
the fixture parquet, load the Spark result parquet, sort columns by name,
sort rows, compare values exactly.

--json writes a durable per-query record (the round's committed
CORRECTNESS_LOCAL file): {"pass": N, "fail": N, "queries": {name:
{"status": "pass"|"fail", "rows": N, "detail": ...}}} — so the round's
correctness evidence survives even when the official driver artifact
comes back empty (r02/r06 were {}).
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

def main(sfdir, outdir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    record = {}
    def fail(name, detail):
        nonlocal n_fail
        print(f"FAIL {name}: {detail}"); n_fail += 1
        record[name] = {"status": "fail", "detail": str(detail)[:500]}
    for name in sorted(oracle):
        sql = oracle[name]
        rp = f"{outdir}/{name}"
        if not glob.glob(f"{rp}/*.parquet"):
            fail(name, f"no spark result at {rp}"); continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            fail(name, f"oracle error {e}"); continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{rp}/*.parquet')").fetchdf()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            fail(name, f"columns {list(g.columns)} != {list(e.columns)}")
            continue
        if len(g) != len(e):
            fail(name, f"rows {len(g)} != {len(e)}"); continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
            record[name] = {"status": "pass", "rows": len(g)}
        except AssertionError as ex:
            fail(name, str(ex))
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        # declared-but-undumped queries (a truncated Verify run) must be
        # visible in the durable record, not silently absent
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sfdir, "pass": n_pass, "fail": n_fail,
                       "declared": len(oracle), "queries": record},
                      f, indent=1, sort_keys=True)
    # zero comparisons (empty oracle_sql.json / wrong outDir) is NOT a pass
    return 1 if n_fail or not n_pass else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    jo = None
    if "--json" in args:
        i = args.index("--json"); jo = args[i + 1]; del args[i:i + 2]
    sys.exit(main(args[0], args[1], jo))
