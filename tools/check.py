#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only; the
engine itself is pure Scala/Spark).
Usage: check.py <sfDir> <verifyOutDir> [--json <summary.json>].

Mirrors the described contract: run each oracle SQL in DuckDB over views of
the fixture parquet, load the Spark result parquet, sort columns by name,
sort rows, compare values exactly — then HASH both frames through one
canonical value rendering (the driver-mirroring mode added after r7, when
pandas' exact compare said 193/193 but the driver's hash said 192/193):
sorted columns, sorted rows, shortest-roundtrip float repr (distinguishes
-0.0 and NaN, which pandas' array comparison may conflate), ISO timestamps,
hex bytes. A query passes ONLY if the hashes match.

Additionally every query gets an ULP-RISK audit: any float64 output column
whose values are NOT 9-dp-quantized (v != round(v, 9)) is flagged. Those are
the columns that can drift by an ulp when the driver's DuckDB version
differs from the local one — the one failure class a local compare cannot
otherwise see (r7's nucleus_per_group was byte-exact under local DuckDB
1.0.0 and still failed the official hash). Risky columns are advisory, not
failures: some outputs legitimately relocate input doubles untouched. The
repo convention is that every COMPUTED double column closes through
round(_, 9) on both engines.

--json writes a durable per-query record (the round's committed
CORRECTNESS_LOCAL file): {"pass": N, "fail": N, "queries": {name:
{"status": "pass"|"fail", "rows": N, ...}}} — so the round's correctness
evidence survives even when the official driver artifact comes back empty
(r02/r06 were {}).
"""
import sys, os, json, glob, math, hashlib, datetime, decimal
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# r9 triage of intentionally-unquantized double outputs (VERDICT r8 ask
# #4). Every entry was inspected column-by-column against BOTH renderings
# (Spark query + oracle SQL); class semantics:
#   'ieee-closed'  final value is a FIXED-ORDER chain of IEEE basic ops
#                  (+,-,*,/ — and sqrt, all correctly-rounded by every
#                  conforming engine) over EXACT inputs: integer counts,
#                  DECIMAL/HUGEINT accumulations, or mid-chain
#                  9-dp-quantized transcendentals (mi_screen quantizes
#                  each LN term through DECIMAL(18,9) before summing).
#                  Bit-identical on any engine version by construction —
#                  no reassociated double accumulation, no bare libm in
#                  the final value.
#   'relocated'    input parquet doubles (or exact scale-4 decimals)
#                  passed through / CASE-selected / single-op adjusted.
#   'quantized-15' deliberately 15-dp-quantized per iteration with exact
#                  DECIMAL(28,15) accumulation in between (PageRank) —
#                  finer than the suite's 9 dp, still version-stable.
# A column NOT listed here that fails the 9-dp audit is a REAL risk and
# stays in ulp_risk; documented ones move to ulp_documented in the JSON.
ULP_DOCUMENTED = {
    "ab_cmh_stratified": ("ieee-closed", {"cmh_chi2", "or_mh"}),
    "ab_proportion": ("ieee-closed", {"ctrl_hi", "ctrl_lo", "diff", "mde",
        "p_ctrl", "p_treat", "treat_hi", "treat_lo", "z_stat"}),
    "ann_ivf_drift": ("ieee-closed", {"mean_cos"}),
    "attribution_shapley": ("ieee-closed", {"shapley_conv", "share"}),
    "basket_pairs": ("ieee-closed", {"lift"}),
    "basket_rules": ("ieee-closed", {"confidence", "lift"}),
    "chi2_screen": ("ieee-closed", {"chi2", "cramers_v"}),
    "conformal_interval": ("ieee-closed", {"coverage", "q_resid"}),
    "dedup_ngram_jaccard": ("ieee-closed", {"jaccard"}),
    "embedding_centroids": ("ieee-closed", {"centroid", "variance"}),
    "embedding_pca": ("ieee-closed", {"var_explained"}),
    "ipw_ate": ("ieee-closed", {"e_hat", "effect", "mean_ctrl",
        "mean_treat"}),
    "mi_screen": ("ieee-closed", {"nmi"}),
    "pos_ratio_window": ("ieee-closed", {"class_ratio"}),
    "product_pagerank": ("quantized-15", {"rank"}),
    "psm_match": ("ieee-closed", {"att"}),
    "quality_cutoff_gate": ("ieee-closed", {"cutoff"}),
    "quality_expectations": ("ieee-closed", {"observed"}),
    "quality_filter": ("ieee-closed", {"avg_token_len", "stopword_ratio"}),
    "quality_top_share": ("ieee-closed", {"q_rank"}),
    "skew_salted_join": ("relocated", {"amount_paid"}),
    "spend_acf": ("ieee-closed", {"acf"}),
    "spend_drift_ks": ("ieee-closed", {"ks"}),
    "spend_ols_trend": ("ieee-closed", {"intercept", "r2", "slope"}),
    "spend_percent_rank": ("ieee-closed", {"spend_cd", "spend_pr"}),
    "spend_seasonal_decompose": ("ieee-closed", {"residual", "seasonal"}),
    "text_repetition": ("ieee-closed", {"repetition_ratio"}),
    "text_stats": ("ieee-closed", {"avg_token_len", "stopword_ratio"}),
    "transactions_adj": ("relocated", {"amount_paid",
        "campaign_coupon_discount", "instore_discount",
        "manuf_coupon_discount", "total_coupon_discount"}),
    "uplift_qini": ("ieee-closed", {"qini", "uplift"}),
    "user_rolling": ("ieee-closed", {"avg_3"}),
}

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable sort/compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cv(v):
    """One canonical rendering per value — identical for identical logical
    values regardless of source engine, distinct for anything a value hash
    would distinguish (-0.0, NaN, ulp-level float differences)."""
    if v is None:
        return "N"
    # np.floating covers float32/float64 scalars (DuckDB FLOAT columns
    # come back float32 via fetchdf) — without it a float32 falls through
    # to str() and hash-fails against the float64 repr of the same value.
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest roundtrip; '-0.0' != '0.0'
    # bool before int (bool subclasses int); both render as before
    # ('True'/'False', '5') so existing hashes are unchanged
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        try:
            if pd.isna(v):
                return "N"
        except (TypeError, ValueError):
            pass
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, decimal.Decimal):
        # scale-preserving; both engines carry the declared decimal scale
        return str(v)
    # containers must NOT fall through to str(): numpy's repr elides the
    # middle of long arrays ('...'), so two different arrays could hash
    # equal (false PASS). No current query outputs nested types; if one
    # ever does, fail loudly so it gets a flattened rendering here.
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise TypeError(f"cv(): unsupported container type {type(v)}; "
                        "flatten the query output or add an element-wise "
                        "rendering")
    try:
        if pd.isna(v):
            return "N"
    except (TypeError, ValueError):
        pass
    return str(v)

def frame_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("\x1f".join(cv(v) for v in row).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()

def risky_double_cols(df):
    """Float64 columns with any value not 9-dp-quantized: ulp-risk under a
    different oracle engine version."""
    out = []
    for c in df.columns:
        if str(df[c].dtype) != "float64":
            continue
        vals = df[c].dropna()
        if len(vals) and any(v != round(v, 9) for v in vals):
            out.append(c)
    return out

def main(sfdir, outdir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    record = {}
    risky_total = []
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
            gh, eh = frame_hash(g), frame_hash(e)
        except TypeError as ex:  # cv() rejects container-typed values
            fail(name, f"unhashable output: {ex}"); continue
        flagged = risky_double_cols(g)
        doc_cls, doc_cols = ULP_DOCUMENTED.get(name, (None, set()))
        documented = [c for c in flagged if c in doc_cols]
        risky = [c for c in flagged if c not in doc_cols]
        rtag = f" ULP-RISK:{','.join(risky)}" if risky else ""
        if documented:
            rtag += f" ulp-doc[{doc_cls}]:{len(documented)}"
        if risky:
            risky_total.append((name, risky))
        if gh == eh:
            print(f"PASS {name} ({len(g)} rows, hash {gh[:12]}){rtag}")
            n_pass += 1
            record[name] = {"status": "pass", "rows": len(g), "hash": gh}
            if risky:
                record[name]["ulp_risk_cols"] = risky
            if documented:
                record[name]["ulp_documented"] = {"class": doc_cls,
                                                  "cols": documented}
            continue
        # hash mismatch: run the pandas compare for a human-readable diff
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            detail = (f"value hash mismatch {gh[:12]} != {eh[:12]} but "
                      "pandas-exact-equal (sign-of-zero/NaN class)")
        except AssertionError as ex:
            detail = f"hash {gh[:12]} != {eh[:12]}: {ex}"
        fail(name, detail)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if risky_total:
        print(f"== ulp-risk (unquantized double outputs, advisory) "
              f"{len(risky_total)} queries ==")
        for name, cols in risky_total:
            print(f"  {name}: {','.join(cols)}")
    if json_out:
        # declared-but-undumped queries (a truncated Verify run) must be
        # visible in the durable record, not silently absent
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sfdir, "pass": n_pass, "fail": n_fail,
                       "declared": len(oracle),
                       "ulp_risk": {n: c for n, c in risky_total},
                       "queries": record},
                      f, indent=1, sort_keys=True)
    # zero comparisons (empty oracle_sql.json / wrong outDir) is NOT a pass
    return 1 if n_fail or not n_pass else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    jo = None
    if "--json" in args:
        i = args.index("--json"); jo = args[i + 1]; del args[i:i + 2]
    sys.exit(main(args[0], args[1], jo))
