#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing SparkEntry.oracleSql on the same tables,
compare values column-name-sorted (like the driver's hash compare).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df()

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def compare(a, b):
    """a=spark, b=duckdb; returns (ok, msg)."""
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: {len(a)} vs {len(b)}"
    a, b = norm(a), norm(b)
    # TYPE-STRICT gate first: the driver hashes values together with their
    # physical types, so a DuckDB HUGEINT (object/Decimal in pandas) vs a
    # Spark BIGINT (int64) fails the driver even when every value matches.
    # Coercing before comparing (the old behavior) masked exactly that class
    # of bug for two rounds — dtype mismatch is now a hard FAIL.
    for c in a.columns:
        ad, bd = a[c].dtype, b[c].dtype
        if str(ad) != str(bd):
            return False, (f"col {c}: DTYPE differs: spark={ad} vs duck={bd} "
                           f"(driver hash is type-sensitive — add a CAST in the oracle SQL)")
        if ad == object:
            # Full-column scan, not a head() sample: a payload-type switch
            # in the tail (e.g. HUGEINT overflow on one large value) is
            # exactly the bug this gate exists to catch.
            apy = {type(v).__name__ for v in a[c].dropna()}
            bpy = {type(v).__name__ for v in b[c].dropna()}
            if apy and bpy and apy != bpy:
                return False, (f"col {c}: object payload types differ: "
                               f"spark={sorted(apy)} vs duck={sorted(bpy)} "
                               f"(e.g. Decimal vs int — add a CAST in the oracle SQL)")
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                av = av.astype('float64'); bv = bv.astype('float64')
                eq = (av.isna() & bv.isna()) | (av == bv)
            elif av.dtype == object or bv.dtype == object:
                eq = (av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))
            else:
                av2 = av.astype('object'); bv2 = bv.astype('object')
                eq = (av.isna() & bv.isna()) | (av2 == bv2)
        except Exception as e:
            return False, f"col {c}: compare error {e}"
        if not eq.all():
            i = int(np.argmin(eq.values))
            return False, (f"col {c}: {int((~eq).sum())}/{len(eq)} mismatches, "
                           f"first at row {i}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}")
    return True, "ok"

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        ok, msg = compare(spark_df, duck_df)
        print(("PASS" if ok else "FAIL") + f" {name}: {msg}")
        n_ok += ok; n_fail += (not ok)
    # rows-only checks for queries without oracle
    for d in sorted(glob.glob(os.path.join(outdir, "q_*"))):
        name = os.path.basename(d)
        if name not in oracle:
            df = load_spark(outdir, name)
            rows = 0 if df is None else len(df)
            print(f"{'PASS' if rows > 0 else 'FAIL'} {name}: rows-only check, {rows} rows")
            n_ok += rows > 0; n_fail += rows == 0
    print(f"== {n_ok} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
