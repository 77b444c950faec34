#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
SQL from oracle_sql.json in DuckDB over the testdata tables, and compares:
row count, column names, and a value hash over rows sorted by all columns
(column order normalized by name). Floats compared after round(9).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def dtype_class(dt) -> str:
    """Pandas-representation class for the dtype-parity lint (round 11).

    The driver hashes each engine's fetched pandas frame, so EQUAL values in
    different pandas representations hash apart. int-vs-float is unified by
    the driver's canonicalization (dozens of driver-green queries fetch
    DuckDB HUGEINT window sums as float64 against Spark int64), but an
    `object` column (e.g. Spark decimal(38,0) -> Decimal objects vs DuckDB
    HUGEINT -> float64 — the r10 q219 failure) is NOT. Classes: numeric
    (int/uint/float), bool, datetime, object; any cross-class pair except
    within-numeric is a lint failure."""
    s = str(dt)
    if s.startswith(("int", "uint", "float")):
        return "numeric"
    if s.startswith("datetime"):
        return "datetime"
    if s == "bool":
        return "bool"
    return "object"

def dtype_lint(name, g: pd.DataFrame, e: pd.DataFrame):
    """Return list of (col, spark_dtype, duck_dtype) representation clashes."""
    bad = []
    for c in g.columns:
        if c in e.columns and dtype_class(g[c].dtype) != dtype_class(e[c].dtype):
            bad.append((c, str(g[c].dtype), str(e[c].dtype)))
    return bad

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  ROWS-ONLY {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok = True
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: columns differ spark={list(g.columns)} duck={list(e.columns)}")
            ok = False
        elif len(g) != len(e):
            print(f"✗ {name}: rows differ spark={len(g)} duck={len(e)}")
            ok = False
        elif (clash := dtype_lint(name, g, e)):
            print(f"✗ {name}: dtype-representation clash (driver hash would "
                  f"differ on equal values): {clash}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as ex:
                print(f"✗ {name}: values differ: {str(ex)[:500]}")
                ok = False
        if ok:
            print(f"✓ {name}: rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
