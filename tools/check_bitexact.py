"""STRICT bit-exact oracle audit (round 11).

Usage: python3 tools/check_bitexact.py <verify_out_dir> <sf_dir>

Stronger than check_oracle.py's driver mirror: every float column is
compared by IEEE-754 BIT PATTERN (no tolerance, no rounding), every other
column exactly, and pandas dtypes must be IDENTICAL (not just same class).
This is the gate that surfaced the r11 exactness classes (libm ulps,
DuckDB decimal-literal double rounding, shortest-string decimal casts,
int128->double rounding). A query passing this cannot hash-mismatch under
ANY value-faithful driver comparison.
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v,(list,np.ndarray)) else v)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)
fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    exp = con.execute(oracle[name]).fetchdf()
    g, e = canon(got), canon(exp)
    print(f"-- {name}")
    print("  spark dtypes:", dict(g.dtypes.astype(str)))
    print("  duck  dtypes:", dict(e.dtypes.astype(str)))
    if list(g.columns) != list(e.columns):
        print("  ✗ columns differ"); fails += 1; continue
    if len(g) != len(e):
        print(f"  ✗ rows differ {len(g)} vs {len(e)}"); fails += 1; continue
    bad = False
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        if str(g[c].dtype).startswith("float") and str(e[c].dtype).startswith("float"):
            neq = [(i, gv[i], ev[i]) for i in range(len(gv))
                   if np.float64(gv[i]).tobytes() != np.float64(ev[i]).tobytes()]
        else:
            if str(g[c].dtype) != str(e[c].dtype):
                print(f"  ✗ col {c}: DTYPE mismatch {g[c].dtype} vs {e[c].dtype}"); bad = True; continue
            neq = [(i, gv[i], ev[i]) for i in range(len(gv)) if not (gv[i]==ev[i] or (pd.isna(gv[i]) and pd.isna(ev[i])))]
        if neq:
            print(f"  ✗ col {c}: {len(neq)} bit-unequal rows, e.g. {neq[:3]}"); bad = True
    if bad: fails += 1
    else: print("  ✓ BIT-EXACT")
print("fails:", fails)
sys.exit(1 if fails else 0)
