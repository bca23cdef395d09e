#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name1,name2,...]

Reads each <outDir>/<name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same
sfDir tables, sorts columns by name and rows by value, and diffs. The
optional 3rd arg restricts the check to a comma-separated name list
(matching graft.Verify's filter arg for targeted runs); without it every
oracle entry must have output, exactly like the driver's gate.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify lists for sorting; keep floats as floats
    key = df.apply(lambda r: tuple(str(x) for x in r), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[key.argsort(kind="stable").values].reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        if len(got) == 0:
            print(f"WARN {name}: zero rows (driver requires rows>0)"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            # Declared-type parity: the driver hashes typed values, so ANY
            # dtype mismatch between the Spark result and the oracle (int vs
            # float, int32 vs int64, object vs numeric) MUST fail here even
            # when every value prints identically. Only float-vs-float keeps
            # a tolerance branch (accumulation-order noise is real there).
            g_flt = np.issubdtype(g.dtype, np.floating)
            w_flt = np.issubdtype(w.dtype, np.floating)
            # datetime64 unit differs only by pandas reader (parquet ns vs
            # DuckDB us) — same declared TIMESTAMP type, values compared below
            g_dt = np.issubdtype(g.dtype, np.datetime64)
            w_dt = np.issubdtype(w.dtype, np.datetime64)
            if not (g_flt and w_flt) and not (g_dt and w_dt) and g.dtype != w.dtype:
                bad = (f"col {c}: dtype mismatch {g.dtype} vs {w.dtype} "
                       f"(driver hash compares typed values — cast the oracle)")
                break
            if g_flt or w_flt:
                gv = g.astype(float).values; wv = w.astype(float).values
                both_nan = np.isnan(gv) & np.isnan(wv)
                diff = np.abs(gv - wv)
                diff[both_nan] = 0
                if np.nanmax(diff) > 1e-9 or (np.isnan(gv) != np.isnan(wv)).any():
                    bad = f"col {c}: max diff {np.nanmax(diff)}"
                    break
            else:
                if not (g.astype(str).values == w.astype(str).values).all():
                    i = np.argmax(g.astype(str).values != w.astype(str).values)
                    bad = f"col {c}: row {i}: {g.iloc[i]!r} vs {w.iloc[i]!r}"
                    break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
