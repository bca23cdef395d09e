#!/usr/bin/env python3
"""Local dev-loop oracle check: compare Verify.scala parquet dumps against
DuckDB running SparkEntry.oracleSql over the same testdata parquet.

Usage:  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [q1,q2,...]

Run the Spark side first:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out q1,q2"

Mirrors the driver gate: row count, column-name set, and a value hash over
rows with columns sorted by name.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def norm(v):
    import datetime as dt
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        # midnight datetime and bare date compare equal (driver semantics)
        return dt.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        d = os.path.join(outdir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
        sp = con.execute(f"SELECT * FROM '{files[0]}'")
        sp_rows, sp_cols = sp.fetchall(), [c[0] for c in sp.description]
        try:
            oc = con.execute(sql)
            oc_rows, oc_cols = oc.fetchall(), [c[0] for c in oc.description]
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}"); fails += 1; continue
        if sorted(sp_cols) != sorted(oc_cols):
            print(f"{name}: SCHEMA spark={sorted(sp_cols)} oracle={sorted(oc_cols)}")
            fails += 1; continue
        if len(sp_rows) != len(oc_rows):
            print(f"{name}: ROWS spark={len(sp_rows)} oracle={len(oc_rows)}")
            fails += 1; continue
        a, b = canon(sp_rows, sp_cols), canon(oc_rows, oc_cols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"{name}: HASH mismatch, first diffs {diff}")
            fails += 1; continue
        print(f"{name}: ok ({len(sp_rows)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
