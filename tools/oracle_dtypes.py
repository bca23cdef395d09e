#!/usr/bin/env python3
"""Suite-wide oracle RESULT-TYPE sweep: run every SparkEntry.oracleSql
through DuckDB over the testdata views and fail if ANY result column's
logical type is one that the driver's pandas conversion silently widens
to float64 — HUGEINT, UHUGEINT, DECIMAL.

Why this exists: DuckDB's sum(BIGINT) returns HUGEINT, and any arithmetic
over it propagates; pandas renders HUGEINT/DECIMAL as float64 while the
Spark parquet carries int64, so the driver's typed value hash rejects the
row even when every value is identical. This exact class shipped red in
r2 and again in r12-r14 (text_unigram_curve.compression_bp) because the
local gate used to classify by the pre-pandas logical type. Casting in the
SQL (`CAST(... AS BIGINT)`) is always the fix; this sweep makes the class
impossible to ship.

Usage:
  python3 tools/oracle_dtypes.py /root/testdata/sf0.001 <outdir>/oracle_sql.json

where oracle_sql.json is the dump Verify.scala writes. Exits 1 and names
every offending (query, column, type) if a wide type is found. Runs the
full 250+ suite in seconds at sf0.001 (results are LIMIT 0-prepared where
possible; falls back to full execution for SQL DuckDB cannot describe).
"""
import sys, json, os, re
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
WIDE = ("HUGEINT", "UHUGEINT", "DECIMAL")


def wide_cols(cols, types):
    out = {}
    for c, t in zip(cols, types):
        base = re.sub(r"\(.*\)", "", str(t).upper()).rstrip("[]")
        if base in WIDE:
            out[c] = str(t)
    return out


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad, errs = [], []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            w = wide_cols(rel.columns, rel.types)
        except Exception as e:
            errs.append((name, str(e).splitlines()[0]))
            continue
        if w:
            bad.append((name, w))
            print(f"{name}: WIDE {w}")
    for name, e in errs:
        print(f"{name}: ORACLE ERR {e}")
    n = len(oracle)
    if bad or errs:
        print(f"FAIL: {len(bad)} wide-typed / {len(errs)} erroring of {n} oracles")
        sys.exit(1)
    print(f"ok: {n} oracles, zero HUGEINT/DECIMAL result columns")


if __name__ == "__main__":
    main()
