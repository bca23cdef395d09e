#!/usr/bin/env python3
"""Local dev-loop oracle check: compare Verify.scala parquet dumps against
DuckDB running SparkEntry.oracleSql over the same testdata parquet.

Usage:  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [q1,q2,...]

Run the Spark side first:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out q1,q2"

Mirrors the driver gate (row count, column-name set, typed value hash over
rows with columns sorted by name) with ONE divergence: rows whose floats
differ by <1e-6 across a round(6) boundary are reported as
"WARN float-tolerance", NOT "ok" — the driver's exact typed value hash
WOULD reject them, so a tolerance row means the query needs the repo's
round/quantize conventions tightened before it can be trusted to pass the
driver. Tolerance rows exit 0 only under --allow-float-tol; by default
they count as failures so local green == driver green.
"""
import sys, json, glob, os, math, re
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def type_class(t):
    """Collapse a DuckDB logical type to the class the driver's typed value
    hash distinguishes: int vs float vs string vs time vs bool (5 == 5.0 in
    Python, so without this an int-vs-double column passes locally but fails
    the driver)."""
    s = str(t).upper()
    s = re.sub(r"\(.*\)", "", s)  # DECIMAL(p,s) -> DECIMAL
    suffix = "[]" if s.endswith("[]") else ""
    s = s.rstrip("[]")
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        c = "int"
    elif s in ("FLOAT", "REAL", "DOUBLE", "DECIMAL", "HUGEINT", "UHUGEINT"):
        # HUGEINT/DECIMAL classify as what PANDAS (and hence the driver's
        # typed hash) makes of them — float64 — not their logical class.
        # The r12-r14 text_unigram_curve red was a HUGEINT quotient that
        # this function used to bucket as "int", hiding the driver
        # int-vs-float mismatch for three rounds.
        c = "float"
    elif s.startswith("TIMESTAMP") or s == "DATE":
        c = "time"  # midnight datetime == date (driver semantics)
    else:
        c = s
    return c + suffix

def rows_close(a, b):
    """Pairwise tolerance compare for the float fallback: exact for
    non-floats, isclose for floats (fixed round(6) flips values that differ
    by <1e-9 across a rounding boundary)."""
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(rows_close(x, y) for x, y in zip(a, b))
    return a == b

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
    args = [a for a in sys.argv[1:] if a != "--allow-float-tol"]
    allow_tol = "--allow-float-tol" in sys.argv[1:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2].split(",")) if len(args) > 2 else None
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fails = 0
    warns = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        d = os.path.join(outdir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
        sp = con.sql(f"SELECT * FROM '{files[0]}'")
        sp_cols, sp_types = list(sp.columns), list(sp.types)
        sp_rows = sp.fetchall()
        try:
            oc = con.sql(sql)
            oc_cols, oc_types = list(oc.columns), list(oc.types)
            oc_rows = oc.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}"); fails += 1; continue
        # Hard-fail any oracle result column whose DuckDB type is
        # HUGEINT/DECIMAL: the driver's pandas conversion renders those as
        # float64 while the Spark parquet usually carries int64, so such an
        # oracle can NEVER hash-match at the driver even when every value is
        # identical. A clean suite has zero of these (cast in the SQL).
        wide = {c: str(t).upper() for c, t in zip(oc_cols, oc_types)
                if re.sub(r"\(.*\)", "", str(t).upper()).rstrip("[]")
                in ("HUGEINT", "UHUGEINT", "DECIMAL")}
        if wide:
            print(f"{name}: ORACLE TYPE {wide} — cast to BIGINT/DOUBLE in "
                  "the SQL (pandas would render these float64 at the driver)")
            fails += 1; continue
        if sorted(sp_cols) != sorted(oc_cols):
            print(f"{name}: SCHEMA spark={sorted(sp_cols)} oracle={sorted(oc_cols)}")
            fails += 1; continue
        # dtype gate, mirroring the driver's typed value hash
        sp_t = {c: type_class(t) for c, t in zip(sp_cols, sp_types)}
        oc_t = {c: type_class(t) for c, t in zip(oc_cols, oc_types)}
        badt = {c: (sp_t[c], oc_t[c]) for c in sp_t if sp_t[c] != oc_t[c]}
        if badt:
            print(f"{name}: DTYPE mismatch {badt}")
            fails += 1; continue
        if len(sp_rows) != len(oc_rows):
            print(f"{name}: ROWS spark={len(sp_rows)} oracle={len(oc_rows)}")
            fails += 1; continue
        if not sp_rows:
            # the driver smoke-checks rows>0; an empty result is a FAIL here
            # too, not a vacuous pass
            print(f"{name}: ZERO ROWS"); fails += 1; continue
        a, b = canon(sp_rows, sp_cols), canon(oc_rows, oc_cols)
        if a != b:
            # float fallback: rows that only differ by <tolerance across a
            # round(6) boundary are a WARNING, not an ok — the driver's
            # exact typed value hash would reject them
            if all(rows_close(x, y) for x, y in zip(a, b)):
                print(f"{name}: WARN float-tolerance ({len(sp_rows)} rows — "
                      "driver's exact hash would FAIL this)")
                warns += 1; continue
            diff = [(x, y) for x, y in zip(a, b) if not rows_close(x, y)][:3]
            print(f"{name}: HASH mismatch, first diffs {diff}")
            fails += 1; continue
        print(f"{name}: ok ({len(sp_rows)} rows)")
    if warns:
        print(f"{warns} float-tolerance warning(s)"
              + ("" if allow_tol else " (counted as failures; pass --allow-float-tol to tolerate)"))
    sys.exit(1 if fails or (warns and not allow_tol) else 0)

if __name__ == "__main__":
    main()
