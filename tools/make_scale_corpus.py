#!/usr/bin/env python3
"""Derive the sf1.0 scale-probe corpus under .scale/sf1 (dev tooling, not
part of the library; see SURVEY.md §8).

10 replicas of the sf0.1 documents table with disjoint doc_id ranges
(r*10^7 keeps the operators' +3M/+5M planted-id shifts collision-free)
and per-replica word suffixing, so shingles/windows are distinct across
replicas and duplicate DENSITY matches sf0.1 instead of being 10x
inflated by exact copies. lineitem is replicated 10x for the bench's
q1_pricing control probe. Measured scale: 10.0x words, 13.64x chars.

Usage: python3 tools/make_scale_corpus.py
"""
import os
import duckdb

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1")
SRC = "/root/testdata/sf0.1"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT d.doc_id + r.r * 10000000 AS doc_id,
         array_to_string(list_transform(string_split(d.text, ' '),
           w -> w || '~' || r.r), ' ') AS text,
         d.lang, d.source,
         length(array_to_string(list_transform(string_split(d.text, ' '),
           w -> w || '~' || r.r), ' ')) AS n_chars
  FROM '{SRC}/documents.parquet' d
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")
# full TPC-H family 10x with CONSISTENT key shifts (disjoint replicas:
# per-key densities stay at sf0.1 levels — the "bigger catalog" scale-up):
# orderkey +r*10^8, custkey +r*10^5, partkey +r*10^6, suppkey +r*10^5.
# nation/region are fixed dimensions and copy through unshifted.
con.execute(f"""
COPY (
  SELECT l.* REPLACE (l.l_orderkey + r.r * 100000000 AS l_orderkey,
                      l.l_partkey + r.r * 1000000 AS l_partkey,
                      l.l_suppkey + r.r * 100000 AS l_suppkey)
  FROM '{SRC}/lineitem.parquet' l
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT o.* REPLACE (o.o_orderkey + r.r * 100000000 AS o_orderkey,
                      o.o_custkey + r.r * 100000 AS o_custkey)
  FROM '{SRC}/orders.parquet' o
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT c.* REPLACE (c.c_custkey + r.r * 100000 AS c_custkey)
  FROM '{SRC}/customer.parquet' c
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT p.* REPLACE (p.p_partkey + r.r * 1000000 AS p_partkey)
  FROM '{SRC}/part.parquet' p
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/part.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT s.* REPLACE (s.s_suppkey + r.r * 100000 AS s_suppkey)
  FROM '{SRC}/supplier.parquet' s
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/supplier.parquet' (FORMAT PARQUET)
""")
for t in ("nation", "region"):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
# events 10x for the event-analytics probe: disjoint event_id/user_id
# ranges per replica, timestamps UNCHANGED — same span, 10x density (the
# realistic traffic scale-up: per-user series keep sf0.1 shape, per-hour
# volumes grow 10x). DuckDB rewrites ts as TIMESTAMP(US); Tables.events
# handles that branch natively.
con.execute(f"""
COPY (
  SELECT e.event_id + r.r * 100000000 AS event_id, e.ts,
         e.user_id + r.r * 10000 AS user_id,
         e.event_type, e.value, e.props
  FROM '{SRC}/events.parquet' e
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")
# embeddings 10x for the ANN/vector-family probe: per-replica DIMENSION
# ROTATION (embedding[r+1:] || embedding[:r]) keeps the norm distribution
# identical while decorrelating replicas, so near-dup/recall density stays
# at sf0.1 levels instead of every vector gaining 9 exact twins.
con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * 10000000 AS vec_id,
         CAST(e.embedding[(r.r + 1):] || e.embedding[1:r.r] AS FLOAT[]) AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r) r
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")
print(con.execute(
    f"SELECT count(*), min(doc_id), max(doc_id) FROM '{OUT}/documents.parquet'"
).fetchall())
