#!/usr/bin/env python3
"""Build an N-decade scale-up of the sf0.1 tables for scaling checks.

documents and events are replicated 10x with shifted ids; every replica's
text additionally mutates one token in seven (replica-tagged), so the
scaled corpus keeps a realistic duplication rate instead of giving every
document nine identical twins — exact replication would turn the dedup
operators' outputs quadratic in the replica count and measure the
pathology, not the operator. user_id is offset per replica so distinct
cardinalities also scale 10x (the HLL/funnel axis). Other tables copy
through unchanged.

Usage: python3 scripts/scaledata.py [outDir=/tmp/sfbig] [factor=10]
Then:  SPARK_GRAFT_SF_DIR=/tmp/sfbig sbt "runMain graft.BenchOne <queries>"
"""
import sys, glob, shutil, os
import duckdb

src = '/root/testdata/sf0.1'
dst = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sfbig'
factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
os.makedirs(dst, exist_ok=True)
for p in glob.glob(f'{src}/*.parquet'):
    if os.path.basename(p) not in ('documents.parquet', 'events.parquet',
                                   'embeddings.parquet', 'lineitem.parquet',
                                   'orders.parquet', 'customer.parquet'):
        shutil.copy(p, dst)

con = duckdb.connect()
# The TPC-H fact/bridge tables scale with per-replica key offsets that keep
# every FK consistent (lineitem->orders->customer); part/supplier/nation
# stay fixed-size, matching how dimensions grow far slower than facts. Each
# replica repeats the value distribution, so per-replica aggregates tie —
# fine for timing SHAPE, which is what the audit reads.
con.execute(f"""
COPY (
  SELECT l_orderkey + k * 1000000000 AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet')
  CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS k)
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT o_orderkey + k * 1000000000 AS o_orderkey,
         o_custkey + k * 100000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet')
  CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS k)
) TO '{dst}/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT c_custkey + k * 100000000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{src}/customer.parquet')
  CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS k)
) TO '{dst}/customer.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT doc_id + k * 100000000 AS doc_id,
         CASE WHEN k = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '),
                  (t, i) -> CASE WHEN (i % 7) = (k % 7) THEN t || '~' || k
                                 ELSE t END), ' ')
         END AS text,
         lang, source,
         length(CASE WHEN k = 0 THEN text
                     ELSE array_to_string(
                       list_transform(string_split(text, ' '),
                         (t, i) -> CASE WHEN (i % 7) = (k % 7) THEN t || '~' || k
                                        ELSE t END), ' ')
                END)::BIGINT AS n_chars
  FROM read_parquet('{src}/documents.parquet')
  CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS k)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT event_id + k * 1000000000 AS event_id,
         CAST(ts AS TIMESTAMP_NS) AS ts,
         user_id + k * 100000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{src}/events.parquet')
  CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS k)
) TO '{dst}/events.parquet' (FORMAT PARQUET)
""")
# embeddings scale the ANN/kmeans/PQ axis: vec_id offset per replica and ONE
# dimension nudged by a replica-dependent amount — replicas stay near their
# original (preserving cluster structure for IVF/PQ recall) without being
# exact duplicates (which would make every top-k a tie-break artifact).
con.execute(f"""
COPY (
  SELECT vec_id + k * 100000000 AS vec_id,
         CASE WHEN k = 0 THEN embedding
              ELSE list_transform(embedding, (x, i) ->
                CASE WHEN ((i - 1) % len(embedding)) = (k % len(embedding))
                     THEN CAST(x + 0.01 + 0.001 * (k % 10) AS FLOAT)
                     ELSE x END)
         END AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet')
  CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS k)
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")
for t in ('documents', 'events', 'embeddings'):
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
