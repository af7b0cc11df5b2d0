#!/usr/bin/env python3
"""Build an adversarial stress dataset for the correctness gate.

Copies the sf0.001 tables and injects the degenerate rows real corpora
contain but the driver's clean synthetic data never exercises: empty
documents, single-token docs, exact duplicates, whitespace runs, long
repetitive docs, boundary near-dup pairs, duplicate embedding vectors
(cosine exactly 1), an all-zero embedding (cosine undefined), and a
NaN-component embedding (NaN orders greatest in both engines' SQL, so its
cosines pass thresholds as NaN — round 3's compiled kernels must mirror
that instead of crashing in BigDecimal rounding).

Usage: python3 scripts/stressdata.py [outDir=/tmp/stressdata]
Then:  sbt "runMain graft.Verify /tmp/stressdata /tmp/vstress"
       python3 scripts/localverify.py /tmp/stressdata /tmp/vstress

Found round 2: Spark 4's default ANSI mode turns division-by-zero into a
crash — empty docs (quality punct_ratio) and zero vectors (cosine norms)
killed five operators until the null-safe guards landed on both engines.
"""
import sys, glob, shutil, os
import duckdb

src = '/root/testdata/sf0.001'
dst = sys.argv[1] if len(sys.argv) > 1 else '/tmp/stressdata'
os.makedirs(dst, exist_ok=True)
for p in glob.glob(f'{src}/*.parquet'):
    shutil.copy(p, dst)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL
  SELECT doc_id, text, 'en' AS lang, 'stress' AS source, length(text) AS n_chars FROM (VALUES
    (CAST(90001 AS BIGINT), ''),
    (90002, 'single'),
    (90003, 'dup dup dup content here'),
    (90004, 'dup dup dup content here'),
    (90005, 'a  b   c'),
    (90006, repeat('spam ham ', 200) || 'end'),
    (90007, repeat('spam ham ', 200) || 'fin'),
    (90008, 'one two three four five six seven eight'),
    (90009, 'one two three four five six seven nine')
  ) t(doc_id, text)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/embeddings.parquet')
  UNION ALL
  SELECT 90001 AS vec_id, embedding, label FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id = 10
  UNION ALL
  SELECT 90002, embedding, label FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id = 10
  UNION ALL
  SELECT 90003, list_transform(embedding, x -> 0.0::FLOAT), label FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id = 10
  UNION ALL
  -- NaN component: both engines order NaN above every number, so its NaN
  -- cosines PASS thresholds and must round-trip the gate as NaN, not crash
  -- the compiled kernels (BigDecimal.valueOf(NaN) throws if unguarded)
  SELECT 90004, list_transform(embedding, x -> 'NaN'::FLOAT), label FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id = 10
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/events.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    -- same user, identical timestamp, different ids (tie-break paths)
    (CAST(900001 AS BIGINT), TIMESTAMP '2024-01-10 12:00:00', CAST(7 AS BIGINT), 'click',   0.0,  '{{"k": 1}}'),
    (900002, TIMESTAMP '2024-01-10 12:00:00', 7, 'purchase', 0.0,  '{{"k": 2}}'),
    (900003, TIMESTAMP '2024-01-10 12:00:00', 7, 'click',    50.0, NULL),
    -- a user with ONLY purchases (spent with empty earned pool)
    (900004, TIMESTAMP '2024-01-11 00:00:00', 9901, 'purchase', 10.0, '{{}}'),
    (900005, TIMESTAMP '2024-01-11 00:00:01', 9901, 'purchase', 20.0, 'not json'),
    -- midnight boundary + zero-value earned
    (900006, TIMESTAMP '2024-01-12 00:00:00', 9902, 'view', 0.0, '{{"k": -5}}'),
    -- stream-stream join horizon edge: purchase EXACTLY at view + 1 h is
    -- inside the inclusive bound, 1 microsecond past it is not — both
    -- engines' interval arithmetic must agree at the boundary
    (900007, TIMESTAMP '2024-01-10 13:00:00',        9903, 'view',     1.0, NULL),
    (900008, TIMESTAMP '2024-01-10 14:00:00',        9903, 'purchase', 1.0, NULL),
    (900009, TIMESTAMP '2024-01-10 14:00:00.000001', 9903, 'purchase', 1.0, NULL)
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{dst}/events.parquet' (FORMAT PARQUET)
""")
print(f"stress dataset written to {dst}")
