#!/usr/bin/env python3
"""Sampled DuckDB oracle for q_dedup_editdist at scale factors where the
full quadratic oracle is infeasible (the standing sf1+ exclusion class).

The registered oracle recomputes ALL pairs in DuckDB — O(n^2)
levenshteins, fine at sf0.01/sf0.1, ~1.25B pairs at sf1. This check
keeps the exactness claim measurable at scale: pick a deterministic
hash-sample S of docs, have DuckDB compute the EXACT answer restricted
to pairs touching S (|S| * n levenshteins, with the |lenA - lenB| <= tau
length-band prefilter), and demand set-equality with the operator's
output restricted the same way. Every operator pair is also re-verified
globally (distance recomputed for all emitted pairs).

Usage: tools/editdist_sampled_oracle.py SF_DIR RESULT_PARQUET_DIR [SAMPLE_MOD]
Exit 0 iff both checks hold.
"""
import sys, duckdb

sf_dir, res_dir = sys.argv[1], sys.argv[2]
mod = int(sys.argv[3]) if len(sys.argv) > 3 else 250  # ~n/mod sampled docs
con = duckdb.connect()
con.execute("SET threads TO 16")

q = f"""
WITH heads AS (
  SELECT doc_id, substring(text, 1, 80) AS h,
         length(substring(text, 1, 80)) AS l
  FROM '{sf_dir}/documents.parquet/*.parquet'
), s AS (
  SELECT * FROM heads WHERE hash(doc_id) % {mod} = 0
), truth AS (
  SELECT least(s.doc_id, o.doc_id) AS doc1,
         greatest(s.doc_id, o.doc_id) AS doc2,
         levenshtein(s.h, o.h) AS dist
  FROM s JOIN heads o
    ON s.doc_id <> o.doc_id
   AND abs(s.l - o.l) <= floor(greatest(s.l, o.l) * 0.1)
  WHERE levenshtein(s.h, o.h) <= floor(greatest(s.l, o.l) * 0.1)
), got AS (
  SELECT doc1, doc2, dist FROM '{res_dir}/*.parquet'
  WHERE hash(doc1) % {mod} = 0 OR hash(doc2) % {mod} = 0
)
SELECT
  (SELECT count(*) FROM (SELECT DISTINCT doc1, doc2, dist FROM truth)) AS n_truth,
  (SELECT count(*) FROM got) AS n_got,
  (SELECT count(*) FROM (SELECT doc1, doc2, dist FROM truth EXCEPT
                         SELECT doc1, doc2, dist FROM got)) AS missing,
  (SELECT count(*) FROM (SELECT doc1, doc2, dist FROM got EXCEPT
                         SELECT DISTINCT doc1, doc2, dist FROM truth)) AS spurious
"""
n_truth, n_got, missing, spurious = con.execute(q).fetchone()
print(f"[sampled-oracle] truth={n_truth} got={n_got} missing={missing} spurious={spurious}")

# global distance re-verification of every emitted pair
bad = con.execute(f"""
  WITH heads AS (
    SELECT doc_id, substring(text, 1, 80) AS h, length(substring(text,1,80)) AS l
    FROM '{sf_dir}/documents.parquet/*.parquet')
  SELECT count(*) FROM '{res_dir}/*.parquet' r
  JOIN heads a ON r.doc1 = a.doc_id
  JOIN heads b ON r.doc2 = b.doc_id
  WHERE levenshtein(a.h, b.h) <> r.dist
     OR r.dist > floor(greatest(a.l, b.l) * 0.1)
""").fetchone()[0]
print(f"[global-reverify] pairs with wrong distance or over bound: {bad}")

ok = (missing == 0 and spurious == 0 and bad == 0 and n_truth > 0)
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
