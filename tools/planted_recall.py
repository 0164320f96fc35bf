#!/usr/bin/env python3
"""Planted-pair operator recall at probe scale (SCALEPROBE r12 protocol).

Usage:
  sbt "runMain graft.Verify <probeDir> <dumpDir> \
       q_dedup_embedding_lsh q_similarity_ann q_similarity_ivf"
  python3 tools/planted_recall.py <probeDir> <dumpDir>

Dev tooling only (like local_check.py). make_probe.py plants one
near-dup pair per 100-id block in every replica (partner = previous
id's fresh vector + scaled noise; strength cycles [0.15, 0.45, 0.9] ->
cosines ~0.99 / ~0.91 / ~0.74). This grades each approximate operator
on exactly those pairs, split by strength tier — the operator-quality
signal at probe scale, separate from truth-set recall (which is
dominated by borderline isotropic pairs near the 0.45 threshold; see
SCALEPROBE r12).

r13 hardening (ADVICE): recall counts DISTINCT planted pairs (EXISTS
per planted row — a dump with duplicate (x,y) rows can no longer
inflate the numerator/denominator), tier labels key on the tier VALUE
(an empty tier can't shift the labels), and planted rows whose partner
id is absent from the corpus (a replica's first block pairs with
vec_id k*OFF+0, which only exists if the source corpus carries id 0)
are excluded rather than counted as guaranteed misses.
"""
import sys

import duckdb

PROBE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe"
DUMPS = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_probe10"

QUERIES = [("q_dedup_embedding_lsh", "vec_a", "vec_b"),
           ("q_similarity_ann", "qid", "nid"),
           ("q_similarity_ivf", "qid", "nid")]

TIER_COSINE = {0: "0.99", 1: "0.91", 2: "0.74"}

con = duckdb.connect()
con.execute(f"""CREATE TABLE planted AS
SELECT vec_id AS b, vec_id - 1 AS a,
       CAST(((vec_id % 1000000000) // 100 + vec_id // 1000000000) % 3
            AS INT) AS tier
FROM '{PROBE}/embeddings.parquet'
WHERE vec_id >= 1000000000 AND vec_id % 100 = 1
  AND vec_id - 1 IN (SELECT vec_id FROM '{PROBE}/embeddings.parquet')""")

for q, ca, cb in QUERIES:
    pairs = f"(SELECT {ca} x, {cb} y FROM '{DUMPS}/{q}/*.parquet')"
    rows = con.sql(f"""
      SELECT p.tier, count(*) n,
             sum(CASE WHEN EXISTS (SELECT 1 FROM {pairs} e
                                   WHERE (e.x = p.a AND e.y = p.b)
                                      OR (e.x = p.b AND e.y = p.a))
                      THEN 1 ELSE 0 END) hit
      FROM planted p
      GROUP BY 1 ORDER BY 1""").fetchall()
    n = sum(r[1] for r in rows)
    hit = sum(r[2] for r in rows)
    tiers = " ".join(f"tier{t}(~{TIER_COSINE.get(t, '?')}):{h}/{m}"
                     for t, m, h in rows)
    print(f"{q}: recall={hit / n:.3f} ({hit}/{n})  {tiers}")
