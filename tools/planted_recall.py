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
"""
import sys

import duckdb

PROBE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe"
DUMPS = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_probe10"

QUERIES = [("q_dedup_embedding_lsh", "vec_a", "vec_b"),
           ("q_similarity_ann", "qid", "nid"),
           ("q_similarity_ivf", "qid", "nid")]

con = duckdb.connect()
con.execute(f"""CREATE TABLE planted AS
SELECT vec_id AS b, vec_id - 1 AS a,
       CAST(((vec_id % 1000000000) // 100 + vec_id // 1000000000) % 3
            AS INT) AS tier
FROM '{PROBE}/embeddings.parquet'
WHERE vec_id >= 1000000000 AND vec_id % 100 = 1""")

for q, ca, cb in QUERIES:
    pairs = f"(SELECT {ca} x, {cb} y FROM '{DUMPS}/{q}/*.parquet')"
    rows = con.sql(f"""
      SELECT p.tier, count(*) n,
             sum(CASE WHEN e1.x IS NOT NULL OR e2.x IS NOT NULL
                      THEN 1 ELSE 0 END) hit
      FROM planted p
      LEFT JOIN {pairs} e1 ON e1.x = p.a AND e1.y = p.b
      LEFT JOIN {pairs} e2 ON e2.x = p.b AND e2.y = p.a
      GROUP BY 1 ORDER BY 1""").fetchall()
    n = sum(r[1] for r in rows)
    hit = sum(r[2] for r in rows)
    tiers = " ".join(f"tier{t}(~{c}):{h}/{m}" for (t, m, h), c in
                     zip(rows, ("0.99", "0.91", "0.74")))
    print(f"{q}: recall={hit / n:.3f} ({hit}/{n})  {tiers}")
