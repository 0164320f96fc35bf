#!/usr/bin/env python3
"""Build a ~K-times replica of an SF dir for one-off scale probes.

Usage: python3 tools/make_probe.py [srcDir] [dstDir] [K]

Dev tooling only (like local_check.py) — the engine never reads this.
The replica preserves the properties the scale-critical plans depend
on, so per-query runtime should scale ~linearly if the plan is right:

- join keys are shifted per replica (k * 10^9), so fact/dim join
  fan-outs replicate instead of colliding;
- document text keeps stopwords verbatim but suffixes every other
  token with the replica id: each replica reproduces the original's
  internal near-dup pair structure while cross-replica Jaccard stays
  below any threshold (pair volume scales ~K, not K^2 — a verbatim
  copy would make every doc a 10-way near-dup and square the pair
  join, which no real 10x corpus does); quality/stopword/langid
  distributions stay representative;
- replica embeddings (k>0) are fresh deterministic hash-vectors
  (near-orthogonal in 64-d) WITH PLANTED NEAR-DUP PAIRS (r11 verdict
  item 3): one id per 100-id block perturbs the previous id's fresh
  vector at a strength cycling [0.15, 0.45, 0.9] -> planted cosines
  ~0.99 / ~0.91 / ~0.74 (all above the 0.45 truth threshold, spanning
  easy to hard), so strong-pair volume scales ~linearly with the
  corpus like a real crawl and probe-scale recall stamps measure the
  OPERATOR, not an orthogonal replica;
- events keep their time range (more rows per window = higher
  throughput, the realistic scale direction for streams).

Optional 4th arg: comma-separated table list to rebuild only those
tables in an existing DST (e.g. `embeddings` after a generator tweak).
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfprobe"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
OFF = 10**9

STOP = ("'the','and','of','to','in','is','el','la','de','que','y','en',"
        "'der','die','und','das','ist','von','le','les','et','des','un','une'")

con = duckdb.connect()
con.execute(f"CREATE TABLE ks AS SELECT unnest(range(0, {K})) AS k")


def build(table, select):
    if ONLY is not None and table not in ONLY:
        return
    src = f"'{SRC}/{table}.parquet'"
    con.execute(
        f"COPY (SELECT {select} FROM {src} CROSS JOIN ks) TO "
        f"'{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


import os
os.makedirs(DST, exist_ok=True)

for t in ("region", "nation"):
    if ONLY is not None and t not in ONLY:
        continue
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

build("customer",
      f"c_custkey + k*{OFF} AS c_custkey, c_name, c_nationkey, c_acctbal, "
      "c_mktsegment")
build("supplier",
      f"s_suppkey + k*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal")
build("part",
      f"p_partkey + k*{OFF} AS p_partkey, p_name, p_brand, p_type, p_size, "
      "p_retailprice")
build("orders",
      f"o_orderkey + k*{OFF} AS o_orderkey, o_custkey + k*{OFF} AS o_custkey, "
      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
build("lineitem",
      f"l_orderkey + k*{OFF} AS l_orderkey, l_partkey + k*{OFF} AS l_partkey, "
      f"l_suppkey + k*{OFF} AS l_suppkey, l_linenumber, l_quantity, "
      "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
      "l_shipdate")
build("events",
      f"event_id + k*{OFF} AS event_id, ts, user_id + k*{OFF} AS user_id, "
      "event_type, value, props")
build("documents",
      f"doc_id + k*{OFF} AS doc_id, "
      "CASE WHEN k = 0 THEN text ELSE array_to_string("
      f"  [CASE WHEN lower(t) IN ({STOP}) THEN t ELSE t || k::VARCHAR END "
      "   FOR t IN string_split(text, ' ')], ' ') END AS text, "
      "lang, source, "
      "CASE WHEN k = 0 THEN n_chars ELSE len(array_to_string("
      f"  [CASE WHEN lower(t) IN ({STOP}) THEN t ELSE t || k::VARCHAR END "
      "   FOR t IN string_split(text, ' ')], ' ')) END AS n_chars")
def fresh(key):
    """uniform [-1, 1] component from a deterministic 64-bit hash"""
    return (f"((hash({key} || '_' || k::VARCHAR || '_' || j::VARCHAR) "
            "% 2000001)/1000000.0 - 1.0)")


NOISE_KEY = "(vec_id::VARCHAR || '_n')"
build("embeddings",
      f"vec_id + k*{OFF} AS vec_id, "
      "CASE WHEN k = 0 THEN embedding "
      # planted near-dup: one id per 100-block = the previous id's fresh
      # vector + scale * fresh noise; scale cycles per (block, k) so
      # planted cosines span ~0.99 / ~0.91 / ~0.74 deterministically
      "WHEN vec_id % 100 = 1 THEN "
      f"  [({fresh('(vec_id - 1)::VARCHAR')} "
      "    + [0.15, 0.45, 0.9][CAST((vec_id // 100 + k) % 3 AS INT) + 1] "
      f"      * {fresh(NOISE_KEY)}"
      ")::FLOAT FOR j IN range(0, 64)] "
      "ELSE "
      f"  [{fresh('vec_id::VARCHAR')}::FLOAT FOR j IN range(0, 64)] "
      "END AS embedding, label")
print("done ->", DST)
