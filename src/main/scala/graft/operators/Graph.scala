package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Iterative graph analytics over relationship edges derived from the
  * fact tables. Connected components (dup clusters) live in Dedup; this
  * module adds the other canonical iterative-propagation shape: fixed-
  * iteration PageRank over the bipartite supplier↔part co-occurrence
  * graph (reference capability surface: arbitrary distributed-DataFrame
  * compute — `layer/python/dask_processing.py:11-12`).
  *
  * Scale shape (the part that must survive 100 TB): each iteration is
  * ONE shuffle of the edge list by source plus one aggregation by
  * destination — the irreducible PageRank traffic. The edge list and
  * degree table are partitioned on the join key once and
  * `localCheckpoint`ed, so every iteration reshuffles only the rank
  * vector (|V| rows, ≪ |E|); the plan never grows with iteration count
  * (each round starts from a materialized rank table, the same lineage
  * cut as the connected-components loop in Dedup). Iteration count is
  * FIXED (5), not convergence-polled — no per-round driver round-trips
  * beyond the checkpoint barrier itself.
  */
object Graph {

  /** Damping factor; 0.15 = 1 − d teleport mass, written as the same
    * literal on both engines so base ranks are bit-identical. */
  private val Damping = 0.85
  private val Iters = 5

  /** Bidirectional bipartite edges: supplier s↔p part for every
    * DISTINCT (l_suppkey, l_partkey) pair. Both directions exist, so
    * every node has out-degree ≥ 1 — no dangling-mass redistribution
    * term is needed, and the oracle can use plain inner joins. */
  private def edgeList(s: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    val pairs = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    val fwd = pairs.select(
      concat(lit("s"), col("l_suppkey")).as("src"),
      concat(lit("p"), col("l_partkey")).as("dst"))
    val rev = pairs.select(
      concat(lit("p"), col("l_partkey")).as("src"),
      concat(lit("s"), col("l_suppkey")).as("dst"))
    fwd.unionAll(rev)
  }

  val defs: Seq[QueryDef] = Seq(
    // PageRank, 5 fixed iterations, damping 0.85. Emitted as
    // round(rank × |V|, 6) — the mean-normalized form (average 1.0)
    // keeps 6-decimal rounding meaningful at any graph size. The
    // DuckDB oracle unrolls the same five iterations as chained CTEs;
    // both engines compute identical double arithmetic on identical
    // inputs, so the hash compare is exact at 6 dp.
    QueryDef(
      "q_graph_pagerank",
      (s, dir) => {
        // edges partitioned ON THE JOIN KEY once; all 5 iterations and
        // the degree aggregate reuse that placement instead of
        // re-shuffling ~|E| rows per round
        val edges = edgeList(s, dir).repartition(col("src")).localCheckpoint()
        val deg = edges.groupBy(col("src"))
          .agg(count(lit(1)).as("outdeg"))
          .localCheckpoint()
        // |V| — a single bounded scalar (same driver-side role as the
        // connected-components convergence counter in Dedup)
        val n = deg.count()
        val base = 0.15 / n
        // checkpointed: cuts the shared lineage with `deg` (the first
        // iteration joins ranks back to deg — without the cut that is
        // an ambiguous self-join) and starts the loop invariant that
        // every round begins from a materialized rank table
        var ranks = deg.select(col("src").as("node"),
          (lit(1.0) / n).as("pr")).localCheckpoint()
        for (_ <- 1 to Iters) {
          // per-node contribution weight; deg is co-partitioned with
          // edges, ranks (|V| rows) is the only moving side
          val w = ranks.join(deg, ranks("node") === deg("src"))
            .select(deg("src").as("w_src"),
              (col("pr") / col("outdeg")).as("w"))
          ranks = edges.join(w, col("src") === col("w_src"))
            .groupBy(col("dst"))
            .agg(sum(col("w")).as("in_w"))
            .select(col("dst").as("node"),
              (lit(base) + lit(Damping) * col("in_w")).as("pr"))
            // cut lineage so the logical plan stays O(1) per round;
            // LAZY: materializes as a side effect of the next round's
            // job instead of paying a dedicated job launch per round
            .localCheckpoint(eager = false)
        }
        ranks
          .select(col("node"), round(col("pr") * n, 6).as("pr_norm"))
          .orderBy(col("node"))
      },
      Some(
        """WITH pairs AS (
          |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
          |edges AS (
          |  SELECT 's' || CAST(sk AS VARCHAR) AS src,
          |         'p' || CAST(pk AS VARCHAR) AS dst FROM pairs
          |  UNION ALL
          |  SELECT 'p' || CAST(pk AS VARCHAR),
          |         's' || CAST(sk AS VARCHAR) FROM pairs),
          |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
          |nn AS (SELECT count(*) AS n FROM deg),
          |r0 AS (SELECT src AS node, 1.0 / nn.n AS pr FROM deg, nn),
          |r1 AS (SELECT e.dst AS node, 0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
          |       FROM edges e JOIN r0 r ON r.node = e.src
          |       JOIN deg d ON d.src = e.src, nn GROUP BY e.dst, nn.n),
          |r2 AS (SELECT e.dst AS node, 0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
          |       FROM edges e JOIN r1 r ON r.node = e.src
          |       JOIN deg d ON d.src = e.src, nn GROUP BY e.dst, nn.n),
          |r3 AS (SELECT e.dst AS node, 0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
          |       FROM edges e JOIN r2 r ON r.node = e.src
          |       JOIN deg d ON d.src = e.src, nn GROUP BY e.dst, nn.n),
          |r4 AS (SELECT e.dst AS node, 0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
          |       FROM edges e JOIN r3 r ON r.node = e.src
          |       JOIN deg d ON d.src = e.src, nn GROUP BY e.dst, nn.n),
          |r5 AS (SELECT e.dst AS node, 0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
          |       FROM edges e JOIN r4 r ON r.node = e.src
          |       JOIN deg d ON d.src = e.src, nn GROUP BY e.dst, nn.n)
          |SELECT node, round(pr * nn.n, 6) AS pr_norm FROM r5, nn
          |ORDER BY node""".stripMargin)
    )
  )
}
