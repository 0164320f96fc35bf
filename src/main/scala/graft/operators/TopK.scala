package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.plans.TopKPerKeyNode
import graft.sources.Tables

/** Public API for the custom bounded top-k-per-key operator (full stack:
  * logical node → strategy → two-phase physical exec; see
  * [[graft.plans.TopKPerKeyNode]]). */
object TopK {

  /** Top `k` rows per `keys` group under `order` ((column, ascending)
    * pairs — give a total order for deterministic output), with a 1-based
    * `rankName` column appended. */
  def topKPerKey(df: DataFrame, keys: Seq[String],
                 order: Seq[(String, Boolean)], k: Int,
                 rankName: String = "rank"): DataFrame = {
    val plan = df.queryExecution.analyzed
    val attr = (n: String) => plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${plan.output.map(_.name)}"))
    val sortOrders = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(attr), sortOrders, k, rankName, plan))
  }

  val defs: Seq[QueryDef] = Seq(
    // Custom-operator parity query: top-3 orders per customer. The oracle
    // is the equivalent (but full-shuffle) window formulation — identical
    // semantics, so the hash-compare also proves the operator correct.
    QueryDef(
      "q_topk_per_key",
      (s, dir) => {
        topKPerKey(
          Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          keys = Seq("o_custkey"),
          order = Seq(("o_totalprice", false), ("o_orderkey", true)),
          k = 3)
          .orderBy(col("o_custkey"), col("rank"))
      },
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice, rank FROM (
          |  SELECT o_orderkey, o_custkey, o_totalprice,
          |         row_number() OVER (PARTITION BY o_custkey
          |           ORDER BY o_totalprice DESC, o_orderkey) AS rank
          |  FROM orders)
          |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin)
    )
  )
}
