package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Order slice crossing the typed boundary: only the columns the typed
  * logic needs — cents already exact (see the money discipline). */
case class OrderSlim(status: String, cents: Long, custkey: Long)

/** Per-status rollup emitted by the typed aggregator. */
case class StatusStats(n_orders: Long, cents: Long, max_custkey: Long)

/** Typed `Dataset[T]` exemplar (SURVEY §1: case-class Encoders where
  * type safety helps). The engine is DataFrame-first because typed
  * lambdas are OPAQUE to Catalyst — no predicate pushdown, column
  * pruning, or codegen through a Scala closure — but real pipelines
  * embed domain logic in typed code, so the discipline for using the
  * typed API at 100 TB is shown here:
  *
  *  1. PRUNE AND CONVERT FIRST: the `select(...).as[OrderSlim]`
  *     boundary lets the scan read 3 columns, not the full row, before
  *     anything becomes a closure;
  *  2. typed filter/groupByKey/Aggregator AFTER the boundary: the
  *     [[Aggregator]] is Spark's typed UDAF contract — merge-able
  *     (map-side partial aggregation still applies, the shuffle
  *     carries one buffer per (partition, key)), with Encoders for
  *     buffer and output instead of Row juggling;
  *  3. exact integer state (cents already scaled) so the typed path
  *     obeys the same cross-engine float discipline as everything
  *     else.
  */
object TypedOps {

  /** Typed UDAF: per-status (count, exact cents, max custkey) in one
    * merge-able buffer. */
  private object StatusAgg
    extends Aggregator[OrderSlim, (Long, Long, Long), StatusStats] {
    def zero: (Long, Long, Long) = (0L, 0L, Long.MinValue)
    def reduce(b: (Long, Long, Long), o: OrderSlim): (Long, Long, Long) =
      (b._1 + 1L, b._2 + o.cents, math.max(b._3, o.custkey))
    def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
      (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3))
    def finish(b: (Long, Long, Long)): StatusStats =
      StatusStats(b._1, b._2, b._3)
    def bufferEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong)
    def outputEncoder: Encoder[StatusStats] = Encoders.product[StatusStats]
  }

  val defs: Seq[QueryDef] = Seq(

    // Typed pipeline end to end: prune → as[case class] → typed filter
    // → groupByKey → typed Aggregator → back to columns for the
    // contract. The filter closure keeps orders above $1000 (a typed
    // business rule); the aggregation buffer is pure Long arithmetic.
    // `.explain` shows the cost this exemplar documents: the scan IS
    // column-pruned (the select sits below the boundary) but the
    // filter cannot push into the scan — at 100 TB, any predicate
    // expressible as a Column belongs below the typed boundary.
    QueryDef(
      "q_typed_pipeline",
      (s, dir) => {
        import s.implicits._
        val ds = Tables.orders(s, dir)
          .select(
            col("o_orderstatus").as("status"),
            round(col("o_totalprice") * 100).cast("long").as("cents"),
            col("o_custkey").as("custkey"))
          .as[OrderSlim]
        ds.filter((o: OrderSlim) => o.cents > 100000L)
          .groupByKey((o: OrderSlim) => o.status)
          .agg(StatusAgg.toColumn.name("stats"))
          .map { case (status, st) =>
            (status, st.n_orders, st.cents, st.max_custkey)
          }
          .toDF("status", "n_orders", "cents", "max_custkey")
          .orderBy(col("status"))
      },
      Some(
        """SELECT o_orderstatus AS status, count(*) AS n_orders,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |         AS BIGINT) AS cents,
          |       max(o_custkey) AS max_custkey
          |FROM orders
          |WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 100000
          |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
    )
  )
}
