package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** User-extension surface (SURVEY §2.B B42-B44): scalar UDF, typed UDAF
  * (`Aggregator`), and a generator (explode-as-UDTF). The reference's
  * entire kernel is user code shipped to workers
  * (`src/lambda_consumer.py:34,68`), so these three extension points ARE
  * the parity feature.
  *
  * House rule stays builtins-first (codegen) — these queries exist to
  * prove the extension seams work and stay oracle-comparable. The UDAF
  * demonstrates the partial/merge/finish contract that makes a custom
  * aggregate scale exactly like a built-in (map-side combine, one shuffle
  * row per group per partition).
  */
object Extensions {

  /** Geometric mean via log-space sums — a TypedImperativeAggregate-style
    * buffer (sum of logs, count) expressed as a typed Aggregator. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val defs: Seq[QueryDef] = Seq(

    // B42 — scalar UDF: clamped absolute score. (A built-in composition
    // would be preferred in production; the UDF is the point here.)
    QueryDef(
      "q_udf_scalar",
      (s, dir) => {
        val clampScore = udf((v: Double) => math.min(100.0, math.abs(v)) * 0.5)
        Tables.events(s, dir)
          .select(col("event_id"),
            round(clampScore(col("value")), 6).as("score"))
          .orderBy(col("event_id"))
      },
      Some(
        """SELECT event_id, round(least(100.0, abs(value)) * 0.5, 6) AS score
          |FROM events ORDER BY event_id""".stripMargin)
    ),

    // B43 — typed UDAF (Aggregator) with distributed-safe merge.
    QueryDef(
      "q_udaf",
      (s, dir) => {
        val geomean = udaf(GeoMean)
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 0)
          .groupBy(col("l_returnflag"))
          .agg(round(geomean(col("l_quantity")), 6).as("geomean_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geomean_qty
          |FROM lineitem WHERE l_quantity > 0
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // B44 — generator / UDTF: explode one row per word.
    QueryDef(
      "q_explode_words",
      (s, dir) => {
        Tables.part(s, dir)
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("word"))
      },
      Some(
        """SELECT word, count(*) AS n FROM (
          |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
          |GROUP BY word ORDER BY word""".stripMargin)
    )
  )
}
