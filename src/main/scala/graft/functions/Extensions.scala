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

    // B42-44 companion — the dask `groupby.apply` analog: arbitrary
    // per-group code via typed KeyValueGroupedDataset.flatMapGroups
    // (one shuffle, groups streamed through a spillable sort — the
    // scalable escape hatch when an aggregate genuinely can't be
    // expressed in agg columns). Trimmed mean per flag: quantities are
    // integer-valued doubles, so the fold is exact and order-invariant,
    // keeping the result bit-deterministic and oracle-able.
    QueryDef(
      "q_groupby_apply",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_quantity"))
          .as[(String, Double)]
          .groupByKey(_._1)
          .flatMapGroups { (flag: String, it: Iterator[(String, Double)]) =>
            var n = 0L; var sum = 0.0
            var mn = Double.MaxValue; var mx = Double.MinValue
            it.foreach { case (_, q) =>
              n += 1; sum += q
              if (q < mn) mn = q
              if (q > mx) mx = q
            }
            if (n > 2) Iterator((flag, n, (sum - mn - mx) / (n - 2).toDouble))
            else Iterator.empty
          }
          .toDF("l_returnflag", "n", "trimmed_mean")
          .withColumn("trimmed_mean", round(col("trimmed_mean"), 6))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """SELECT l_returnflag, count(*) AS n,
          |       round((sum(l_quantity) - min(l_quantity) - max(l_quantity))
          |             / (count(*) - 2), 6) AS trimmed_mean
          |FROM lineitem GROUP BY l_returnflag HAVING count(*) > 2
          |ORDER BY l_returnflag""".stripMargin)
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
