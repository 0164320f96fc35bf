package graft

import org.apache.spark.sql.functions._
import graft.functions.Extensions.GeoMean

class ExtensionsSpec extends SparkSpec {

  test("GeoMean Aggregator: merge is associative-equivalent to reduce") {
    val xs = Seq(1.0, 2.0, 4.0, 8.0)
    val direct = xs.foldLeft(GeoMean.zero)(GeoMean.reduce)
    val split = GeoMean.merge(
      xs.take(2).foldLeft(GeoMean.zero)(GeoMean.reduce),
      xs.drop(2).foldLeft(GeoMean.zero)(GeoMean.reduce))
    assert(math.abs(GeoMean.finish(direct) - GeoMean.finish(split)) < 1e-12)
    assert(math.abs(GeoMean.finish(direct) - math.pow(2.0, 1.5)) < 1e-9)
  }

  test("GeoMean empty group yields NaN") {
    assert(GeoMean.finish(GeoMean.zero).isNaN)
  }

  test("q_udaf is partitioning-invariant") {
    val li = sources.Tables.lineitem(spark, sf).filter(col("l_quantity") > 0)
    val geomean = udaf(GeoMean)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"))
        .agg(round(geomean(col("l_quantity")), 6).as("g"))
        .orderBy(col("l_returnflag")).collect().toSeq
    assert(run(li) == run(li.repartition(11)))
  }

  test("q_explode_words total equals word occurrences") {
    val total = q("q_explode_words").agg(sum(col("n"))).first().getLong(0)
    val expected = sources.Tables.part(spark, sf)
      .select(size(split(col("p_name"), " ")).as("k"))
      .agg(sum(col("k"))).first().getLong(0)
    assert(total == expected)
  }

  test("q_scalar_array: e_sumsq >= 0 and dim constant 64") {
    val df = q("q_scalar_array")
    assert(df.filter(col("e_sumsq") < 0).count() == 0)
    assert(df.select(col("dim")).distinct().collect().map(_.getLong(0)).toSeq == Seq(64L))
  }
}
