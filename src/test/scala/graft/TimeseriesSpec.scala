package graft

import org.apache.spark.sql.functions._
import graft.sources.Timeseries

class TimeseriesSpec extends SparkSpec {

  lazy val ts = Timeseries.generate(spark, "2024-01-01", days = 1)

  test("schema matches the dask.datasets.timeseries shape") {
    assert(ts.columns.toSeq == Seq("timestamp", "name", "id", "x", "y"))
    assert(ts.schema("name").dataType.typeName == "string")
    assert(ts.schema("id").dataType.typeName == "long")
    assert(ts.schema("x").dataType.typeName == "double")
  }

  test("one row per second, one partition per day") {
    assert(ts.count() == 86400L)
    assert(Timeseries.generate(spark, "2024-01-01", 3).rdd.getNumPartitions == 3)
  }

  test("deterministic: same params give identical data") {
    val a = ts.agg(sum(hash(col("timestamp"), col("name"), col("id"),
      col("x"), col("y")))).first().getLong(0)
    val b = Timeseries.generate(spark, "2024-01-01", 1)
      .repartition(7)
      .agg(sum(hash(col("timestamp"), col("name"), col("id"),
        col("x"), col("y")))).first().getLong(0)
    assert(a == b)
  }

  test("26 names, x/y in [-1,1), id ~ Poisson(1000) moments") {
    assert(ts.select(col("name")).distinct().count() == 26)
    val r = ts.agg(
      min(col("x")), max(col("x")), avg(col("x")),
      avg(col("id")), stddev_samp(col("id"))).first()
    assert(r.getDouble(0) >= -1.0 && r.getDouble(1) < 1.0)
    assert(math.abs(r.getDouble(2)) < 0.02)            // mean ~ 0
    assert(math.abs(r.getDouble(3) - 1000.0) < 2.0)    // mean ~ 1000
    assert(math.abs(r.getDouble(4) - math.sqrt(1000.0)) < 2.0)
  }

  test("pipeline smoke: producer record -> generate -> flagship std is finite") {
    val std = q("q_pipeline_reference").first().getDouble(0)
    assert(!std.isNaN && std > 0.0 && std < 0.1)
  }

  test("q_reference_scale sizing: 10,000 x sf, conf override, fallback") {
    def d(dir: String) = Timeseries.referenceDays(spark, dir)
    assert(d("/root/testdata/sf0.1") == 1000)   // the reference's max job
    assert(d("/root/testdata/sf0.01") == 100)
    assert(d("/root/testdata/sf0.001") == 10)
    assert(d("/data/sf0.15") == 1500)           // unknown sfs scale, no floor
    assert(d("/data/sf1") == 10000)
    assert(d("/no/scale/marker") == 10)         // unparseable -> smallest
    assert(d("/sf0.5/nested/sf0.01") == 100)    // LAST sf segment wins
    spark.conf.set("graft.referenceScale.days", "7")
    try assert(d("/root/testdata/sf0.1") == 7)
    finally spark.conf.unset("graft.referenceScale.days")
  }

  test("timestamps advance on a 1s grid from start") {
    val first2 = ts.select(col("timestamp").cast("long")).orderBy(col("timestamp"))
      .limit(2).collect().map(_.getLong(0))
    assert(first2(1) - first2(0) == 1L)
  }
}
