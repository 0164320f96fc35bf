package graft

import org.apache.spark.sql.functions._

class FlagshipSpec extends SparkSpec {

  test("persist(): re-used stage reads from InMemoryTableScan (dd.persist parity)") {
    // the reference pipeline persists the parsed frame before fan-out
    // (dask df.persist()); the Spark analog is cache() — pin that a
    // second action actually hits the columnar cache, not the source
    val df = sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus")).count().cache()
    try {
      df.count() // materialize
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
        s"expected cached scan in:\n$p")
    } finally df.unpersist()
  }

  test("q_flagship returns one finite sample-std of per-type means") {
    val rows = q("q_flagship").collect()
    assert(rows.length == 1)
    val std = rows(0).getDouble(0)
    assert(!std.isNaN && std >= 0.0)
  }

  test("flagship std is invariant to partitioning (SURVEY §5.3)") {
    val ev = sources.Tables.events(spark, sf)
    def flag(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy(col("event_type")).agg(avg(col("value")).as("m"))
        .agg(round(stddev_samp(col("m")), 6).as("s")).collect()(0).getDouble(0)
    assert(flag(ev) == flag(ev.repartition(7)))
  }

  test("q_scan_parquet filters and projects") {
    val df = q("q_scan_parquet")
    assert(df.columns.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))
    assert(df.filter(col("l_quantity") <= 45).count() == 0)
    assert(df.count() > 0)
  }

  test("SparkEntry.entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys, names unique") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(Registry.all.map(_.name).distinct.size == Registry.all.size)
  }
}
