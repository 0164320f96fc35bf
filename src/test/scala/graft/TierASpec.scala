package graft

import org.apache.spark.sql.functions._

class TierASpec extends SparkSpec {

  test("q_json_extract: k_str/k_int agree") {
    val bad = q("q_json_extract")
      .filter(col("k_str").cast("int") =!= col("k_int")).count()
    assert(bad == 0)
  }

  test("q_recursive_spine: empty orders degrade to an empty spine, wide spans lift the recursion limit") {
    import spark.implicits._
    val dir = Staging.dir("spine_empty_src")
    Seq.empty[(Long, java.sql.Date, Double)]
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val empty = SparkEntry.queries("q_recursive_spine")(spark, dir)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("month", "n_orders", "revenue"))
    // a >100-month span must not hit the default cteRecursionLevelLimit
    val dir2 = Staging.dir("spine_wide_src")
    Seq((1L, java.sql.Date.valueOf("1990-01-15"), 10.0),
        (2L, java.sql.Date.valueOf("2005-06-15"), 20.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val wide = SparkEntry.queries("q_recursive_spine")(spark, dir2)
    assert(wide.count() == 186) // 1990-01 .. 2005-06 inclusive
    // the lifted limit must NOT leak into the shared session: the def
    // forces execution and restores the conf in finally
    assert(spark.conf.get("spark.sql.cteRecursionLevelLimit", "100") == "100",
      "cteRecursionLevelLimit leaked past q_recursive_spine")
  }

  test("q_time_parts: path is hive-layout, not zero-padded") {
    val row = q("q_time_parts").select(col("path")).first().getString(0)
    assert(row.startsWith("data/year=2024/month="))
    assert(!row.contains("month=0")) // January renders as month=1
  }

  test("q_string_replace: decode undoes %3D") {
    val bad = q("q_string_replace")
      .filter(col("decoded") =!= regexp_replace(col("encoded"), "%3D", "=")).count()
    assert(bad == 0)
  }

  test("q_md5: 32-hex digest and 5-char prefix") {
    val r = q("q_md5").first()
    assert(r.getString(1).matches("[0-9a-f]{32}"))
    assert(r.getString(2).length == 5)
  }

  test("q_partitioned_write: per-day counts sum to table size") {
    val total = q("q_partitioned_write").agg(sum(col("n"))).first().getLong(0)
    assert(total == sources.Tables.events(spark, sf).count())
  }
}
