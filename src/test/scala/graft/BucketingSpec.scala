package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketing (SURVEY §2 B7 scale note / §7 posture):
  * when both sides are bucketed + sorted on the join key with the same
  * bucket count, the sort-merge join needs NO exchange — the 100 TB
  * recipe for repeated fact-fact joins. */
class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables sort-merge-join with zero exchanges") {
    val o = sources.Tables.orders(spark, sf)
    val li = sources.Tables.lineitem(spark, sf)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // the metastore is per-JVM but the warehouse dir persists — clear
    // leftover locations from previous test runs
    for (t <- Seq("orders_b", "lineitem_b")) {
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.delete(f))
      }
    }
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // hint forces SMJ (at sf0.001 the planner would otherwise broadcast
    // and never exercise the bucket alignment)
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
    joined.collect()
    // AQE's toString appends an "== Initial Plan ==" section — only the
    // final plan reflects what actually ran
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    // the only exchange allowed is the one ABOVE the join for the groupBy;
    // below the join both scans must feed it bucket-aligned
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // and the result matches the plain (shuffling) join
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
    assert(joined.orderBy(col("o_orderstatus")).collect().toSeq ==
      plain.orderBy(col("o_orderstatus")).collect().toSeq)
  }
}
