package graft

import org.apache.spark.sql.functions._

/** Skew posture (SURVEY §7): two mechanisms ship for hot keys.
  *
  *  - AQE's skew-join split handles skewed SMJ joins automatically at
  *    runtime (this spec pins that it actually fires — `skew=true` in
  *    the SortMergeJoin node of the finalized adaptive plan).
  *  - Manual salting (`Skew.saltedJoin`, oracled as `q_join_skew_salted`)
  *    remains the shipped answer for the shapes AQE cannot split:
  *    aggregations keyed on the hot column and non-SMJ plans.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    val confs = Seq(
      // force a shuffle join: the point is the skewed-reducer path
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so test-scale data exhibits "skew": a partition
      // is skewed when > factor * median AND > threshold bytes
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the left side lands on key 0 — one reducer would melt
      val left = spark.range(100000).select(
        when(col("id") % 10 === 0, col("id")).otherwise(lit(0L)).as("k"),
        col("id").as("payload"))
      val right = spark.range(100000).select(
        col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      val n = joined.count()
      assert(n == 100000L) // every left row matches exactly one right key
      joined.collect() // finalize joined's own adaptive plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE skew split did not fire on a 90%-hot-key join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salting spreads a hot key over `factor` salt values, results unchanged") {
    // q_join_skew_salted's oracle pins result equality; here pin the
    // mechanism: the salted key-space actually fans out, deterministically
    val left = spark.range(1000).select(
      lit(42L).as("k"), col("id").as("a"), (col("id") % 7).as("b"))
    val right = spark.range(100).select(col("id").as("k"), (col("id") + 1).as("w"))
    val out = graft.operators.Skew.saltedJoin(left, right, "k", factor = 8,
      saltSource = Seq("a"))
    assert(out.count() == 1000)
    val salts = left
      .withColumn("__salt", pmod(xxhash64(col("a")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8, s"expected the hot key spread over all 8 salts, got $salts")
    // deterministic: same inputs -> same salt assignment on replay
    val again = graft.operators.Skew.saltedJoin(left, right, "k", factor = 8,
      saltSource = Seq("a"))
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }
}
