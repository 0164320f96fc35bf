package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

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

  test("salted join == plain join (row multiset)") {
    val li = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    val salted = Skew.saltedJoin(li, o, "l_orderkey", factor = 7,
        saltSource = Seq("l_orderkey", "l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    assert(salted == plain)
  }

  test("ngram dedup df cap: a corpus-wide stop-shingle cannot square the join") {
    import spark.implicits._
    // every doc opens with the same boilerplate 5-gram, then unique words:
    // uncapped, the shared shingles alone pair all docs against all docs
    val docs = (1 to 60).map { i =>
      (i.toLong, s"the quick brown fox jumps unique$i word${i}a word${i}b word${i}c")
    }.toDF("doc_id", "text")
    val uncapped = operators.Dedup
      .ngramJaccardPairs(docs, n = 3, maxDf = Long.MaxValue, minJaccard = 0.0)
    assert(uncapped.count() == 60L * 59 / 2,
      "stop-shingles pair every doc with every doc when uncapped")
    // with the cap, the hot shingles drop from the join input entirely…
    val sh = docs.select(col("doc_id"),
        explode(functions.ShingleHashes(col("text"), 3)).as("h"))
      .dropDuplicates("doc_id", "h")
    val capped = operators.Dedup.dfCapShingles(sh, maxDf = 10)
    val hotLeft = capped.groupBy(col("h")).count()
      .filter(col("count") > 10).count()
    assert(hotLeft == 0, "no shingle above the df cap may reach the self-join")
    // …and the unique remainders produce no pairs at all
    assert(operators.Dedup
      .ngramJaccardPairs(docs, n = 3, maxDf = 10, minJaccard = 0.0)
      .count() == 0)
  }

  test("saltedWindowCount == plain window count (hot-key escape hatch)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one mega-hot key + a long tail — the shape that melts a single
    // window partition at scale
    val df = ((1 to 5000).map(i => (0L, i.toLong)) ++
        (1 to 500).map(i => (i.toLong % 37 + 1, i.toLong)))
      .toDF("k", "id")
    val plain = df.withColumn("c",
        count(lit(1)).over(Window.partitionBy(col("k"))))
      .orderBy(col("k"), col("id")).collect().toSeq
    val salted = Skew.saltedWindowCount(df, "k", "c")
      .orderBy(col("k"), col("id")).collect().toSeq
    assert(salted == plain)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "id")
    val spread = hot.withColumn("__salt",
        pmod(xxhash64(col("k"), col("id")), lit(8)))
      .groupBy(col("__salt")).count().collect()
    assert(spread.length == 8, "hot key should land in all 8 salt buckets")
    assert(spread.map(_.getLong(1)).max < 1000 * 0.3, "no bucket should dominate")
  }

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
}
