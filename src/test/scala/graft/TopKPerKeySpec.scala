package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

class TopKPerKeySpec extends SparkSpec {

  private def windowEquivalent(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  test("custom operator output == row_number window formulation") {
    for (k <- Seq(1, 3, 7)) {
      val custom = TopK.topKPerKey(
        sources.Tables.orders(spark, sf)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), k)
        .orderBy(col("o_custkey"), col("rank")).collect().toSeq
      val win = windowEquivalent(k)
        .orderBy(col("o_custkey"), col("rank")).collect().toSeq
      assert(custom == win, s"k=$k mismatch")
    }
  }

  test("plans as partial + final with an exchange between (map-side bound)") {
    val df = TopK.topKPerKey(
      sources.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    // renders as: TopKPerKey ..., false  <- Exchange <- TopKPerKey ..., true
    val p = df.queryExecution.executedPlan.toString
    val finalIdx = p.indexOf("rank#")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(o_custkey")
    val partialIdx = p.lastIndexOf("TopKPerKey")
    assert(p.contains("TopKPerKey"), p)
    assert(finalIdx >= 0 && exchangeIdx > 0 && partialIdx > exchangeIdx,
      s"expected final <- exchange <- partial ordering in:\n$p")
    assert(p.indexOf("TopKPerKey") < exchangeIdx, s"final must sit above the exchange:\n$p")
  }

  test("result invariant to input partitioning") {
    val base = sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TopK.topKPerKey(df, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
        .orderBy(col("o_custkey"), col("rank")).collect().toSeq
    assert(run(base) == run(base.repartition(13)))
  }

  test("k larger than group size yields the whole group, ranked") {
    val out = TopK.topKPerKey(
      sources.Tables.nation(spark, sf), Seq("n_regionkey"),
      Seq(("n_nationkey", true)), 1000)
    assert(out.count() == sources.Tables.nation(spark, sf).count())
    assert(out.filter(col("rank") === 1).count() == 5) // one per region
  }

  test("optimizer rule rewrites row_number+filter into TopKPerKeyNode") {
    val df = windowEquivalent(3)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"), s"rewrite did not fire:\n$opt")
    // and the rewritten plan still returns the window-formulation answer
    val viaRule = df.orderBy(col("o_custkey"), col("rank")).collect().toSeq
    val direct = TopK.topKPerKey(
      sources.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("o_custkey"), col("rank")).collect().toSeq
    assert(viaRule.map(r => (r.getLong(0), r.getLong(1))) ==
      direct.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("rule does NOT fire for rank() or frame-modified windows") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val rankDf = sources.Tables.orders(spark, sf)
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    assert(!rankDf.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
  }

  test("high key cardinality stays correct under a tiny partial-key budget") {
    // keys ≈ rows (o_orderkey is unique) and a 16-key map budget: almost
    // every row takes the pass-through path, so this pins that the cap
    // trades shuffle volume — never correctness — and that the final
    // phase ranks from sorted input without per-key state
    val prev = spark.conf.getOption("graft.topk.maxPartialKeys")
    try {
      spark.conf.set("graft.topk.maxPartialKeys", "16")
      val orders = sources.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val out = TopK.topKPerKey(orders, Seq("o_orderkey"),
        Seq(("o_totalprice", false), ("o_custkey", true)), 2)
      assert(out.count() == orders.count(), "unique keys: every row survives")
      assert(out.filter(col("rank") =!= 1).count() == 0)
      // and a many-rows-per-key shape still matches the window formulation
      val custom = TopK.topKPerKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
        .orderBy(col("o_custkey"), col("rank")).collect().toSeq
      assert(custom == windowEquivalent(3)
        .orderBy(col("o_custkey"), col("rank")).collect().toSeq)
    } finally {
      spark.conf.unset("graft.topk.maxPartialKeys")
      prev.foreach(spark.conf.set("graft.topk.maxPartialKeys", _))
    }
  }

  test("final phase demands sorted input (spillable SortExec below it)") {
    val df = TopK.topKPerKey(
      sources.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val p = df.queryExecution.executedPlan.toString
    val finalIdx = p.indexOf("TopKPerKey")
    val sortIdx = p.indexOf("Sort [o_custkey")
    assert(finalIdx >= 0 && sortIdx > finalIdx,
      s"expected Sort (keys ++ ordering) between exchange and final exec:\n$p")
  }

  test("unknown column raises a clear error") {
    intercept[IllegalArgumentException] {
      TopK.topKPerKey(sources.Tables.nation(spark, sf),
        Seq("nope"), Seq(("n_nationkey", true)), 1)
    }
  }
}
