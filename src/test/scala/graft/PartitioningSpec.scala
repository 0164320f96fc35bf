package graft

class PartitioningSpec extends SparkSpec {

  test("scaledCount: clamps to session default below, MaxPartitions above") {
    // small input: never fewer initial partitions than the session
    // default (missing partitions are unrecoverable; extra ones are
    // AQE-coalesced for free)
    assert(Partitioning.scaledCount(11L << 20, 3L << 20, base = 32) == 32)
    // the r11 30x A/B regime: ~340 MB of lineitem at 3 MiB/partition
    // lands within the measured p128 optimum's plateau
    val p30x = Partitioning.scaledCount(340L << 20, 3L << 20, base = 32)
    assert(p30x >= 96 && p30x <= 160, s"30x-class count $p30x")
    // 100x-class input keeps growing linearly instead of plateauing
    val p100x = Partitioning.scaledCount(1130L << 20, 3L << 20, base = 32)
    assert(p100x > 2 * p30x && p100x <= Partitioning.MaxPartitions)
    // runaway estimates cannot schedule unbounded task counts
    assert(Partitioning.scaledCount(Long.MaxValue / 4, 1L, base = 32) ==
      Partitioning.MaxPartitions)
    // exact boundary arithmetic: ceil, not truncate
    assert(Partitioning.scaledCount(100, 33, base = 1) == 4)
  }

  test("tableBytes sizes the parquet fixture; derive clamps at spec SF") {
    val bytes = Partitioning.tableBytes(spark, sf, "lineitem")
    assert(bytes > 0, "lineitem fixture must be non-empty")
    val hint = ScaledShuffle(Seq("lineitem"), bytesPerPartition = 3L << 20)
    val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // sf0.001 lineitem is KBs — derived count must be the clamp (the
    // bench/test regimes keep today's plans; only probe-scale inputs
    // raise the initial count)
    assert(Partitioning.derive(spark, sf, hint) == base)
  }

  test("applyHint sets the AQE initial count for hinted queries and unsets it for the rest") {
    val key = Partitioning.InitialPartitionNumKey
    val hint = Some(ScaledShuffle(Seq("lineitem"), bytesPerPartition = 1L))
    Partitioning.applyHint(spark, sf, hint)
    val derived = spark.conf.get(key).toInt
    assert(derived > spark.conf.get("spark.sql.shuffle.partitions").toInt,
      "a 1-byte-per-partition hint must raise the initial count")
    // the None branch must UNSET (fall back to shuffle.partitions), not
    // leave the previous query's count behind on the shared session
    Partitioning.applyHint(spark, sf, None)
    assert(spark.conf.getOption(key).isEmpty, "hint leaked across queries")
  }

  test("exactly the co-purchase intersect family carries the scaled hint") {
    // the measured per-shape rule (SCALEPROBE r11): big single-pass
    // shuffles scale with data; iterative loops (mst/kcore/pagerank)
    // and output-bound band joins must stay on the session default —
    // this pin fails if a hint is added to (or dropped from) the wrong
    // shape without re-measuring
    val hinted = Registry.all.filter(_.hint.isDefined).map(_.name).toSet
    assert(hinted == Set("q_graph_jaccard", "q_graph_jaccard_capped",
      "q_graph_triangles"), s"hinted set changed: $hinted")
    Registry.all.filter(q => Set("q_graph_mst", "q_graph_kcore",
      "q_join_range_binned").contains(q.name))
      .foreach(q => assert(q.hint.isEmpty,
        s"${q.name} is an iterative/output-bound shape; measured WORSE " +
          "with more partitions (SCALEPROBE r11)"))
  }

  test("hinted query result is identical under the applied hint") {
    // semantics must not depend on the partition posture: run the
    // hinted query through the SparkEntry wrapper (which applies the
    // hint) and through the bare Registry fn (which does not)
    val viaWrapper = SparkEntry.queries("q_graph_jaccard")(spark, sf)
      .collect().map(_.toSeq)
    Partitioning.applyHint(spark, sf, None)
    val bare = q("q_graph_jaccard").collect().map(_.toSeq)
    assert(viaWrapper.toSeq == bare.toSeq)
  }
}
