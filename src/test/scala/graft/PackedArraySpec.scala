package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{PackedFns, PackedOps}

/** The varint delta-packed adjacency layer (r12 verdict item 1):
  * round-trip exactness of [[PackedOps.pack]], value identity of the
  * packed merge-scan intersects against Spark's own
  * `array_intersect`, and end-to-end result identity of the packed
  * q_graph_jaccard / q_graph_triangles forms against the long-array
  * forms they replaced. */
class PackedArraySpec extends SparkSpec {

  private def packBytes(xs: Seq[Long]): Array[Byte] =
    PackedOps.pack(new org.apache.spark.sql.catalyst.util.GenericArrayData(
      xs.toArray))

  private def decode(b: Array[Byte]): Seq[Long] = {
    // independent reference decoder (not the code under test's loops)
    val out = scala.collection.mutable.Buffer[Long]()
    var p = 0
    var prev = 0L
    while (p < b.length) {
      var v = 0L; var shift = 0; var by = 0
      do { by = b(p); v |= (by & 0x7fL) << shift; shift += 7; p += 1 }
      while ((by & 0x80) != 0)
      prev = if (out.isEmpty) v else prev + v
      out += prev
    }
    out.toSeq
  }

  test("pack round-trips sorted long arrays, including >int32 ids and wide deltas") {
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty,
      Seq(0L),
      Seq(7L),
      Seq(1L, 2L, 3L),
      Seq(5L, 5L, 5L), // duplicate run (not produced by callers, but legal)
      // the probe id shape the int32 cast would overflow on:
      // make_probe.py offsets replica ids by k*1e9
      Seq(41L, 17000L, 3L * 1000000000L + 41L, 99L * 1000000000L + 17L),
      Seq(Long.MaxValue - 1, Long.MaxValue), // 9-byte varints
      (0L until 500L).map(_ * 12347L)
    )
    cases.foreach { xs =>
      assert(decode(packBytes(xs)) == xs, s"round-trip failed for $xs")
    }
    // byte economy is the point: locally-dense sorted ids must pack far
    // below 8 B/element (this is the shuffle cut the family relies on)
    val dense = (1000000000L until 1000000200L).map(_ * 3)
    val packed = packBytes(dense)
    assert(packed.length < dense.length * 2,
      s"dense ids packed to ${packed.length} B for ${dense.length} els")
  }

  test("pack_sorted fails loudly on a null element") {
    // ADVICE r13: session-registered, so SQL can reach it with
    // containsNull=true arrays — a null slot must error, not pack
    // garbage that silently diverges from array_intersect semantics
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a",
      ArrayType(LongType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq[Any](1L, null, 3L)))),
      schema)
    val ex = intercept[Exception] {
      df.select(call_function("pack_sorted", col("a"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("pack_sorted: null element")),
      s"expected the loud null-element error, got: $ex")
  }

  test("packed intersects == array_intersect on sorted arrays (codegen path, property sweep)") {
    // deterministic pseudo-random sorted arrays with controlled overlap,
    // evaluated THROUGH the DataFrame layer so whole-stage codegen runs
    val rnd = new scala.util.Random(20260816L)
    val rows = (1 to 200).map { i =>
      val n1 = rnd.nextInt(40); val n2 = rnd.nextInt(40)
      val base = Seq.fill(n1)(rnd.nextInt(200).toLong)
      val other = Seq.fill(n2)(rnd.nextInt(200).toLong)
      // mix in huge-id elements so the merge scan sees >int32 values
      val big = if (i % 3 == 0) Seq(7L * 1000000000L + i) else Seq.empty
      Row(i,
        (base ++ big).distinct.sorted,
        (other ++ big ++ base.take(n1 / 2)).distinct.sorted)
    }
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("a", ArrayType(LongType, containsNull = false)),
      StructField("b", ArrayType(LongType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = df.select(col("id"),
        size(array_intersect(col("a"), col("b"))).cast(LongType).as("ref_c"),
        array_intersect(col("a"), col("b")).as("ref_v"),
        PackedFns.packedIntersectCount(
          PackedFns.packSorted(col("a")),
          PackedFns.packSorted(col("b"))).as("got_c"),
        PackedFns.packedIntersect(
          PackedFns.packSorted(col("a")),
          PackedFns.packSorted(col("b"))).as("got_v"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), s"count mismatch at id ${r.getInt(0)}")
      assert(r.getSeq[Long](2) == r.getSeq[Long](4),
        s"values mismatch at id ${r.getInt(0)}")
    }
  }

  test("q_graph_jaccard: packed form is result-identical to the long-array form") {
    import operators.Graph.coPurchaseEdges
    val und = coPurchaseEdges(spark, sf)
    // the r12 long-array form, verbatim (the shape the oracle verified
    // for 12 rounds) — the packed production query must match it row
    // for row, column for column
    val adj = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val legacy = und
      .join(adj.select(col("src").as("u"), col("nbrs").as("nu")), "u")
      .join(adj.select(col("src").as("v"), col("nbrs").as("nv")), "v")
      .select(col("u"), col("v"),
        size(array_intersect(col("nu"), col("nv"))).cast(LongType).as("c"),
        size(col("nu")).cast(LongType).as("du"),
        size(col("nv")).cast(LongType).as("dv"))
      .where(col("c") >= 3)
      .select(col("u"), col("v"), col("c"),
        round(col("c").cast("double") /
          (col("du") + col("dv") - col("c")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("u"), col("v"))
      .limit(20)
    assert(q("q_graph_jaccard").collect().toSeq == legacy.collect().toSeq)
  }

  test("q_graph_triangles: packed form is result-identical to the long-array form") {
    import operators.Graph.coPurchaseEdges
    val edges = coPurchaseEdges(spark, sf)
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val ori = edges
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"))
      .localCheckpoint()
    val adj = ori.groupBy(col("s").as("node"))
      .agg(sort_array(collect_list(col("t"))).as("nbrs"))
    val legacy = ori
      .join(adj.select(col("node").as("s"), col("nbrs").as("ns")), "s")
      .join(adj.select(col("node").as("t"), col("nbrs").as("nt")), "t")
      .select(col("s"), col("t"),
        array_intersect(col("ns"), col("nt")).as("ws"))
      .where(size(col("ws")) > 0)
      .select(explode(concat(
        array(struct(col("s").as("part"),
          size(col("ws")).cast("long").as("c")),
          struct(col("t").as("part"),
            size(col("ws")).cast("long").as("c"))),
        transform(col("ws"),
          w => struct(w.as("part"), lit(1L).as("c"))))).as("pc"))
      .groupBy(col("pc.part").as("part"))
      .agg(sum(col("pc.c")).as("tri_cnt"))
      .orderBy(col("part"))
    assert(q("q_graph_triangles").collect().toSeq == legacy.collect().toSeq)
  }
}
