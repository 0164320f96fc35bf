package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based algebraic laws (SURVEY §5.3) over generated inputs:
  * partition-invariance, dedup idempotence, join cardinality bounds,
  * window-vs-groupBy equivalence, top-k bounds. */
class PropertiesSpec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withInitialSeed(42L), prop)
    assert(res.passed, s"$name: $res")
  }

  private val rowsGen: Gen[List[(Long, String, Double)]] = Gen.nonEmptyListOf(
    for {
      k <- Gen.choose(0L, 6L)
      t <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-100.0, 100.0)
    } yield (k, t, v))

  test("flagship two-level agg is partition-count invariant") {
    import spark.implicits._
    check("partition invariance", Prop.forAll(rowsGen, Gen.choose(1, 9)) { (rows, np) =>
      val df = rows.toDF("k", "t", "v")
      def flag(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("t")).agg(avg(col("v")).as("m"))
          .agg(round(stddev_samp(col("m")), 9)).collect()(0)
      flag(df) == flag(df.repartition(np))
    })
  }

  test("dedup is idempotent and keeps one row per key") {
    import spark.implicits._
    check("dedup idempotence", Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "t", "v")
      val once = df.dropDuplicates("k", "t")
      val twice = once.dropDuplicates("k", "t")
      once.count() == twice.count() &&
        once.count() == df.select(col("k"), col("t")).distinct().count()
    })
  }

  test("as-of all directions match a brute-force reference on random frames") {
    import spark.implicits._
    val asofGen: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] = for {
      left <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 3L); ts <- Gen.choose(0L, 20L)
      } yield (k, ts))
      right <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 3L); ts <- Gen.choose(0L, 20L)
      } yield (k, ts))
    } yield (left.distinct,
      // unique payload per (k, ts) — the operator's documented contract
      right.distinct.map { case (k, t) => (k, t, k * 100 + t) })

    check("asof vs brute", Prop.forAll(asofGen) { case (l, r) =>
      val left = l.toDF("k", "ts")
      val right = r.toDF("k", "ts", "payload")
      def got(df: org.apache.spark.sql.DataFrame) =
        df.select(col("k"), col("ts"), col("payload"))
          .collect().map(x => (x.getLong(0), x.getLong(1),
            if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet
      // brute references
      def backward(k: Long, ts: Long) =
        r.filter(p => p._1 == k && p._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      def forward(k: Long, ts: Long) =
        r.filter(p => p._1 == k && p._2 >= ts).sortBy(_._2).headOption.map(_._3)
      def near(k: Long, ts: Long) = {
        val cand = r.filter(_._1 == k)
        if (cand.isEmpty) None
        else {
          val best = cand.map(p => (math.abs(p._2 - ts), p._2 > ts, p._3)).min
          Some(best._3) // min on (distance, isForward): ties go backward
        }
      }
      val expB = l.map { case (k, t) => (k, t, backward(k, t)) }.toSet
      val expF = l.map { case (k, t) => (k, t, forward(k, t)) }.toSet
      val expN = l.map { case (k, t) => (k, t, near(k, t)) }.toSet
      got(operators.AsOf.lastEarlier(left, right, "k", "ts", "payload")) == expB &&
        got(operators.AsOf.firstLater(left, right, "k", "ts", "payload")) == expF &&
        got(operators.AsOf.nearest(left, right, "k", "ts", "payload")) == expN
    }, n = 15)
  }

  test("connected components match brute-force union-find on random graphs") {
    import spark.implicits._
    val graphGen: Gen[(List[Long], List[(Long, Long)])] = for {
      n <- Gen.choose(2, 20)
      nodes = (0L until n.toLong).toList
      edges <- Gen.listOf(for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (nodes, edges.distinct)

    check("cc vs union-find", Prop.forAll(graphGen) { case (nodes, edges) =>
      // brute-force union-find reference
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(x => x -> find(x)).toMap
      val got = operators.Dedup.connectedComponents(
          nodes.toDF("id"), "id", edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }, n = 8)
  }

  test("join cardinality bounds: semi <= left, inner <= left*right") {
    import spark.implicits._
    check("join bounds", Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val lf = l.toDF("k", "t", "v")
      val rf = r.toDF("k", "t", "v")
      val inner = lf.join(rf, "k").count()
      val semi = lf.join(rf, Seq("k"), "left_semi").count()
      semi <= lf.count() && inner <= lf.count() * rf.count() &&
        lf.join(rf, Seq("k"), "left_outer").count() >= lf.count()
    })
  }

  test("unbounded window sum == groupBy sum joined back") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    check("window vs groupBy", Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "t", "v")
      val w = Window.partitionBy(col("k"))
      val viaWindow = df.withColumn("s", round(sum(col("v")).over(w), 6))
        .select(col("k"), col("s")).distinct()
      val viaGroup = df.groupBy(col("k")).agg(round(sum(col("v")), 6).as("s"))
      viaWindow.except(viaGroup).count() == 0 &&
        viaGroup.except(viaWindow).count() == 0
    })
  }

  test("topKPerKey: at most k per key, ranks contiguous from 1") {
    import spark.implicits._
    check("topk bounds", Prop.forAll(rowsGen, Gen.choose(1, 4)) { (rows, k) =>
      val df = rows.toDF("k", "t", "v").withColumn("id", monotonically_increasing_id())
      val out = operators.TopK.topKPerKey(df, Seq("k"),
        Seq(("v", false), ("id", true)), k).collect()
      val byKey = out.groupBy(_.getLong(0))
      byKey.forall { case (_, rs) =>
        rs.length <= k &&
          rs.map(_.getLong(4)).sorted.toSeq == (1L to rs.length.toLong)
      }
    })
  }

  test("union count additivity, intersect bounded by min") {
    import spark.implicits._
    check("set op laws", Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      val af = a.toDF("k", "t", "v")
      val bf = b.toDF("k", "t", "v")
      af.unionByName(bf).count() == af.count() + bf.count() &&
        af.select(col("k")).intersect(bf.select(col("k"))).count() <=
          math.min(af.select(col("k")).distinct().count(),
            bf.select(col("k")).distinct().count())
    })
  }
}
