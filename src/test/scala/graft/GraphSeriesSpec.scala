package graft

import org.apache.spark.sql.functions._

/** Specs for the round-7 additions: fixed-iteration PageRank, series
  * gap-fill interpolation, scalable global id assignment, and the
  * leakage-safe grouped split. Correctness vs DuckDB is the Verify
  * gate; these pin the algebraic invariants the oracle can't (mass
  * conservation, interpolation bounds, group coherence). */
class GraphSeriesSpec extends SparkSpec {

  test("pagerank: one row per node, mass conserved, deterministic replay") {
    val rows = q("q_graph_pagerank").collect()
    val nodes = sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey")).distinct().count() +
      sources.Tables.lineitem(spark, sf)
        .select(col("l_partkey")).distinct().count()
    assert(rows.length == nodes, s"got ${rows.length} rows for $nodes nodes")
    val prs = rows.map(_.getDouble(1))
    assert(prs.forall(_ > 0), "ranks are strictly positive")
    // teleport + no dangling nodes ⇒ total rank is conserved at 1.0,
    // i.e. the normalized ranks average to 1.0
    val mean = prs.sum / prs.length
    assert(math.abs(mean - 1.0) < 1e-6, s"mean normalized rank $mean != 1")
    // rank spread is real (the graph is not regular): top node must
    // beat the mean by a margin, else the iteration did nothing
    assert(prs.max > 1.1, s"max ${prs.max} suspiciously flat")
    val again = q("q_graph_pagerank").collect().map(_.getDouble(1))
    assert(prs.toSeq == again.toSeq, "fixed-iteration ranks must replay exactly")
  }

  test("hits: exact-integer replay of all three rounds; shares mean to 1") {
    val rows = q("q_graph_hits").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // first-principles driver replay with BigInt (no width ceiling)
    val pairs = sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var hub = pairs.map(_._1).distinct.map(_ -> BigInt(1)).toMap
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      auth = pairs.groupBy(_._2).map { case (p, g) =>
        p -> g.map(x => hub(x._1)).sum }
      hub = pairs.groupBy(_._1).map { case (s, g) =>
        s -> g.map(x => auth(x._2)).sum }
    }
    def shares(m: Map[Long, BigInt], pfx: String) = {
      val tot = m.values.sum.toDouble
      m.map { case (k, v) =>
        (pfx + k) -> BigDecimal(v.toDouble * m.size / tot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    }
    val expect = (shares(hub, "s") ++ shares(auth, "p")).toMap
    assert(rows.length == expect.size, "one row per node")
    rows.foreach { case (node, kind, sc) =>
      assert(kind == (if (node.startsWith("s")) "hub" else "auth"))
      assert(math.abs(sc - expect(node)) <= 1e-6,
        s"$node: $sc != ${expect(node)}")
    }
    // normalization contract: shares of each kind average to 1.0
    Seq("hub", "auth").foreach { k =>
      val xs = rows.filter(_._2 == k).map(_._3)
      assert(math.abs(xs.sum / xs.length - 1.0) < 1e-4, s"$k mean")
    }
  }

  test("holt: level/trend fold replays a scalar recurrence exactly") {
    val rows = q("q_ts_holt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val series = sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("event_type"), col("hr"))
      .collect().map(r => (r.getString(0), r.getLong(2).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    rows.foreach { case (et, n, fc, tr, mae) =>
      val xs = series(et)
      assert(n == xs.length.toLong)
      var l = xs(0); var b = xs(1) - xs(0); var e = 0.0
      xs.drop(2).foreach { x =>
        val l2 = 0.3 * x + 0.7 * (l + b)
        val b2 = 0.1 * (l2 - l) + 0.9 * b
        e += math.abs(x - (l + b))
        l = l2; b = b2
      }
      def r6(d: Double) =
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(fc == r6(l + b), s"$et forecast")
      assert(tr == r6(b), s"$et trend")
      assert(mae == r6(e / (xs.length - 2)), s"$et mae")
    }
  }

  test("holt-winters: triple-smoothing fold replays a scalar recurrence exactly") {
    val rows = q("q_ts_holtwinters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    // the zero-filled grid the operator folds over
    val b0 = sources.Tables.events(spark, sf)
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi")).head()
    val (lo, hi) = (b0.getTimestamp(0).getTime, b0.getTimestamp(1).getTime)
    val spineHrs = (lo to hi by 3600000L).toVector
    val observed = sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getLong(2))
      .toMap
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (et, n, lev, tr, fc, amp, mae) =>
      val xs = spineHrs.map(h => observed.getOrElse((et, h), 0L).toDouble)
      assert(n == xs.length.toLong && xs.length >= 49)
      var l = xs.take(24).foldLeft(0.0)(_ + _) / 24.0
      var b = (xs.slice(24, 48).foldLeft(0.0)(_ + _) -
        xs.take(24).foldLeft(0.0)(_ + _)) / 576.0
      val seas = scala.collection.mutable.Queue(
        xs.take(24).map(_ - l): _*)
      var e = 0.0
      xs.drop(24).foreach { x =>
        val sm = seas.dequeue()
        val l2 = 0.3 * (x - sm) + 0.7 * (l + b)
        val b2 = 0.1 * (l2 - l) + 0.9 * b
        val s2 = 0.2 * (x - l - b) + 0.8 * sm
        e += math.abs(x - (l + b + sm))
        l = l2; b = b2; seas.enqueue(s2)
      }
      assert(lev == r6(l), s"$et level")
      assert(tr == r6(b), s"$et trend")
      assert(fc == r6(l + b + seas.head), s"$et forecast")
      assert(amp == r6(seas.max - seas.min), s"$et seasonal amplitude")
      assert(mae == r6(e / (xs.length - 24)), s"$et mae")
      assert(amp > 0.0, s"$et must carry a real seasonal signal")
    }
  }

  test("interpolation: full grid, observed hours untouched, gaps bounded by neighbors") {
    val rows = q("q_ts_interpolate").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getLong(3)))
    val types = rows.map(_._1).distinct.length
    val hours = rows.map(_._2).distinct.length
    assert(rows.length == types * hours, "dense key × hour grid")
    assert(rows.forall(_._3 != null), "no nulls survive the fill")
    val gaps = rows.count(_._4 == 1L)
    assert(gaps > 0, "fixture must actually exercise interpolation")
    // every observed cell equals the raw hourly rollup
    val raw = sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(round(sum(col("value")), 6).as("v")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap
    rows.filter(_._4 == 0L).foreach { case (t, hr, v, _) =>
      assert(raw((t, hr)) == v, s"observed cell ($t,$hr) rewritten: $v")
    }
    // every gap sits within [min, max] of its nearest observed values
    // per key (linear interpolation never overshoots; edges clamp)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val s = series.sortBy(_._2.getTime)
      s.indices.filter(s(_)._4 == 1L).foreach { i =>
        val prev = s.take(i).reverse.find(_._4 == 0L).map(_._3)
        val next = s.drop(i + 1).find(_._4 == 0L).map(_._3)
        val bounds = Seq(prev, next).flatten
        assert(bounds.nonEmpty, "gap with no observed neighbor at all")
        val (lo, hi) = (bounds.min, bounds.max)
        assert(s(i)._3 >= lo - 1e-6 && s(i)._3 <= hi + 1e-6,
          s"interpolated ${s(i)._3} outside [$lo, $hi]")
      }
    }
  }

  test("global ids: contiguous 1..N in doc_id order, no global window") {
    val rows = q("q_global_ids").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length
    assert(rows.map(_._2).sorted.toSeq == (1L to n).toSeq,
      "ids are a contiguous 1..N permutation")
    // doc_id-sorted output carries strictly increasing gids
    assert(rows.map(_._2).toSeq == (1L to n).toSeq,
      "gid order matches doc_id order")
    // the plan must not contain a single-partition global Window
    val plan = q("q_global_ids").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global ids must never fall back to a single-partition window:\n$plan")
  }

  test("grouped split: every source lands wholly in one subset") {
    val rows = q("q_split_grouped").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // one (source, subset) row per source ⇒ no source straddles splits
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, rs) =>
      assert(rs.length == 1, s"source $src split across ${rs.length} subsets")
    }
    val total = rows.map(_._3).sum
    assert(total == sources.Tables.documents(spark, sf).count(),
      "every doc counted exactly once")
    // and the assignment agrees with the per-doc rule applied to source
    rows.foreach { case (src, subset, _) =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      val expect = if (b < "e666") "train" else if (b < "f333") "val" else "test"
      assert(subset == expect, s"$src: $subset != $expect (bucket $b)")
    }
  }

  test("anomaly: warm-up rows unflagged, z recomputable from trailing window") {
    val rows = q("q_ts_anomaly").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, series) =>
      val byHr = series.sortBy(_._2.getTime)
      // first 24 rows lack a full trailing day: z must be null, flag false
      byHr.take(24).foreach { r =>
        assert(r._4.isEmpty && !r._5, s"$et warm-up row flagged: $r")
      }
      // recompute one z from first principles at a row that has one
      byHr.zipWithIndex.drop(24).find(_._1._4.isDefined).foreach {
        case ((_, _, c, Some(z), flagged), i) =>
          val frame = byHr.slice(i - 24, i).map(_._3.toDouble)
          val mean = frame.sum / 24.0
          val varS = frame.map(x => (x - mean) * (x - mean)).sum / 23.0
          val expect = (c - mean) / math.sqrt(varS)
          assert(math.abs(z - expect) < 1e-4, s"$et z=$z expected=$expect")
          assert(flagged == (math.abs(z) >= 2.0), s"$et flag mismatch at z=$z")
        case _ => ()
      }
    }
  }

  test("mst: Boruvka forest equals a driver-side Kruskal exactly") {
    // rebuild the weighted co-purchase edge list driver-side
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet.toSeq
    def w(u: Long, v: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"w:$u:$v".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(6).map("%02x".format(_)).mkString, 16)
    }
    val weighted = edges.map { case (u, v) => (u, v, w(u, v)) }
    // unique weights => unique MSF => exact equality is well-defined
    assert(weighted.map(_._3).distinct.length == weighted.length,
      "fixture weights must be distinct for the uniqueness premise")
    // Kruskal with union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = weighted.sortBy(_._3).filter { case (u, v, _) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) false else { parent(ru) = rv; true }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val nComp = nodes.map(find).distinct.length
    assert(kruskal.length == nodes.length - nComp,
      "forest size must be V - #components")
    val got = q("q_graph_mst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expTop = kruskal.sortBy { case (u, v, wt) => (-wt, u, v) }.take(50)
    assert(got.toSeq == expTop,
      "Boruvka's 50 heaviest forest edges must equal Kruskal's")
    assert(got.forall { case (u, v, wt) => wt == w(u, v) && u < v })
  }

  test("crosscorr: lag 0 equals the corr matrix; lags shift consistently") {
    val xrows = q("q_ts_crosscorr").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val types = xrows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    val nPairs = types.length * (types.length - 1) / 2
    assert(xrows.length == nPairs * 7, "7 lags per unordered pair")
    // lag 0 must agree with q_ts_corr_matrix (same grid, same pair)
    val mat = q("q_ts_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    xrows.filter(_._3 == 0L).foreach { case (a, b, _, _, xcf) =>
      assert(math.abs(xcf - mat((a, b))) < 2e-6,
        s"($a,$b) lag-0 xcf $xcf != corr ${mat((a, b))}")
    }
    xrows.foreach { case (a, b, lag, n, xcf) =>
      assert(a < b && math.abs(xcf) <= 1.0)
      // the grid is the set of OBSERVED hours (gaps allowed, as
      // autocorr) — so the overlap size is |S ∩ (S+L)|, which is
      // symmetric in the lag sign and bounded by the lag-0 grid size
      val n0 = xrows.find(r => r._1 == a && r._2 == b && r._3 == 0L).get._4
      val nNeg = xrows.find(r => r._1 == a && r._2 == b && r._3 == -lag)
        .get._4
      assert(n <= n0 && n > 0, s"($a,$b,$lag) overlap $n vs grid $n0")
      assert(n == nNeg, s"($a,$b) overlap must be lag-sign symmetric")
    }
  }

  test("corr matrix: all pairs over the full grid, one pair recomputed from raw events") {
    val rows = q("q_ts_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val types = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    assert(rows.length == types.length * (types.length - 1) / 2,
      "one row per unordered series pair")
    val nHours = rows.head._3
    rows.foreach { case (a, b, n, c) =>
      assert(a < b && n == nHours, s"($a,$b) grid size $n != $nHours")
      assert(math.abs(c) <= 1.0, s"($a,$b) corr $c out of range")
    }
    // recompute the first pair from the raw events, zero-filled
    val (ta, tb, _, corr) = rows.head
    val ev = sources.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val hours = ev.map(_._2).distinct
    def series(t: String): Seq[Double] = {
      val byHr = ev.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length)
      hours.sorted.map(h => byHr.getOrElse(h, 0).toDouble)
    }
    val (xs, ys) = (series(ta), series(tb))
    val n = xs.length.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val expect = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    assert(math.abs(corr - expect) < 1e-5, s"($ta,$tb) corr $corr != $expect")
  }

  test("ewma: recomputed from the trailing frame, bounded by frame min/max") {
    val rows = q("q_ts_ewma").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, series) =>
      val byHr = series.sortBy(_._2)
      byHr.zipWithIndex.foreach { case ((_, _, _, ewma), i) =>
        val frame = byHr.slice(math.max(0, i - 23), i + 1).map(_._3.toDouble)
        val wts = frame.indices.map(j => math.pow(0.9, frame.length - 1 - j))
        val expect = frame.zip(wts).map { case (x, w) => x * w }.sum / wts.sum
        assert(math.abs(ewma - expect) < 1e-5, s"$et@$i: $ewma != $expect")
        assert(ewma >= frame.min - 1e-6 && ewma <= frame.max + 1e-6,
          s"$et@$i: ewma $ewma outside frame range")
      }
    }
  }

  test("changepoint: argmax recomputed from raw events, means bracket the split") {
    val rows = q("q_ts_changepoint").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length,
      "one changepoint per series")
    val ev = sources.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    rows.foreach { case (et, cpHr, cpT, maxDev, meanPre, meanPost) =>
      val counts = ev.filter(_._1 == et).groupBy(_._2).view
        .mapValues(_.length.toLong).toSeq.sortBy(_._1)
      val n = counts.length.toLong
      val s = counts.map(_._2).sum
      // scan every prefix; expect the query's (maxDev, earliest-hr) argmax
      var cum = 0L
      val devs = counts.dropRight(1).zipWithIndex.map { case ((hr, c), i) =>
        cum += c; (hr, i + 1L, math.abs(n * cum - (i + 1L) * s))
      }
      val m = devs.map(_._3).max
      val (bestHr, bestT, _) = devs.filter(_._3 == m).minBy(_._1)
      assert((cpHr, cpT, maxDev) == (bestHr, bestT, m),
        s"$et: query ($cpHr,$cpT,$maxDev) != recomputed ($bestHr,$bestT,$m)")
      val pre = counts.take(bestT.toInt).map(_._2)
      val post = counts.drop(bestT.toInt).map(_._2)
      assert(math.abs(meanPre - pre.sum.toDouble / pre.length) < 1e-5)
      assert(math.abs(meanPost - post.sum.toDouble / post.length) < 1e-5)
    }
  }

  test("resample: bars partition events, OHLC picked from real rows") {
    val ev = sources.Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val bars = q("q_ts_resample").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(bars.map(_._3).sum == ev.length, "bars must partition the events")
    val byBar = ev.groupBy { case (et, ts, _) =>
      (et, ts.getTime / 1000 / 21600 * 21600) }
    bars.foreach { case (et, bar, n, open, high, low, close) =>
      val group = byBar((et, bar.getTime / 1000))
      assert(group.size == n)
      val ordered = group.sortBy(_._2.getTime)
      assert(open == ordered.head._3 && close == ordered.last._3,
        s"open/close not the first/last event of bar $et/$bar")
      assert(high == group.map(_._3).max && low == group.map(_._3).min)
    }
  }

  test("triangles: degree-oriented counts equal the naive id-ordered enumeration") {
    val rows = q("q_graph_triangles").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.forall(_._2 > 0),
      "only triangle-participating parts appear, all with positive counts")
    // recompute naively: id-ordered edges, 3-way self-join (the oracle
    // algorithm, here run through Spark so the spec is engine-internal)
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"),
        col("l_partkey").cast("long").as("pk")).distinct()
    val edges = op.select(col("ok"), col("pk").as("u"))
      .join(op.select(col("ok"), col("pk").as("v")), Seq("ok"))
      .where(col("u") < col("v"))
      .select(col("u"), col("v")).distinct().localCheckpoint()
    val e1 = edges.select(col("u").as("x"), col("v").as("y"))
    val e2 = edges.select(col("u").as("y"), col("v").as("z"))
    val e3 = edges.select(col("u").as("x"), col("v").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
    val nTri = tri.count()
    assert(rows.map(_._2).sum == 3 * nTri,
      s"per-node counts must sum to 3×$nTri triangles")
    val naive = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("part"))
      .groupBy("part").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { case (p, c) =>
      assert(naive.getOrElse(p, 0L) == c,
        s"part $p: degree-oriented $c != naive ${naive.getOrElse(p, 0L)}")
    }
    assert(rows.length == naive.size, "same participating-part set")
  }

  test("labelprop: label is exactly the min id within 4 hops (first-principles BFS)") {
    val rows = q("q_graph_labelprop").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.nonEmpty)
    // rebuild the bipartite graph in plain Scala and run 4 synchronous
    // min-propagation rounds — the query must agree on every node
    val pairs = sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)).distinct
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4)
      lbl = lbl.map { case (n, l) =>
        n -> math.min(l, adj(n).map(lbl).min)
      }
    def disp(x: Long) = if (x % 2 == 0) s"s${x / 2}" else s"p${(x - 1) / 2}"
    val expect = lbl.toSeq.map { case (n, l) => (disp(n), disp(l)) }
      .sortBy(_._1)
    assert(rows.toSeq == expect,
      "4-round labels must equal the first-principles propagation")
  }

  test("kcore: survivors equal the first-principles 4-round synchronous peel") {
    val rows = q("q_graph_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "fixture graph must have a 3-core remnant")
    // rebuild the co-purchase graph and peel it in plain Scala:
    // each round removes ALL nodes with degree < 3 simultaneously
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und: Set[(Long, Long)] = op.groupBy(_._1).valuesIterator.flatMap { g =>
      val ps: Seq[Long] = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    var adj: Map[Long, Set[Long]] =
      (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    // k = exact 5th-percentile initial degree, (n−1)·q interpolation
    val degs = adj.values.map(_.size.toDouble).toArray.sorted
    val h = (degs.length - 1) * 0.05
    val lo = math.floor(h).toInt
    val k =
      if (lo + 1 >= degs.length) degs(lo)
      else degs(lo) + (h - lo) * (degs(lo + 1) - degs(lo))
    for (_ <- 1 to 4) {
      val keep = adj.collect { case (n, ns) if ns.size >= k => n }.toSet
      adj = adj.collect {
        case (n, ns) if keep(n) => n -> ns.filter(keep)
      }
    }
    val expect = adj.toSeq
      .collect { case (n, ns) if ns.nonEmpty => (n, ns.size.toLong) }
      .sortBy(_._1)
    assert(rows.toSeq == expect,
      "peeled degrees must equal the first-principles peel")
    // and the peel genuinely removed something (the query is not a
    // trivial degree count)
    val fullNodes = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).size
    assert(rows.length < fullNodes,
      "at least one node must have been peeled away")
  }

  test("bfs: distances equal the first-principles 4-round frontier expansion") {
    val rows = q("q_graph_bfs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und: Set[(Long, Long)] = op.groupBy(_._1).valuesIterator.flatMap { g =>
      val ps: Seq[Long] = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    // seed = max degree, min id tie-break (degree counts both directions)
    val seed = adj.toSeq.map { case (n, ns) => (n, ns.size) }
      .sortBy { case (n, d) => (-d, n) }.head._1
    var dist = Map(seed -> 0L)
    for (_ <- 1 to 4) {
      val next = dist.toSeq.flatMap { case (n, d) =>
        adj(n).map(_ -> (d + 1))
      }
      dist = (dist.toSeq ++ next).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(rows.toSeq == dist.toSeq.sortBy(_._1),
      "BFS distances must equal the first-principles expansion")
    assert(rows.map(_._2).max >= 1L, "frontier must actually expand")
  }

  test("sssp: weighted distances equal first-principles 4-round Bellman-Ford") {
    val rows = q("q_graph_sssp").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val shared = new scala.collection.mutable.HashMap[(Long, Long), Long]()
    op.groupBy(_._1).valuesIterator.foreach { g =>
      val ps: Seq[Long] = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b)
        shared((a, b)) = shared.getOrElse((a, b), 0L) + 1
    }
    val edges = shared.toSeq.flatMap { case ((u, v), c) =>
      val w = 11L - math.min(c, 10L)
      Seq((u, v, w), (v, u, w))
    }
    val adj = edges.groupBy(_._1)
    val seed = adj.map { case (n, es) => (n, es.size) }.toSeq
      .sortBy { case (n, d) => (-d, n) }.head._1
    var dist = Map(seed -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = dist.toSeq.flatMap { case (n, d) =>
        adj.getOrElse(n, Nil).map(e => e._2 -> (d + e._3))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(rows.toSeq == dist.toSeq.sortBy(_._1),
      "SSSP must equal the first-principles relaxation")
    // weights genuinely matter: some node's weighted distance must
    // exceed its hop count (cost > 1 on its cheapest path)
    val hops = {
      var h = Map(seed -> 0L)
      for (_ <- 1 to 4) {
        val nx = h.toSeq.flatMap { case (n, d) =>
          adj.getOrElse(n, Nil).map(e => e._2 -> (d + 1)) }
        h = (h.toSeq ++ nx).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      h
    }
    assert(dist.exists { case (n, d) => d > hops(n) },
      "weighted distances collapsed to hop counts — weights inert")
  }

  test("jaccard: top-20 replays from first-principles neighbor sets") {
    val rows = q("q_graph_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20)
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und: Set[(Long, Long)] = op.groupBy(_._1).valuesIterator.flatMap { g =>
      val ps: Seq[Long] = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // edge-restricted by design: only co-purchased pairs are scored
    val expect = (for {
      (u, v) <- und.toSeq
      c = (adj(u) & adj(v)).size if c >= 3
    } yield (u, v, c.toLong,
      round6(c.toDouble / (adj(u).size + adj(v).size - c))))
      .sortBy { case (u, v, _, j) => (-j, u, v) }.take(20)
    assert(rows.toSeq == expect,
      "top-20 must equal the brute-force neighbor-set Jaccard")
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0), "J in (0,1]")
  }

  test("jaccard capped: exact on the hub-pruned subgraph, cap bites, no hub survives") {
    val rows = q("q_graph_jaccard_capped").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20)
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und: Set[(Long, Long)] = op.groupBy(_._1).valuesIterator.flatMap { g =>
      val ps: Seq[Long] = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    // cap = floor of the exact 99th-percentile degree, (n−1)·q interp
    val degs = adj.values.map(_.size.toDouble).toArray.sorted
    val h = (degs.length - 1) * 0.99
    val lo = math.floor(h).toInt
    val p99 =
      if (lo + 1 >= degs.length) degs(lo)
      else degs(lo) + (h - lo) * (degs(lo + 1) - degs(lo))
    val cap = math.floor(p99).toLong
    // the cap must actually bite at spec scale, or the query proves
    // nothing about hub pruning
    assert(adj.values.exists(_.size > cap),
      s"fixture has no hub above cap=$cap — percentile cap never bites")
    // exact Jaccard on the INDUCED subgraph of non-hub nodes
    val keep = adj.filter(_._2.size <= cap).keySet
    val ek = und.filter { case (u, v) => keep(u) && keep(v) }
    val adjK = (ek.toSeq ++ ek.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (for {
      (u, v) <- ek.toSeq
      c = (adjK(u) & adjK(v)).size if c >= 3
    } yield (u, v, c.toLong,
      round6(c.toDouble / (adjK(u).size + adjK(v).size - c))))
      .sortBy { case (u, v, _, j) => (-j, u, v) }.take(20)
    assert(rows.toSeq == expect,
      "capped top-20 must equal brute-force Jaccard on the pruned subgraph")
    // every surviving endpoint obeys the cap (the per-edge intersect
    // work bound 2·cap·|E| rests on exactly this)
    rows.foreach { case (u, v, _, _) =>
      assert(adjK(u).size <= cap && adjK(v).size <= cap, s"hub in output: ($u,$v)")
    }
  }

  test("modularity: per-brand contributions replay from first principles") {
    val rows = q("q_graph_modularity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length > 1, "brand partition must have several communities")
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und: Set[(Long, Long)] = op.groupBy(_._1).valuesIterator.flatMap { g =>
      val ps: Seq[Long] = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val dirEdges = und.toSeq ++ und.toSeq.map(e => (e._2, e._1))
    val brand = sources.Tables.part(spark, sf)
      .select(col("p_partkey").cast("long"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = dirEdges.length.toLong
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deg = dirEdges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expect = brand.values.toSeq.distinct.sorted.map { b =>
      val nodes = brand.collect { case (n, bb) if bb == b && deg.contains(n) => n }.toSet
      val dsum = nodes.toSeq.map(deg).sum
      val intra = dirEdges.count(e => brand.get(e._1).contains(b) &&
        brand.get(e._2).contains(b)).toLong
      (b, nodes.size.toLong, intra, dsum,
        round6((intra.toDouble / m2) -
          ((dsum.toDouble / m2) * (dsum.toDouble / m2))))
    }
    assert(rows.toSeq == expect, "modularity table must replay exactly")
    // total modularity is a proper score in [-1, 1]
    val totalQ = rows.map(_._5).sum
    assert(totalQ >= -1.0 && totalQ <= 1.0,
      s"total modularity $totalQ out of range")
  }

  test("autocorr: per-lag ACF replays from the zero-filled grid") {
    val rows = q("q_ts_autocorr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val lags = Seq(1L, 2L, 3L, 6L, 12L, 24L)
    val types = rows.map(_._1).distinct
    assert(rows.length == types.length * lags.length, "types × lags rows")
    assert(rows.forall(r => math.abs(r._4) <= 1.0), "ACF in [-1,1]")
    // zero-filled grid over the OBSERVED hour set, aligned by the
    // true epoch-hour index (a missing grid hour yields no pair —
    // exactly what the query's integer-index join guarantees)
    val ev = sources.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val lo = ev.map(_._2).min
    val idxOf = (h: Long) => (h - lo) / 3600000L
    val observed = ev.map(e => idxOf(e._2)).distinct.sorted
    def series(t: String): Map[Long, Long] = {
      val byIdx = ev.filter(_._1 == t).groupBy(e => idxOf(e._2))
        .view.mapValues(_.length.toLong).toMap
      observed.map(i => i -> byIdx.getOrElse(i, 0L)).toMap
    }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (t, lag, n, acf) =>
      val xs = series(t)
      val pairs = observed.filter(i => xs.contains(i + lag))
        .map(i => (xs(i), xs(i + lag)))
      assert(n == pairs.length.toLong, s"$t lag $lag pair count")
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val expect = round6((n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
      assert(math.abs(acf - expect) < 1e-9, s"$t lag $lag: $acf != $expect")
    }
  }

  test("mad outliers: median/MAD replay, robust to what breaks the mean") {
    val rows = q("q_ts_outlier_mad").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def qc(sorted: Array[Double], p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = math.floor(h).toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    rows.groupBy(_._1).foreach { case (et, series) =>
      val cs = series.map(_._3.toDouble).sorted
      val med = qc(cs, 0.5)
      val mad = qc(series.map(v => math.abs(v._3 - med)).sorted.toArray, 0.5)
      series.foreach { case (_, hr, c, rz, flag) =>
        if (mad > 0.0) {
          val expect = round6((0.6745 * (c - med)) / mad)
          assert(rz.contains(expect), s"$et@$hr rz ${rz} != $expect")
          assert(flag == (math.abs(expect) >= 3.5), s"$et@$hr flag")
        } else assert(rz.isEmpty && !flag, s"$et@$hr degenerate MAD")
      }
    }
  }

  test("rolling quantile: per-series frames replay exactly ((n-1)q interpolation)") {
    val rows = q("q_ts_rolling_quantile").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def qc(sorted: Array[Double], p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = math.floor(h).toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    rows.groupBy(_._1).foreach { case (_, series) =>
      val s = series.sortBy(_._2.getTime)
      s.indices.foreach { i =>
        val frame = s.slice(math.max(0, i - 23), i + 1)
          .map(_._3.toDouble).sorted
        assert(s(i)._4 == frame.length.toLong, "frame row count")
        assert(math.abs(s(i)._5 - round6(qc(frame, 0.5))) < 1e-9,
          s"median mismatch at ${s(i)._2}")
        assert(math.abs(s(i)._6 - round6(qc(frame, 0.9))) < 1e-9,
          s"p90 mismatch at ${s(i)._2}")
        assert(s(i)._6 >= s(i)._5, "p90 >= median")
      }
    }
  }

  test("ts forecast: SES fold replays exactly; metrics well-formed") {
    val rows = q("q_ts_forecast").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    assert(rows.nonEmpty)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hourly = sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val byType = hourly.groupBy(_._1)
    rows.foreach { case (et, nHours, forecast, mae, maeNaive, skill) =>
      val xs = byType(et).sortBy(_._2).map(_._3.toDouble)
      assert(nHours == xs.length.toLong, s"$et n_hours")
      var s = xs.head; var e = 0.0
      xs.tail.foreach { x => e += math.abs(x - s); s = 0.3 * x + 0.7 * s }
      assert(forecast == r6(s), s"$et forecast $forecast != ${r6(s)}")
      assert(mae == r6(e / (xs.length - 1)), s"$et mae")
      val naive = xs.sliding(2).map(p => math.abs(p(1) - p(0))).sum
      assert(maeNaive == r6(naive / (xs.length - 1)), s"$et mae_naive")
      if (naive > 0)
        assert(skill.contains(
          r6((e / (xs.length - 1)) / (naive / (xs.length - 1)))),
          s"$et skill")
      assert(mae >= 0.0 && maeNaive >= 0.0)
    }
  }

  test("walks: keyed-PRF hops replay exactly; every hop is a real edge") {
    val op = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2).sorted.toIndexedSeq }
    def u48(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(6).map("%02x".format(_)).mkString, 16)
    }
    val expected = adj.keys.toSeq.sorted.map { start =>
      var cur = start
      val path = new StringBuilder(cur.toString)
      for (r <- 1 to 4) {
        val nbrs = adj(cur)
        cur = nbrs((u48(s"walk:$start:$r:$cur") % nbrs.length).toInt)
        path ++= s",$cur"
      }
      (start, path.toString, cur)
    }
    val rows = q("q_graph_walks").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty && rows == expected)
    // structural sanity independent of the replay: every consecutive
    // pair in every path is an edge of the graph, and the walk corpus
    // covers every node exactly once as a start
    rows.foreach { case (_, path, end) =>
      val hops = path.split(",").map(_.toLong)
      assert(hops.length == 5 && hops.last == end)
      hops.sliding(2).foreach { case Array(a, b) =>
        assert(edges(math.min(a, b) -> math.max(a, b)), s"non-edge $a->$b")
      }
    }
    assert(rows.map(_._1).distinct.length == adj.size)
    // the PRF must actually branch: not all walks may stay on one
    // neighbor index (else the draw is degenerate)
    assert(rows.map(_._2).distinct.length > 1)
  }
}
