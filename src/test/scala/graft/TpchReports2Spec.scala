package graft

import org.apache.spark.sql.functions._

/** First-principles replays for the second TPC-H wave
  * (TpchReports2.scala: Q3/Q8/Q9/Q12/Q16/Q17/Q19/Q21 shapes). Replays
  * collect the sf0.001 tables driver-side and recompute with exact
  * cents — independent of every Spark aggregate under test.
  */
class TpchReports2Spec extends SparkSpec {

  private def centsOf(d: Double): Long =
    BigDecimal(d * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** (orderkey, partkey, suppkey, qty, extprice, discount, ship_ms). */
  private lazy val lines = sources.Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      unix_millis(col("l_shipdate").cast("timestamp")).as("sm"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getLong(6)))

  private def revC(ep: Double, disc: Double): Long = centsOf(ep * (1.0 - disc))

  /** orderkey -> (custkey, order_ms, status, priority). */
  private lazy val orders = sources.Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_custkey"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("om"),
      col("o_orderstatus"), col("o_orderpriority"))
    .collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3),
      r.getString(4)))).toMap

  /** partkey -> (brand, ptype, size, retailprice, name). */
  private lazy val parts = sources.Tables.part(spark, sf)
    .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice"), col("p_name"))
    .collect()
    .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getInt(3),
      r.getDouble(4), r.getString(5)))).toMap

  private lazy val suppNation = sources.Tables.supplier(spark, sf)
    .select(col("s_suppkey"), col("s_nationkey"))
    .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val custNation = sources.Tables.customer(spark, sf)
    .select(col("c_custkey"), col("c_nationkey"))
    .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val nationName = sources.Tables.nation(spark, sf)
    .select(col("n_nationkey"), col("n_name"))
    .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  private def ms(date: String): Long =
    java.time.LocalDate.parse(date).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli

  private def yearOf(m: Long): Long =
    java.time.Instant.ofEpochMilli(m)
      .atZone(java.time.ZoneOffset.UTC).getYear.toLong

  private val DAY = 86400000L

  test("tpch q3: unshipped-revenue top-10 replays; rank is exact cents") {
    val rows = q("q_tpch_q3").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 10)
    val building = sources.Tables.customer(spark, sf)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val cutoff = ms("1998-03-15")
    val expect = lines.flatMap { case (ok, _, _, _, ep, disc, sm) =>
      orders.get(ok).collect {
        case (ck, om, _, _) if building(ck) && om < cutoff && sm > cutoff =>
          ok -> revC(ep, disc)
      }
    }.groupBy(_._1).map { case (ok, g) => (ok, g.map(_._2).sum) }
      .toSeq.sortBy { case (ok, rc) => (-rc, ok) }.take(10)
    assert(rows.toSeq == expect, "Q3 top-10 must replay")
  }

  test("tpch q8: market share replays; share within [0,1]") {
    val rows = q("q_tpch_q8").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nat, tot, share) =>
      assert(nat >= 0 && nat <= tot && share >= 0.0 && share <= 1.0)
    }
    val asiaNations = sources.Tables.nation(spark, sf)
      .join(sources.Tables.region(spark, sf).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val econ = parts.collect { case (pk, (_, t, _, _, _)) if t == "ECONOMY" => pk }.toSet
    val per = lines.flatMap { case (ok, pk, sk, _, ep, disc, _) =>
      orders.get(ok).collect {
        case (ck, om, _, _) if econ(pk) && asiaNations(custNation(ck)) =>
          (yearOf(om), nationName(suppNation(sk)), revC(ep, disc))
      }
    }
    val expect = per.groupBy(_._1).map { case (yr, g) =>
      val nat = g.collect { case (_, "NATION_2", rc) => rc }.sum
      val tot = g.map(_._3).sum
      (yr, nat, tot)
    }.toSeq.sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq == expect,
      "Q8 nation/total cents must replay")
  }

  test("tpch q9: profit replays under the shared per-row rounding") {
    val rows = q("q_tpch_q9").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val withA = parts.collect {
      case (pk, (_, _, _, rp, nm)) if nm.contains("a") => pk -> rp }.toMap
    val expect = lines.flatMap { case (ok, pk, sk, qty, ep, disc, _) =>
      withA.get(pk).flatMap { rp =>
        orders.get(ok).map { case (_, om, _, _) =>
          val profitC = BigDecimal(
            (ep * (1.0 - disc) - 0.6 * rp * qty) * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          ((nationName(suppNation(sk)), yearOf(om)), profitC)
        }
      }
    }.groupBy(_._1).map { case ((n, yr), g) =>
      (n, yr, g.map(_._2).sum, g.length.toLong) }
      .toSeq.sortBy { case (n, yr, _, _) => (n, -yr) }
    assert(rows.toSeq == expect, "Q9 profit rollup must replay")
  }

  test("tpch q12: late-line priority counts replay") {
    val rows = q("q_tpch_q12").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val lo = ms("1996-01-01"); val hi = ms("1997-01-01")
    val lateLines = lines.flatMap { case (ok, _, _, _, _, _, sm) =>
      orders.get(ok).collect {
        case (_, om, _, prio)
          if sm >= lo && sm < hi && sm > om + 60 * DAY => prio
      }
    }
    // fixture has both statuses in range; recompute per status requires
    // the status column — re-collect the needed slice
    val byStatus = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linestatus"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("sm"))
      .collect()
      .flatMap { r =>
        val ok = r.getLong(0); val st = r.getString(1); val sm = r.getLong(2)
        orders.get(ok).collect {
          case (_, om, _, prio)
            if sm >= lo && sm < hi && sm > om + 60 * DAY => (st, prio)
        }
      }
    val expect = byStatus.groupBy(_._1).map { case (st, g) =>
      val high = g.count(x => x._2 == "1-URGENT" || x._2 == "2-HIGH").toLong
      (st, high, g.length - high)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == expect, "Q12 late counts must replay")
    assert(lateLines.length == byStatus.length)
  }

  test("tpch q16: supplier counts replay; excluded suppliers absent") {
    val rows = q("q_tpch_q16").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 40)
    val bad = sources.Tables.supplier(spark, sf)
      .where(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val sizes = Set(1, 4, 7, 10, 13, 16, 19, 22)
    val expect = lines.map { case (_, pk, sk, _, _, _, _) => (pk, sk) }
      .distinct
      .filterNot { case (_, sk) => bad(sk) }
      .flatMap { case (pk, sk) =>
        parts.get(pk).collect {
          case (b, t, sz, _, _)
            if b != "Brand#3" && t != "PROMO" && sizes(sz) =>
            ((b, t, sz), sk)
        }
      }
      .groupBy(_._1).map { case ((b, t, sz), g) =>
        (b, t, sz, g.map(_._2).distinct.length.toLong) }
      .toSeq.sortBy { case (b, t, sz, n) => (-n, b, t, sz) }.take(40)
    assert(rows.toSeq == expect, "Q16 supplier counts must replay")
  }

  test("tpch q17: small-quantity threshold is the exact cross-multiply") {
    val r = q("q_tpch_q17").collect().head
    val (lost, n) = (r.getLong(0), r.getLong(1))
    val brand3 = parts.collect {
      case (pk, (b, _, _, _, _)) if b == "Brand#3" => pk }.toSet
    val byPart = lines.filter(l => brand3(l._2))
      .groupBy(_._2).map { case (pk, g) =>
        (pk, (g.map(l => centsOf(l._4)).sum, g.length.toLong)) }
    val small = lines.filter { l =>
      brand3(l._2) && {
        val (qtyC, cnt) = byPart(l._2)
        centsOf(l._4) * 5 * cnt < qtyC
      }
    }
    assert(n == small.length.toLong, "small-line count must replay")
    assert(lost == small.map(l => centsOf(l._5)).sum,
      "lost revenue cents must replay")
  }

  test("tpch q19: OR-of-AND groups replay; single scan pass plans") {
    val r = q("q_tpch_q19").collect().head
    val (revc, n) = (r.getLong(0), r.getLong(1))
    def grp(brand: String, szLo: Int, szHi: Int, qLo: Double, qHi: Double) =
      lines.filter { l =>
        parts.get(l._2).exists { case (b, _, sz, _, _) =>
          b == brand && sz >= szLo && sz <= szHi } &&
          l._4 >= qLo && l._4 <= qHi
      }
    val all = (grp("Brand#1", 1, 5, 1, 11) ++ grp("Brand#2", 1, 10, 10, 20) ++
      grp("Brand#3", 1, 15, 20, 30)).distinct
    assert(n == all.length.toLong, "qualifying line count must replay")
    assert(revc == all.map(l => revC(l._5, l._6)).sum, "revenue must replay")
    // one lineitem scan, not three unioned ones
    val plan = q("q_tpch_q19").queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"Q19 must stay one scan pass:\n$plan")
  }

  /** Driver-side replay of the derived partsupp table (one row per
    * shipped (part, supplier) pair; availqty = Σ round(qty); supplycost
    * = deterministic 40–79% of retail in exact integer cents via the
    * md5 draw) — independent of the Spark derivation under test.
    */
  private lazy val partsuppReplay: Map[(Long, Long), (Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(pk: Long, sk: Long): Long = {
      val hex = md.digest(s"ps:${pk}_$sk".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 40
    }
    lines.groupBy(l => (l._2, l._3)).map { case ((pk, sk), g) =>
      val avail = g.map(l => BigDecimal(l._4)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      val retailC = centsOf(parts(pk)._4)
      val costC = retailC * (40 + draw(pk, sk)) / 100
      (pk, sk) -> (avail, costC)
    }
  }

  test("tpch q2: every winner achieves its part's exact minimum cost; replay") {
    val rows = q("q_tpch_q2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 100)
    val eurNations = sources.Tables.nation(spark, sf)
      .join(sources.Tables.region(spark, sf).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val supp = sources.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("s_nationkey"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), centsOf(r.getDouble(2)),
        r.getInt(3)))
      .toMap
    val qualParts = parts.collect {
      case (pk, (brand, "LARGE", sz, _, _)) if sz >= 10 && sz <= 25 =>
        pk -> brand
    }
    val cand = partsuppReplay.toSeq.flatMap { case ((pk, sk), (_, costC)) =>
      qualParts.collect {
        case (qpk, brand) if qpk == pk && eurNations(supp(sk)._3) =>
          (pk, brand, sk, costC)
      }
    }
    val mins = cand.groupBy(_._1).map { case (pk, g) => pk -> g.map(_._4).min }
    val expect = cand.collect {
      case (pk, brand, sk, costC) if costC == mins(pk) =>
        val (name, balC, natKey) = supp(sk)
        (balC, name, nationName(natKey), pk, brand, costC)
    }.sortBy { case (balC, name, _, pk, _, _) => (-balC, pk, name) }.take(100)
    assert(rows.toSeq == expect, "Q2 min-cost supplier set must replay")
  }

  test("tpch q11: survivors clear the scale-free average-value bar; replay") {
    val rows = q("q_tpch_q11").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val eurNations = sources.Tables.nation(spark, sf)
      .join(sources.Tables.region(spark, sf).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val eurSupp = suppNation.collect {
      case (sk, nk) if eurNations(nk) => sk }.toSet
    val perPart = partsuppReplay.toSeq.collect {
      case ((pk, sk), (avail, costC)) if eurSupp(sk) => (pk, costC * avail)
    }.groupBy(_._1).map { case (pk, g) => (pk, g.map(_._2).sum) }.toSeq
    val total = perPart.map(_._2).sum
    val np = perPart.length
    val expect = perPart.filter { case (_, v) => v * np > total }
      .sortBy { case (pk, v) => (-v, pk) }
    assert(rows.toSeq == expect, "Q11 important-stock set must replay")
  }

  test("tpch q20: exactly the suppliers holding excess small-part stock") {
    val rows = q("q_tpch_q20").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val eurNations = sources.Tables.nation(spark, sf)
      .join(sources.Tables.region(spark, sf).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val smallParts = parts.collect {
      case (pk, (_, _, _, _, nm)) if nm.startsWith("small") => pk }.toSet
    val lo = ms("1996-01-01"); val hi = ms("1997-01-01")
    val shipped = lines.collect {
      case (_, pk, sk, qty, _, _, sm) if sm >= lo && sm < hi =>
        ((pk, sk), BigDecimal(qty)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val qualSupp = partsuppReplay.toSeq.collect {
      case ((pk, sk), (avail, _))
        if smallParts(pk) && shipped.get((pk, sk))
          .exists(s => avail * 2 > s * 3) => sk
    }.toSet
    val supp = sources.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("s_nationkey"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), centsOf(r.getDouble(2)),
        r.getInt(3)))
    val expect = supp.collect {
      case (sk, nm, balC, nk) if eurNations(nk) && qualSupp(sk) =>
        (nm, nationName(nk), balC)
    }.sortBy(_._1)
    assert(rows.toSeq == expect.toSeq,
      "Q20 excess-stock supplier set must replay")
  }

  test("tpch q21: only-late-supplier aggregate rewrite replays the EXISTS form") {
    val rows = q("q_tpch_q21").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val suppName = sources.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // textbook EXISTS / NOT EXISTS evaluation, order by order
    val fOrders = lines.flatMap { case (ok, _, sk, _, _, _, sm) =>
      orders.get(ok).collect {
        case (_, om, "F", _) => (ok, sk, sm > om + 90 * DAY)
      }
    }.groupBy(_._1)
    val waits = fOrders.toSeq.flatMap { case (_, g) =>
      val supps = g.map(_._2).distinct
      val lateSupps = g.collect { case (_, sk, true) => sk }.distinct
      g.collect {
        case (_, sk, true)
          if supps.length > 1 && lateSupps.toSeq == Seq(sk) => sk
      }
    }
    val expect = waits.groupBy(identity).map { case (sk, g) =>
      (suppName(sk), g.length.toLong) }
      .toSeq.sortBy { case (nm, n) => (-n, nm) }.take(100)
    assert(rows.toSeq == expect,
      "Q21 aggregate rewrite must equal the EXISTS evaluation")
  }
}
