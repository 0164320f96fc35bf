package graft

import org.apache.spark.sql.functions._

/** First-principles replays + plan-shape pins for the multi-way-join
  * TPC-H classics (TpchReports.scala). Replays collect the sf0.001
  * tables driver-side and recompute with BigDecimal cents — independent
  * of every Spark aggregate under test.
  */
class TpchReportsSpec extends SparkSpec {

  private def centsOf(d: Double): Long =
    BigDecimal(d * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** (orderkey, suppkey, rev_cents, shipdate_ms, returnflag) per line. */
  private lazy val lines = sources.Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_suppkey"),
      col("l_extendedprice"), col("l_discount"),
      unix_millis(col("l_shipdate").cast("timestamp")).as("sm"),
      col("l_returnflag"), col("l_quantity"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1),
      centsOf(r.getDouble(2) * (1.0 - r.getDouble(3))), r.getLong(4),
      r.getString(5), r.getDouble(6)))

  private lazy val orderCust = sources.Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_custkey"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("om"))
    .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  private lazy val custNation = sources.Tables.customer(spark, sf)
    .select(col("c_custkey"), col("c_nationkey"))
    .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val suppNation = sources.Tables.supplier(spark, sf)
    .select(col("s_suppkey"), col("s_nationkey"))
    .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val nationName = sources.Tables.nation(spark, sf)
    .select(col("n_nationkey"), col("n_name"))
    .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  private def ms(date: String): Long =
    java.time.LocalDate.parse(date).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli

  test("tpch q5: cyclic local-supplier revenue replays; dims broadcast") {
    val rows = q("q_tpch_q5").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val plan = q("q_tpch_q5").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension chain must broadcast:\n$plan")
    // first-principles replay of the cyclic join
    val asiaNations = sources.Tables.nation(spark, sf)
      .join(sources.Tables.region(spark, sf)
        .where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val lo = ms("1996-01-01"); val hi = ms("1997-01-01")
    val expect = lines.flatMap { case (ok, sk, rc, _, _, _) =>
      orderCust.get(ok).flatMap { case (ck, om) =>
        val sn = suppNation(sk)
        if (om >= lo && om < hi && asiaNations(sn) &&
          custNation(ck) == sn) Some(nationName(sn) -> rc)
        else None
      }
    }.groupBy(_._1).map { case (n, g) =>
      (n, g.map(_._2).sum, g.length.toLong) }
      .toSeq.sortBy { case (n, rc, _) => (-rc, n) }
    assert(rows.toSeq == expect, "Q5 local-supplier revenue must replay")
  }

  test("tpch q7: direction pairs replay; no same-nation rows") {
    val rows = q("q_tpch_q7").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val corridor = Set("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    rows.foreach { case (sn, cn, _, _, _) =>
      assert(corridor(sn) && corridor(cn) && sn != cn,
        s"row ($sn,$cn) outside the corridor")
    }
    val expect = lines.flatMap { case (ok, sk, rc, sm, _, _) =>
      orderCust.get(ok).flatMap { case (ck, _) =>
        val sn = nationName(suppNation(sk)); val cn = nationName(custNation(ck))
        if (corridor(sn) && corridor(cn) && sn != cn) {
          val yr = java.time.Instant.ofEpochMilli(sm)
            .atZone(java.time.ZoneOffset.UTC).getYear.toLong
          Some(((sn, cn, yr), rc))
        } else None
      }
    }.groupBy(_._1).map { case ((sn, cn, yr), g) =>
      (sn, cn, yr, g.map(_._2).sum, g.length.toLong) }
      .toSeq.sortBy { case (sn, cn, yr, _, _) => (sn, cn, yr) }
    assert(rows.toSeq == expect, "Q7 corridor revenue must replay")
  }

  test("tpch q10: top returned-revenue customers replay; rank is exact") {
    val rows = q("q_tpch_q10").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    val lo = ms("1996-07-01"); val hi = ms("1996-10-01")
    val perCust = lines.flatMap { case (ok, _, rc, _, rf, _) =>
      orderCust.get(ok).flatMap { case (ck, om) =>
        if (rf == "R" && om >= lo && om < hi) Some(ck -> rc) else None
      }
    }.groupBy(_._1).map { case (ck, g) => (ck, g.map(_._2).sum) }.toSeq
    val expect = perCust.sortBy { case (ck, rc) => (-rc, ck) }.take(20)
    assert(rows.toSeq == expect.map { case (ck, rc) => (ck, rc) },
      "Q10 top-20 must replay under the exact-cents rank")
  }

  test("tpch q14: promo share replays; ratio bounded") {
    val r = q("q_tpch_q14").collect().head
    val (promo, total, pct) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    assert(promo >= 0 && promo <= total, "promo revenue within total")
    assert(pct >= 0.0 && pct <= 100.0)
    val promoParts = sources.Tables.part(spark, sf)
      .where(col("p_type").startsWith("PROMO"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val lo = ms("1996-09-01"); val hi = ms("1996-10-01")
    val month = sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("sm"))
      .collect()
      .filter(x => x.getLong(3) >= lo && x.getLong(3) < hi)
      .map(x => (x.getLong(0),
        centsOf(x.getDouble(1) * (1.0 - x.getDouble(2)))))
    assert(total == month.map(_._2).sum, "total cents replay")
    assert(promo == month.filter(x => promoParts(x._1)).map(_._2).sum,
      "promo cents replay")
  }

  test("tpch q18: every survivor clears the quantity bar; set replays") {
    val rows = q("q_tpch_q18").collect()
      .map(r => (r.getLong(2), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (ok, qc) =>
      assert(qc > 30000, s"order $ok at $qc centi-units under the bar") }
    val expect = lines.groupBy(_._1).map { case (ok, g) =>
      (ok, g.map(x => centsOf(x._6)).sum) }
      .filter(_._2 > 30000).toSeq
      .sortBy { case (ok, qc) => (-qc, ok) }.take(100)
    assert(rows.toSeq == expect, "Q18 survivor set must replay")
  }

  test("tpch q15: winners achieve exactly the max quarter revenue") {
    val rows = q("q_tpch_q15").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.nonEmpty)
    val lo = ms("1996-01-01"); val hi = ms("1996-04-01")
    // quarter filter is on the SHIP date of each line
    val bySupp = lines.collect {
      case (_, sk, rc, sm, _, _) if sm >= lo && sm < hi => (sk, rc)
    }.groupBy(_._1).map { case (sk, g) => (sk, g.map(_._2).sum) }
    val maxRev = bySupp.values.max
    val expect = bySupp.filter(_._2 == maxRev).toSeq.sortBy(_._1)
    assert(rows.toSeq == expect, "Q15 winner set must replay")
  }

  test("tpch q22: prospects have above-avg balance and no recent orders") {
    val rows = q("q_tpch_q22").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val cust = sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), centsOf(r.getDouble(2))))
    val pos = cust.filter(_._3 > 0)
    val avgC = pos.map(_._3).sum.toDouble / pos.length
    val recent = sources.Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val expect = cust
      .filter(c => c._3.toDouble > avgC && !recent(c._1))
      .groupBy(_._2).map { case (seg, g) =>
        (seg, g.length.toLong, g.map(_._3).sum) }
      .toSeq.sortBy(_._1)
    assert(rows.toSeq == expect, "Q22 prospect rollup must replay")
  }
}
