package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.QueryDef
import graft.sources.Tables

/** Composed analytic pipelines (SURVEY §5: "TPC-H-style query shapes are
  * natural declared queries") — multi-join + aggregate + top-k chains that
  * exercise the operator families together the way a real workload does.
  *
  * Plan shapes to note at scale: the dimension chain
  * (region→nation→customer) broadcasts into the fact joins; revenue
  * aggregations are partial+final on the join output; top-k never global
  * sorts. These are the query shapes AQE's join re-planning and skew
  * handling exist for.
  */
object Analytics {

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q3 shape: top-10 open orders of one segment by revenue.
    QueryDef(
      "q_top_orders_by_revenue",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        val li = Tables.lineitem(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(round(sum(revenue), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
          |GROUP BY l_orderkey, o_orderdate
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    ),

    // TPC-H Q5 shape: revenue by nation through the full dimension chain.
    QueryDef(
      "q_revenue_by_nation",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        // two-level aggregate instead of sum + countDistinct in one agg:
        // mixed distinct/non-distinct aggregation plans through
        // ExpandExec, which doubles every join-output row through the
        // shuffle. Pre-aggregating on (r, n, o_orderkey) shuffles one
        // row per order (map-side partial against the join), and the
        // final count of per-order groups IS the distinct order count.
        // Revenue flows as exact decimal(18,4) so the changed fold
        // order can't move a .005 rounding tie (sum of 4dp decimals is
        // fold-order-free; a double sum is not).
        // ...and the rollup happens BEFORE any dimension join: the
        // per-order aggregate shuffles 600k narrow (orderkey, decimal)
        // rows with map-side partials; the dimension chain then joins
        // one row per order instead of one per line item
        li.groupBy(col("l_orderkey"))
          .agg(sum(revenue.cast("decimal(18,4)")).as("rev_o"))
          .join(o, col("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("rev_o")), 2).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some(
        """WITH per_order AS (
          |  SELECT r_name, n_name, o_orderkey,
          |         sum(CAST(l_extendedprice * (1.0 - l_discount)
          |                  AS DECIMAL(18,4))) AS rev_o
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  GROUP BY 1, 2, 3)
          |SELECT r_name, n_name,
          |       CAST(round(sum(rev_o), 2) AS DOUBLE) AS revenue,
          |       count(*) AS n_orders
          |FROM per_order GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Time-bucketed revenue rollup (monthly business report shape).
    QueryDef(
      "q_revenue_by_month",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(
            // exact cents (order-independent at any month size)
            sum(round(revenue * 100).cast("long")).as("revenue_c"),
            round(avg(col("l_discount")), 6).as("avg_discount"),
            count(lit(1)).as("n_items"))
          .orderBy(col("month"))
      },
      Some(
        """SELECT date_trunc('month', o_orderdate) AS month,
          |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
          |         * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
          |       round(avg(l_discount), 6) AS avg_discount,
          |       count(*) AS n_items
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Per-customer lifetime-value panel: multi-agg + date arithmetic over
    // an outer join (customers with no orders keep zero rows).
    QueryDef(
      "q_customer_ltv",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"), col("c_mktsegment"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("lifetime_value"),
            min(col("o_orderdate")).cast("date").as("first_order"),
            max(col("o_orderdate")).cast("date").as("last_order"),
            datediff(max(to_date(col("o_orderdate"))), min(to_date(col("o_orderdate"))))
              .cast(LongType).as("active_days"))
          .orderBy(col("c_custkey"))
      },
      Some(
        """SELECT c_custkey, c_mktsegment,
          |       count(o_orderkey) AS n_orders,
          |       round(coalesce(sum(o_totalprice), 0.0), 2) AS lifetime_value,
          |       CAST(min(o_orderdate) AS DATE) AS first_order,
          |       CAST(max(o_orderdate) AS DATE) AS last_order,
          |       date_diff('day', CAST(min(o_orderdate) AS DATE),
          |                 CAST(max(o_orderdate) AS DATE)) AS active_days
          |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin)
    ),

    // Ordered funnel conversion (view → click → purchase): the event-
    // analytics shape where ORDER matters, not just presence. Three
    // chained running-min windows over ONE per-user partition (a single
    // shuffle; each pass is a streaming frame over the sorted run):
    // rv = earliest view so far; rc = earliest click at-or-after a
    // view; rp = earliest purchase at-or-after such a click. Ties
    // broken by (ts, event_id) identically on both engines. Scale: one
    // hash exchange on user_id, state per row is three longs — the
    // same plan at 100 TB with users spread across executors.
    QueryDef(
      "q_funnel",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("rv",
            min(when(col("event_type") === "view", col("ts_us"))).over(w))
          .withColumn("rc",
            min(when(col("event_type") === "click" && col("rv").isNotNull,
              col("ts_us"))).over(w))
          .withColumn("rp",
            min(when(col("event_type") === "purchase" && col("rc").isNotNull,
              col("ts_us"))).over(w))
        e.groupBy(col("user_id"))
          .agg(min(col("rv")).as("first_view_us"),
            min(col("rc")).as("first_click_us"),
            min(col("rp")).as("first_purchase_us"))
          .select(col("user_id"), col("first_view_us"),
            col("first_click_us"), col("first_purchase_us"),
            (when(col("first_purchase_us").isNotNull, 3L)
              .when(col("first_click_us").isNotNull, 2L)
              .when(col("first_view_us").isNotNull, 1L)
              .otherwise(0L)).as("funnel_stage"))
          .orderBy(col("user_id"))
      },
      Some(
        """WITH st AS (
          |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
          |  FROM events),
          |w1 AS (
          |  SELECT *,
          |    min(CASE WHEN event_type = 'view' THEN ts_us END)
          |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          |            ROWS UNBOUNDED PRECEDING) AS rv
          |  FROM st),
          |w2 AS (
          |  SELECT *,
          |    min(CASE WHEN event_type = 'click' AND rv IS NOT NULL
          |             THEN ts_us END)
          |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          |            ROWS UNBOUNDED PRECEDING) AS rc
          |  FROM w1),
          |w3 AS (
          |  SELECT *,
          |    min(CASE WHEN event_type = 'purchase' AND rc IS NOT NULL
          |             THEN ts_us END)
          |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          |            ROWS UNBOUNDED PRECEDING) AS rp
          |  FROM w2)
          |SELECT user_id,
          |       min(rv) AS first_view_us,
          |       min(rc) AS first_click_us,
          |       min(rp) AS first_purchase_us,
          |       CAST(CASE WHEN min(rp) IS NOT NULL THEN 3
          |                 WHEN min(rc) IS NOT NULL THEN 2
          |                 WHEN min(rv) IS NOT NULL THEN 1
          |                 ELSE 0 END AS BIGINT) AS funnel_stage
          |FROM w3 GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // SCD type-2 history build: the warehouse-dimension shape — collapse
    // an event feed into attribute VALIDITY INTERVALS (change detection
    // via lag ≠, then valid_to = next change's valid_from). Complements
    // q_replay_upsert (latest-wins = SCD1): here history is retained.
    // One per-user partition carries both window passes — a single
    // shuffle; intervals are exact integers (epoch µs), no floats
    // anywhere. is_current flags the open interval.
    QueryDef(
      "q_scd2_history",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wo = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val changes = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(wo))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        changes
          .withColumn("valid_to_us", lead(col("ts_us"), 1).over(wo))
          .select(col("user_id"), col("event_type").as("state"),
            col("ts_us").as("valid_from_us"), col("valid_to_us"),
            col("valid_to_us").isNull.as("is_current"))
          .orderBy(col("user_id"), col("valid_from_us"))
      },
      Some(
        """WITH st AS (
          |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
          |         lag(event_type) OVER (PARTITION BY user_id
          |           ORDER BY epoch_us(ts), event_id) AS prev_type
          |  FROM events),
          |ch AS (
          |  SELECT user_id, event_id, event_type, ts_us
          |  FROM st WHERE prev_type IS NULL OR prev_type <> event_type)
          |SELECT user_id, event_type AS state, ts_us AS valid_from_us,
          |       lead(ts_us) OVER (PARTITION BY user_id
          |         ORDER BY ts_us, event_id) AS valid_to_us,
          |       lead(ts_us) OVER (PARTITION BY user_id
          |         ORDER BY ts_us, event_id) IS NULL AS is_current
          |FROM ch ORDER BY user_id, valid_from_us""".stripMargin)
    ),

    // Cohort retention matrix: users grouped by signup week, activity
    // counted per weeks-since-signup — the growth-analytics staple.
    // Both engines truncate weeks to Monday; week distance is exact
    // integer day arithmetic on the truncated dates. Distinct users
    // per (cohort, offset) goes through a pre-aggregate on (cohort,
    // offset, user) — partial-combined, no ExpandExec — then a plain
    // count (the q_revenue_by_nation lesson). Scale: one shuffle per
    // user for cohorts, one join of events to the per-user cohort
    // (shuffle on user_id), one bounded rollup.
    QueryDef(
      "q_retention_cohorts",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
        val cohorts = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
        e.join(cohorts, "user_id")
          .filter(col("wk") >= col("cohort_week"))
          .withColumn("weeks_since",
            (datediff(col("wk"), col("cohort_week")) / 7).cast(LongType))
          .groupBy(col("cohort_week"), col("weeks_since"), col("user_id")).agg(count(lit(1)).as("_n"))
          .groupBy(col("cohort_week"), col("weeks_since"))
          .agg(count(lit(1)).as("n_active_users"))
          .orderBy(col("cohort_week"), col("weeks_since"))
      },
      Some(
        """WITH e AS (
          |  SELECT user_id, event_type,
          |         CAST(date_trunc('week', ts) AS DATE) AS wk
          |  FROM events),
          |cohorts AS (
          |  SELECT user_id, min(wk) AS cohort_week
          |  FROM e WHERE event_type = 'signup' GROUP BY user_id)
          |SELECT cohort_week,
          |       date_diff('day', cohort_week, wk) // 7 AS weeks_since,
          |       count(DISTINCT e.user_id) AS n_active_users
          |FROM e JOIN cohorts ON e.user_id = cohorts.user_id
          |WHERE wk >= cohort_week
          |GROUP BY cohort_week, weeks_since
          |ORDER BY cohort_week, weeks_since""".stripMargin)
    ),

    // Batch sessionization (gaps-and-islands): split each user's event
    // stream at >2h inactivity gaps, then roll sessions up to a per-user
    // engagement summary. The batch complement of q_stream_session — the
    // same semantics the merging session-window state store computes
    // incrementally, here as one declarative plan over the full history.
    //
    // Scale shape: ONE hash exchange on user_id feeds the gap window,
    // the (user, session) aggregate AND the per-user rollup — both
    // group-bys cluster on a superset of the partitioning key, so
    // Catalyst reuses the exchange (plan-audited). All arithmetic stays
    // in integer µs; no double is ever compared.
    QueryDef(
      "q_sessionize",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val gapUs = 2L * 3600L * 1000000L
        val sessions = e
          .withColumn("brk",
            when(col("us") - lag(col("us"), 1).over(w) > gapUs ||
              lag(col("us"), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)))
          .withColumn("sess",
            sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy(col("user_id"), col("sess"))
          .agg(count(lit(1)).as("n_ev"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
        sessions.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_ev")).as("n_events"),
            max(col("n_ev")).as("max_session_events"),
            sum(col("dur_us")).as("total_active_us"),
            max(col("dur_us")).as("longest_session_us"))
          .orderBy(col("user_id"))
      },
      Some(
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
          |marked AS (
          |  SELECT user_id, us, event_id,
          |         CASE WHEN us - lag(us) OVER w > 7200000000
          |                OR lag(us) OVER w IS NULL
          |              THEN 1 ELSE 0 END AS brk
          |  FROM e
          |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
          |numbered AS (
          |  SELECT user_id, us,
          |         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
          |                        ROWS BETWEEN UNBOUNDED PRECEDING
          |                        AND CURRENT ROW) AS sess
          |  FROM marked),
          |sessions AS (
          |  SELECT user_id, sess, count(*) AS n_ev,
          |         max(us) - min(us) AS dur_us
          |  FROM numbered GROUP BY user_id, sess)
          |SELECT user_id, count(*) AS n_sessions,
          |       CAST(sum(n_ev) AS BIGINT) AS n_events,
          |       max(n_ev) AS max_session_events,
          |       CAST(sum(dur_us) AS BIGINT) AS total_active_us,
          |       max(dur_us) AS longest_session_us
          |FROM sessions GROUP BY user_id
          |ORDER BY user_id""".stripMargin)
    ),

    // Market-basket co-occurrence mining: which part pairs ship together
    // in the same order, scored by lift against each part's standalone
    // basket frequency — the item-item affinity shape behind co-purchase
    // recommendations, as pure joins + aggregates.
    //
    // Scale shape: pair generation is a SELF-JOIN ON THE BASKET KEY, so
    // work per order is basket² — bounded by the basket-size cap (100),
    // which is the df-cap discipline from n-gram dedup applied to
    // baskets: one pathological mega-order cannot square the join. The
    // distinct, the cap filter, and the self-join all cluster on
    // l_orderkey (one exchange, reused); part frequencies join in by
    // l_partkey (AQE broadcasts the small side at this SF). The lift
    // numerator/denominator stay in exact BIGINT products; the single
    // double division is rounded to 6 dp on both engines BEFORE the
    // rank-order compare (rounded-before-rank, as in BM25).
    QueryDef(
      "q_market_basket",
      (s, dir) => {
        val b = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val sized = b.groupBy(col("ok"))
          .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= 100)
        val bb = b.join(sized, "ok")
        // basket count rides the plan as a 1-row broadcast crossJoin
        // (no separate driver job for one scalar)
        val nBaskets = sized.agg(count(lit(1)).as("nb"))
        val partCnt = bb.groupBy(col("pk")).agg(count(lit(1)).as("pc"))
        val pairs = bb.select(col("ok"), col("pk").as("pa"))
          .join(bb.select(col("ok"), col("pk").as("pb")), "ok")
          .filter(col("pa") < col("pb"))
          .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("support"))
        pairs
          .join(partCnt.select(col("pk").as("pa"), col("pc").as("ca")), "pa")
          .join(partCnt.select(col("pk").as("pb"), col("pc").as("cb")), "pb")
          .crossJoin(broadcast(nBaskets))
          .select(col("pa"), col("pb"), col("support"),
            round((col("support") * col("nb")).cast(DoubleType) /
              (col("ca") * col("cb")), 6).as("lift"))
          .orderBy(col("support").desc, col("lift").desc, col("pa"),
            col("pb"))
          .limit(50)
      },
      Some(
        """WITH b AS (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem),
          |sized AS (
          |  SELECT ok, count(*) AS bsz FROM b GROUP BY ok
          |  HAVING count(*) <= 100),
          |bb AS (SELECT b.ok, b.pk FROM b JOIN sized USING (ok)),
          |nb AS (SELECT count(*) AS n FROM sized),
          |pc AS (SELECT pk, count(*) AS pc FROM bb GROUP BY pk),
          |pairs AS (
          |  SELECT a.pk AS pa, c.pk AS pb, count(*) AS support
          |  FROM bb a JOIN bb c ON a.ok = c.ok AND a.pk < c.pk
          |  GROUP BY 1, 2)
          |SELECT pa, pb, support,
          |       round(CAST(support * nb.n AS DOUBLE) / (ca.pc * cb.pc),
          |             6) AS lift
          |FROM pairs
          |JOIN pc ca ON pairs.pa = ca.pk
          |JOIN pc cb ON pairs.pb = cb.pk
          |CROSS JOIN nb
          |ORDER BY support DESC, lift DESC, pa, pb
          |LIMIT 50""".stripMargin)
    ),

    // Interval overlap join: which user sessions (2h-gap, as in
    // q_sessionize) overlap which per-type "busy windows" (maximal runs
    // of hours where a type's event count exceeds 1.1× its hourly
    // average). Overlap microseconds are exact BIGINT arithmetic.
    //
    // Scale shape: the overlap theta-join is rewritten as an EQUI-JOIN
    // ON THE HOUR CELL — both interval sets explode into the hour cells
    // they cover and join per cell, so neither side is ever broadcast
    // and the work is Σ per-cell |sessions|×|windows|, not |A|×|B|.
    // Each overlapping pair is emitted ONCE, at the latest of the two
    // first-cells (`hr === greatest(s_hr0, w_hr0)` — the smallest
    // shared cell of two contiguous cell ranges; the round-7 emit-once
    // discipline, stateless, no post-join distinct). Because windows
    // are hour-aligned, cell sharing is exactly equivalent to the
    // closed-interval overlap predicate — the oracle proves that by
    // running the plain theta join. Sessionization and the busy-hour
    // grid both stay partitioned on their keys (user / event_type);
    // the grid is collapsed FIRST so all window math is grid-sized.
    QueryDef(
      "q_join_interval",
      (s, dir) => {
        val HrUs = 3600000000L
        val e = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("event_type"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val gapUs = 2L * 3600L * 1000000L
        val sessions = e
          .withColumn("brk",
            when(col("us") - lag(col("us"), 1).over(w) > gapUs ||
              lag(col("us"), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)))
          .withColumn("sess",
            sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy(col("user_id"), col("sess"))
          .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        val grid = e.groupBy(col("event_type"),
            expr(s"us DIV $HrUs").as("hr"))
          .agg(count(lit(1)).as("c"))
        val tot = grid.groupBy(col("event_type"))
          .agg(sum(col("c")).as("total"), count(lit(1)).as("nh"))
        val busy = grid.join(tot, "event_type")
          .where(col("c") * col("nh") * lit(10L) > col("total") * lit(11L))
          .select(col("event_type"), col("hr"))
        val bw = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        val wins = busy
          .withColumn("brk",
            when(col("hr") - lag(col("hr"), 1).over(bw) > 1 ||
              lag(col("hr"), 1).over(bw).isNull, lit(1L)).otherwise(lit(0L)))
          .withColumn("run",
            sum(col("brk")).over(bw.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy(col("event_type"), col("run"))
          .agg((min(col("hr")) * HrUs).as("ws_us"),
            ((max(col("hr")) + 1) * HrUs).as("we_us"))
        val sCells = sessions
          .withColumn("s_hr0", expr(s"s_us DIV $HrUs"))
          .withColumn("hr",
            explode(sequence(col("s_hr0"), expr(s"e_us DIV $HrUs"))))
        val wCells = wins
          .withColumn("w_hr0", expr(s"ws_us DIV $HrUs"))
          .withColumn("hr",
            explode(sequence(col("w_hr0"), expr(s"we_us DIV $HrUs") - 1)))
        sCells.join(wCells, "hr")
          .where(col("hr") === greatest(col("s_hr0"), col("w_hr0")))
          .select(col("user_id"), col("event_type"),
            (least(col("e_us"), col("we_us")) -
              greatest(col("s_us"), col("ws_us"))).as("ov"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_hits"),
            countDistinct(col("event_type")).as("n_busy_types"),
            sum(col("ov")).as("total_overlap_us"),
            max(col("ov")).as("max_overlap_us"))
          .orderBy(col("user_id"))
      },
      Some(
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
          |  FROM events),
          |marked AS (
          |  SELECT user_id, us, event_id,
          |         CASE WHEN us - lag(us) OVER w > 7200000000
          |                OR lag(us) OVER w IS NULL
          |              THEN 1 ELSE 0 END AS brk
          |  FROM e
          |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
          |numbered AS (
          |  SELECT user_id, us,
          |         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
          |                        ROWS BETWEEN UNBOUNDED PRECEDING
          |                        AND CURRENT ROW) AS sess
          |  FROM marked),
          |sessions AS (
          |  SELECT user_id, sess, min(us) AS s_us, max(us) AS e_us
          |  FROM numbered GROUP BY user_id, sess),
          |grid AS (
          |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
          |         count(*) AS c
          |  FROM events GROUP BY 1, 2),
          |tot AS (
          |  SELECT event_type, sum(c) AS total, count(*) AS nh
          |  FROM grid GROUP BY 1),
          |busy AS (
          |  SELECT g.event_type, g.hr
          |  FROM grid g JOIN tot t USING (event_type)
          |  WHERE g.c * t.nh * 10 > t.total * 11),
          |bmarked AS (
          |  SELECT event_type, hr,
          |         CASE WHEN hr - lag(hr) OVER bw > 1
          |                OR lag(hr) OVER bw IS NULL
          |              THEN 1 ELSE 0 END AS brk
          |  FROM busy
          |  WINDOW bw AS (PARTITION BY event_type ORDER BY hr)),
          |bnum AS (
          |  SELECT event_type, hr,
          |         sum(brk) OVER (PARTITION BY event_type ORDER BY hr
          |                        ROWS BETWEEN UNBOUNDED PRECEDING
          |                        AND CURRENT ROW) AS run
          |  FROM bmarked),
          |wins AS (
          |  SELECT event_type, run,
          |         min(hr) * 3600000000 AS ws_us,
          |         (max(hr) + 1) * 3600000000 AS we_us
          |  FROM bnum GROUP BY 1, 2),
          |hits AS (
          |  SELECT s.user_id, w.event_type,
          |         least(s.e_us, w.we_us) - greatest(s.s_us, w.ws_us) AS ov
          |  FROM sessions s JOIN wins w
          |    ON s.s_us < w.we_us AND s.e_us >= w.ws_us)
          |SELECT user_id, count(*) AS n_hits,
          |       count(DISTINCT event_type) AS n_busy_types,
          |       CAST(sum(ov) AS BIGINT) AS total_overlap_us,
          |       max(ov) AS max_overlap_us
          |FROM hits GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // Revenue CONCENTRATION per nation — the Gini coefficient of
    // customer revenue: G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over the
    // ascending-sorted per-customer cent totals (exact BIGINT money
    // via the cents discipline; rank·cents products are exact
    // integers too, so BOTH least-squares-style sums are
    // order-independent and the one shared double expression makes
    // the 6 dp compare exact). The inequality/concentration metric a
    // marketplace tracks per region ("is demand a few whales?") and a
    // curation pipeline tracks per source.
    //
    // Scale shape: per-customer cents is a map-combined aggregate;
    // the rank window partitions by NATION (never global); the final
    // aggregate is nation-sized.
    QueryDef(
      "q_agg_gini",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rev = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(round(col("o_totalprice") * 100)
            .cast(org.apache.spark.sql.types.LongType)).as("rev_c"))
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
        val nat = Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))
        val w = Window.partitionBy(col("n_name"))
          .orderBy(col("rev_c"), col("o_custkey"))
        rev
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .withColumn("i", row_number().over(w)
            .cast(org.apache.spark.sql.types.LongType))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            sum(col("rev_c")).as("sx"),
            sum(col("i") * col("rev_c")).as("si"))
          .select(col("n_name"), col("n_cust"), col("sx").as("revenue_c"),
            round((lit(2.0) * col("si").cast("double")) /
              (col("n_cust").cast("double") * col("sx").cast("double")) -
              ((col("n_cust") + 1).cast("double") /
                col("n_cust").cast("double")), 6).as("gini"))
          .orderBy(col("n_name"))
      },
      Some(
        """WITH rev AS (
          |  SELECT o_custkey,
          |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |           AS BIGINT) AS rev_c
          |  FROM orders GROUP BY o_custkey),
          |j AS (
          |  SELECT n.n_name, r.o_custkey, r.rev_c,
          |         CAST(row_number() OVER (PARTITION BY n.n_name
          |           ORDER BY r.rev_c, r.o_custkey) AS BIGINT) AS i
          |  FROM rev r
          |  JOIN customer c ON c.c_custkey = r.o_custkey
          |  JOIN nation n ON n.n_nationkey = c.c_nationkey)
          |SELECT n_name, count(*) AS n_cust,
          |       CAST(sum(rev_c) AS BIGINT) AS revenue_c,
          |       round((2.0 * CAST(CAST(sum(i * rev_c) AS BIGINT) AS DOUBLE))
          |             / (CAST(count(*) AS DOUBLE)
          |                * CAST(CAST(sum(rev_c) AS BIGINT) AS DOUBLE))
          |             - (CAST(count(*) + 1 AS DOUBLE)
          |                / CAST(count(*) AS DOUBLE)), 6) AS gini
          |FROM j GROUP BY n_name ORDER BY n_name""".stripMargin)
    ),

    // Event TRANSITION MATRIX (the Markov/Sankey view of user flows —
    // q_funnel checks ONE fixed sequence; this measures every
    // adjacent-pair flow): per-user event streams ordered by the total
    // order (ts, event_id), each adjacent pair counted into a
    // (from, to) matrix with the row-conditional transition
    // probability. Counts are exact integers; the probability is one
    // shared division, rounded 6 dp.
    //
    // Scale shape: ONE user_id exchange feeds the lag window (per-user
    // partitions, never global); the matrix aggregate is map-combined
    // to |types|² rows; the row totals attach by a window over that
    // tiny matrix, not the fact table.
    QueryDef(
      "q_event_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("to_type"))
          .withColumn("from_type", lag(col("to_type"), 1).over(w))
          .where(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val wr = Window.partitionBy(col("from_type"))
        pairs
          .withColumn("row_total", sum(col("n")).over(wr))
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("n").cast("double") / col("row_total"), 6)
              .as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some(
        """WITH seq AS (
          |  SELECT event_type AS to_type,
          |         lag(event_type) OVER (PARTITION BY user_id
          |           ORDER BY ts, event_id) AS from_type
          |  FROM events),
          |m AS (
          |  SELECT from_type, to_type, count(*) AS n
          |  FROM seq WHERE from_type IS NOT NULL
          |  GROUP BY 1, 2)
          |SELECT from_type, to_type, n,
          |       round(CAST(n AS DOUBLE) /
          |         sum(n) OVER (PARTITION BY from_type), 6) AS p
          |FROM m ORDER BY from_type, to_type""".stripMargin)
    ),

    // TPC-H Q1 (pricing summary report) — the canonical warehouse
    // query, included verbatim-semantics so a reference user's
    // standard analytics run unchanged. The money columns use the
    // EXACT-CENTS discipline (per-line amounts rounded to cents, then
    // summed as BIGINTs): order-independent, so the hash compare
    // doesn't ride on float-summation luck at any scale — the same
    // fix the snapshot/CDC family uses. One map-combined aggregate
    // over the filtered scan (predicate pushed to parquet).
    QueryDef(
      "q_tpch_q1",
      (s, dir) => {
        def cents(c: org.apache.spark.sql.Column) =
          sum(round(c * 100).cast(org.apache.spark.sql.types.LongType))
        val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val charge = (col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))) * (lit(1.0) + col("l_tax"))
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            cents(col("l_quantity")).as("sum_qty_c"),
            cents(col("l_extendedprice")).as("sum_base_c"),
            cents(disc).as("sum_disc_c"),
            cents(charge).as("sum_charge_c"),
            count(lit(1)).as("count_order"))
          .select(col("l_returnflag"), col("l_linestatus"),
            col("sum_qty_c"), col("sum_base_c"), col("sum_disc_c"),
            col("sum_charge_c"),
            round((col("sum_qty_c").cast("double") / 100) /
              col("count_order"), 6).as("avg_qty"),
            round((col("sum_base_c").cast("double") / 100) /
              col("count_order"), 6).as("avg_price"),
            col("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
          |    AS sum_qty_c,
          |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          |    AS sum_base_c,
          |  CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100)
          |    AS BIGINT)) AS BIGINT) AS sum_disc_c,
          |  CAST(sum(CAST(round(((l_extendedprice * (1.0 - l_discount))
          |    * (1.0 + l_tax)) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
          |  round((CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
          |    AS BIGINT) AS DOUBLE) / 100) / count(*), 6) AS avg_qty,
          |  round((CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |    AS BIGINT) AS DOUBLE) / 100) / count(*), 6) AS avg_price,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // TPC-H Q4 shape (order priority checking) — orders in one quarter
    // that had at least one LATE shipment (shipdate > orderdate +
    // 90 days; the fixture's slim lineitem lacks commit/receipt dates,
    // so lateness is defined against the order date), counted by
    // priority. The EXISTS is a LEFT SEMI join — the decorrelated
    // plan Spark's planner and a warehouse both choose; the date
    // filter pushes to the orders scan.
    QueryDef(
      "q_tpch_q4",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val late = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_shipdate"))
        o.join(late,
            o("o_orderkey") === late("l_orderkey") &&
              late("l_shipdate") > o("o_orderdate") +
                expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders o
          |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
          |  AND EXISTS (
          |    SELECT 1 FROM lineitem l
          |    WHERE l.l_orderkey = o.o_orderkey
          |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    // TPC-H Q13 (customer distribution) — how many customers placed
    // 0, 1, 2… orders: LEFT OUTER from the customer dim so silent
    // customers count, then the double aggregation (orders per
    // customer → customers per order-count). All counts exact; the
    // canonical two-level aggregate a warehouse runs for engagement
    // histograms.
    QueryDef(
      "q_tpch_q13",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_custkey"))
        val o = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some(
        """SELECT c_count, count(*) AS custdist
          |FROM (
          |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          |  FROM customer c LEFT JOIN orders o
          |    ON o.o_custkey = c.c_custkey
          |  GROUP BY c.c_custkey)
          |GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin)
    ),

    // TPC-H Q6 (forecasting revenue change) — the canonical
    // scan-filter-aggregate: one pushed-down filtered scan, one
    // map-combined global sum; revenue in exact cents like Q1.
    QueryDef(
      "q_tpch_q6",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(
            sum(round((col("l_extendedprice") * col("l_discount")) * 100)
              .cast(org.apache.spark.sql.types.LongType))
              .as("revenue_c"),
            count(lit(1)).as("n"))
      },
      Some(
        """SELECT CAST(sum(CAST(round((l_extendedprice * l_discount) * 100)
          |         AS BIGINT)) AS BIGINT) AS revenue_c,
          |       count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount >= 0.05 AND l_discount <= 0.07
          |  AND l_quantity < 24""".stripMargin)
    ),

    // SPATIAL radius join via grid-cell bucketing — the standard
    // decomposition every distributed spatial engine uses (bin points
    // into cells sized to the radius, join on cell, refine exactly):
    // candidates meet ONLY inside a shared cell, so the join is a hash
    // equi-join on the cell key, never a distance theta-join. Each
    // center covers its 3×3 cell neighborhood (a point within r of a
    // center cannot sit farther than one cell away when the cell edge
    // equals r), so per-center candidate volume is 9 cells × density —
    // independent of the domain size, linear in the point count.
    //
    // Coordinates are md5-derived integers on a 1000×1000 grid (the
    // cross-engine deterministic draw, as q_mix_temperature) and the
    // refine predicate is EXACT integer arithmetic (dx² + dy² ≤ r²) —
    // no floats anywhere, so the result is hash-stable by
    // construction. Euclidean-on-flat-grid is the honest exemplar:
    // haversine refines identically in shape but sin/cos are not
    // correctly-rounded cross-engine (the documented reason this
    // fixture stays integer).
    QueryDef(
      "q_join_spatial",
      (s, dir) => {
        val r = 50L
        def coord(salt: String, id: org.apache.spark.sql.Column) =
          pmod(conv(substring(md5(concat(lit(salt), id.cast("string"))),
            1, 6), 16, 10).cast(LongType), lit(1000L))
        val pts = Tables.events(s, dir)
          .select(col("event_id"),
            coord("px:", col("event_id")).as("x"),
            coord("py:", col("event_id")).as("y"))
          .withColumn("cell",
            expr(s"(x div $r) * 1024 + (y div $r)"))
        val centers = s.range(20)
          .select(col("id").as("center_id"),
            coord("cx:", col("id")).as("cx"),
            coord("cy:", col("id")).as("cy"))
        // each center expands to its 9 covering cells; the join is a
        // plain hash equi-join on the cell id
        val covered = centers.select(col("center_id"), col("cx"), col("cy"),
          explode(expr(
            s"""flatten(transform(sequence(-1, 1), dx ->
               |  transform(sequence(-1, 1), dy ->
               |    (cx div $r + dx) * 1024 + (cy div $r + dy))))"""
              .stripMargin.replaceAll("\n", " "))).as("cell"))
        pts.join(covered, "cell")
          .filter(
            (col("x") - col("cx")) * (col("x") - col("cx")) +
              (col("y") - col("cy")) * (col("y") - col("cy")) <= r * r)
          .groupBy(col("center_id"))
          .agg(count(lit(1)).as("n_within"),
            min((col("x") - col("cx")) * (col("x") - col("cx")) +
              (col("y") - col("cy")) * (col("y") - col("cy")))
              .as("min_d2"),
            sum((col("x") - col("cx")) * (col("x") - col("cx")) +
              (col("y") - col("cy")) * (col("y") - col("cy")))
              .as("sum_d2"))
          .orderBy(col("center_id"))
      },
      Some(
        """WITH pts AS (
          |  SELECT event_id,
          |         CAST(('0x' || substr(md5('px:' ||
          |             CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS x,
          |         CAST(('0x' || substr(md5('py:' ||
          |             CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS y
          |  FROM events),
          |centers AS (
          |  SELECT i AS center_id,
          |         CAST(('0x' || substr(md5('cx:' ||
          |             CAST(i AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS cx,
          |         CAST(('0x' || substr(md5('cy:' ||
          |             CAST(i AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS cy
          |  FROM range(20) t(i)),
          |hits AS (
          |  SELECT c.center_id,
          |         (p.x - c.cx) * (p.x - c.cx) +
          |         (p.y - c.cy) * (p.y - c.cy) AS d2
          |  FROM pts p JOIN centers c
          |    ON (p.x - c.cx) * (p.x - c.cx) +
          |       (p.y - c.cy) * (p.y - c.cy) <= 2500)
          |SELECT center_id, count(*) AS n_within,
          |       CAST(min(d2) AS BIGINT) AS min_d2,
          |       CAST(sum(d2) AS BIGINT) AS sum_d2
          |FROM hits GROUP BY center_id ORDER BY center_id""".stripMargin)
    ),

    // Spatial k-NEAREST-NEIGHBOR via the same cell decomposition: per
    // center, the 5 nearest points by exact integer distance², found
    // inside the 5×5 ring of radius-sized cells (guarantee radius 2r:
    // any point within 2r of a center sits within ±2 cells). The ring
    // bound makes grid kNN exhaustive-by-contract: exact whenever the
    // k-th neighbor lies within 2r — the spec measures the fixture's
    // worst 5th-neighbor d² at 3× margin under the bound. Production
    // engines escalate lazily (3×3 first, widen only for centers the
    // inner ring can't supply) — a COST optimization with identical
    // results, which is why the declared form searches the guaranteed
    // ring directly. The per-center
    // top-5 lowers to the bounded TopKPerKey operator via the
    // row_number rewrite; ties break on event_id, distances stay
    // integers end to end, so the ranking is hash-stable.
    QueryDef(
      "q_join_spatial_knn",
      (s, dir) => {
        val r = 50L
        def coord(salt: String, id: org.apache.spark.sql.Column) =
          pmod(conv(substring(md5(concat(lit(salt), id.cast("string"))),
            1, 6), 16, 10).cast(LongType), lit(1000L))
        val pts = Tables.events(s, dir)
          .select(col("event_id"),
            coord("px:", col("event_id")).as("x"),
            coord("py:", col("event_id")).as("y"))
          .withColumn("cell",
            expr(s"(x div $r) * 1024 + (y div $r)"))
        val centers = s.range(20)
          .select(col("id").as("center_id"),
            coord("cx:", col("id")).as("cx"),
            coord("cy:", col("id")).as("cy"))
        val covered = centers.select(col("center_id"), col("cx"), col("cy"),
          explode(expr(
            s"""flatten(transform(sequence(-2, 2), dx ->
               |  transform(sequence(-2, 2), dy ->
               |    (cx div $r + dx) * 1024 + (cy div $r + dy))))"""
              .stripMargin.replaceAll("\n", " "))).as("cell"))
        val cand = pts.join(covered, "cell")
          .select(col("center_id"), col("event_id"),
            ((col("x") - col("cx")) * (col("x") - col("cx")) +
              (col("y") - col("cy")) * (col("y") - col("cy"))).as("d2"))
          // the 5×5 ring guarantees every point within 2r; restricting
          // to it makes the bounded search exact (spec pins the margin)
          .filter(col("d2") <= lit(4L) * r * r)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("center_id"))
          .orderBy(col("d2"), col("event_id"))
        cand.withColumn("rnk", row_number().over(w).cast(LongType))
          .filter(col("rnk") <= 5)
          .select(col("center_id"), col("rnk"), col("event_id"), col("d2"))
          .orderBy(col("center_id"), col("rnk"))
      },
      Some(
        """WITH pts AS (
          |  SELECT event_id,
          |         CAST(('0x' || substr(md5('px:' ||
          |             CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS x,
          |         CAST(('0x' || substr(md5('py:' ||
          |             CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS y
          |  FROM events),
          |centers AS (
          |  SELECT i AS center_id,
          |         CAST(('0x' || substr(md5('cx:' ||
          |             CAST(i AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS cx,
          |         CAST(('0x' || substr(md5('cy:' ||
          |             CAST(i AS VARCHAR)), 1, 6)) AS BIGINT)
          |           % 1000 AS cy
          |  FROM range(20) t(i)),
          |cand AS (
          |  SELECT c.center_id, p.event_id,
          |         (p.x - c.cx) * (p.x - c.cx) +
          |         (p.y - c.cy) * (p.y - c.cy) AS d2
          |  FROM pts p JOIN centers c
          |    ON (p.x - c.cx) * (p.x - c.cx) +
          |       (p.y - c.cy) * (p.y - c.cy) <= 10000),
          |ranked AS (
          |  SELECT center_id, event_id, CAST(d2 AS BIGINT) AS d2,
          |         row_number() OVER (PARTITION BY center_id
          |           ORDER BY d2, event_id) AS rnk
          |  FROM cand)
          |SELECT center_id, rnk, event_id, d2
          |FROM ranked WHERE rnk <= 5
          |ORDER BY center_id, rnk""".stripMargin)
    ),

    // U-shaped (position-based) MULTI-TOUCH ATTRIBUTION — the
    // marketing-analytics question q_funnel doesn't answer: how much
    // of each purchase's value does each preceding touch (click/view)
    // deserve? Each touch attributes to the user's NEXT purchase in
    // the (ts, event_id) total order within a 7-day lookback; within
    // a conversion's touch group the first and last touches get 40%
    // each and the middles split the remaining 20% (n=1 → 100%,
    // n=2 → 50/50 — the standard U-shape degenerations).
    //
    // Scale shape: ONE user_id exchange feeds both window passes (the
    // next-purchase pointer is a running min over the REVERSED total
    // order — never a CURRENT ROW..UNBOUNDED FOLLOWING frame, which
    // Spark evaluates O(n²) per partition); the touch→conversion
    // attach is an equi-join on (user, conv_pos); the final rollup is
    // a map-combined |type × bucket|-row aggregate. Float discipline:
    // purchase value → exact cents once; per-touch credit =
    // round(cents · w · 1e4) as BIGINT (unit 10⁻⁴ cent) so the sum is
    // order-independent; w itself is one shared double expression
    // (0.4 / 0.2/(n−2)) identical in both engines.
    QueryDef(
      "q_attribution",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), unix_micros(col("ts")).as("ts_us"))
        val wPos = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val wRev = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pos = ev.withColumn("pos", row_number().over(wPos).cast(LongType))
          .withColumn("conv_pos",
            min(when(col("event_type") === "purchase", col("pos")))
              .over(wRev))
        val convs = pos.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("pos").as("conv_pos"),
            col("ts_us").as("conv_ts_us"),
            round(col("value") * 100).cast(LongType).as("cents"))
        val touches = pos
          .filter(col("event_type").isin("click", "view") &&
            col("conv_pos").isNotNull &&
            col("conv_pos") =!= col("pos"))
          .join(convs, Seq("user_id", "conv_pos"))
          .filter(col("ts_us") >= col("conv_ts_us") - lit(7L * 86400000000L))
        val wGrpA = Window.partitionBy(col("user_id"), col("conv_pos"))
          .orderBy(col("pos"))
        val wGrp = Window.partitionBy(col("user_id"), col("conv_pos"))
        val credited = touches
          .withColumn("r", row_number().over(wGrpA).cast(LongType))
          .withColumn("n", count(lit(1)).over(wGrp))
          .withColumn("bucket",
            when(col("n") === 1, "only")
              .when(col("r") === 1, "first")
              .when(col("r") === col("n"), "last")
              .otherwise("middle"))
          .withColumn("w",
            when(col("n") === 1, 1.0)
              .when(col("n") === 2, 0.5)
              .when(col("r") === 1 || col("r") === col("n"), 0.4)
              .otherwise(lit(0.2) / (col("n") - 2)))
        credited.groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n_touches"),
            countDistinct(concat_ws(":", col("user_id"), col("conv_pos")))
              .as("n_convs"),
            sum(round(col("cents") * col("w") * 10000).cast(LongType))
              .as("credit_c4"))
          .orderBy(col("event_type"), col("bucket"))
      },
      Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, event_type, value,
          |         epoch_us(ts) AS ts_us
          |  FROM events),
          |pos AS (
          |  SELECT *,
          |    CAST(row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts_us, event_id) AS BIGINT) AS pos
          |  FROM ev),
          |ptr AS (
          |  SELECT *,
          |    min(CASE WHEN event_type = 'purchase' THEN pos END)
          |      OVER (PARTITION BY user_id
          |            ORDER BY ts_us DESC, event_id DESC
          |            ROWS UNBOUNDED PRECEDING) AS conv_pos
          |  FROM pos),
          |convs AS (
          |  SELECT user_id, pos AS conv_pos, ts_us AS conv_ts_us,
          |         CAST(round(value * 100) AS BIGINT) AS cents
          |  FROM pos WHERE event_type = 'purchase'),
          |touches AS (
          |  SELECT t.user_id, t.conv_pos, t.event_type, t.pos,
          |         c.cents
          |  FROM ptr t JOIN convs c
          |    ON t.user_id = c.user_id AND t.conv_pos = c.conv_pos
          |  WHERE t.event_type IN ('click', 'view')
          |    AND t.conv_pos IS NOT NULL AND t.conv_pos <> t.pos
          |    AND t.ts_us >= c.conv_ts_us - 7 * 86400000000),
          |credited AS (
          |  SELECT *,
          |    CAST(row_number() OVER (PARTITION BY user_id, conv_pos
          |      ORDER BY pos) AS BIGINT) AS r,
          |    count(*) OVER (PARTITION BY user_id, conv_pos) AS n
          |  FROM touches),
          |weighted AS (
          |  SELECT event_type,
          |    CASE WHEN n = 1 THEN 'only'
          |         WHEN r = 1 THEN 'first'
          |         WHEN r = n THEN 'last'
          |         ELSE 'middle' END AS bucket,
          |    user_id, conv_pos, cents,
          |    CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
          |         WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
          |         WHEN r = 1 OR r = n THEN CAST(0.4 AS DOUBLE)
          |         ELSE CAST(0.2 AS DOUBLE) / (n - 2) END AS w
          |  FROM credited)
          |SELECT event_type, bucket,
          |       count(*) AS n_touches,
          |       CAST(count(DISTINCT CAST(user_id AS VARCHAR) || ':' ||
          |         CAST(conv_pos AS VARCHAR)) AS BIGINT) AS n_convs,
          |       CAST(sum(CAST(round(cents * w * 10000) AS BIGINT))
          |         AS BIGINT) AS credit_c4
          |FROM weighted
          |GROUP BY event_type, bucket
          |ORDER BY event_type, bucket""".stripMargin)
    ),

    // A/B EXPERIMENT READOUT — Welch's unequal-variance t-test per
    // event type between two md5-split user buckets (the salted-draw
    // discipline: raw id parity confounds with round-robin source
    // assignment). The analytics op every experimentation platform
    // runs at the end of a test: per-arm n / mean, the Welch t
    // statistic, its Satterthwaite degrees of freedom, and the
    // two-sided 5% verdict. On a null split (no treatment exists in
    // the fixture) the verdict column doubles as a false-positive
    // audit.
    //
    // Float discipline: one map-combined aggregate collects EXACT
    // integer sums (n, Σcents, Σcents² per arm — cents² sums have
    // ~2000× BIGINT headroom at the 100× probe; DuckDB rides HUGEINT
    // on the same intermediates); every statistic then derives from
    // those integers through ONE shared textual formula evaluated by
    // both engines (t is scale-invariant, so it is computed on cents
    // and needs no unit conversion), rounded 6 dp. The significance
    // boolean compares identical doubles, so it is hash-stable.
    QueryDef(
      "q_eval_abtest",
      (s, dir) => {
        val g = Tables.events(s, dir)
          .select(col("event_type"),
            (substring(md5(concat(lit("ab:"),
              col("user_id").cast("string"))), 1, 1) < "8").as("is_a"),
            round(col("value") * 100).cast(LongType).as("c"))
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
            sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"),
            sum(when(col("is_a"), col("c")).otherwise(0L)).as("sa"),
            sum(when(!col("is_a"), col("c")).otherwise(0L)).as("sb"),
            sum(when(col("is_a"), col("c") * col("c")).otherwise(0L)).as("qa"),
            sum(when(!col("is_a"), col("c") * col("c")).otherwise(0L)).as("qb"))
        g.selectExpr("event_type", "na", "nb",
            s"round(${AbTestSql.mean("sa", "na")} / 100.0, 6) AS mean_a",
            s"round(${AbTestSql.mean("sb", "nb")} / 100.0, 6) AS mean_b",
            s"round(${AbTestSql.t}, 6) AS t_stat",
            s"round(${AbTestSql.df}, 6) AS df",
            s"abs(${AbTestSql.t}) > 1.96 AS significant")
          .orderBy(col("event_type"))
      },
      Some(
        s"""WITH g AS (
           |  SELECT event_type,
           |         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
           |         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
           |         CAST(sum(CASE WHEN is_a THEN c ELSE 0 END) AS BIGINT) AS sa,
           |         CAST(sum(CASE WHEN is_a THEN 0 ELSE c END) AS BIGINT) AS sb,
           |         CAST(sum(CASE WHEN is_a THEN c * c ELSE 0 END) AS BIGINT) AS qa,
           |         CAST(sum(CASE WHEN is_a THEN 0 ELSE c * c END) AS BIGINT) AS qb
           |  FROM (
           |    SELECT event_type,
           |           substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 1)
           |             < '8' AS is_a,
           |           CAST(round(value * 100) AS BIGINT) AS c
           |    FROM events)
           |  GROUP BY 1)
           |SELECT event_type, na, nb,
           |       round(${AbTestSql.mean("sa", "na")} / 100.0, 6) AS mean_a,
           |       round(${AbTestSql.mean("sb", "nb")} / 100.0, 6) AS mean_b,
           |       round(${AbTestSql.t}, 6) AS t_stat,
           |       round(${AbTestSql.df}, 6) AS df,
           |       abs(${AbTestSql.t}) > 1.96 AS significant
           |FROM g ORDER BY event_type""".stripMargin)
    )
  )

  /** The Welch-test formulas as SHARED SQL text: Spark evaluates these
    * via selectExpr and the DuckDB oracle embeds the same strings, so
    * every double is produced by the identical expression tree over the
    * same exact integer inputs — the strongest form of the one-shared-
    * association rule. */
  private object AbTestSql {
    def mean(sx: String, n: String): String =
      s"(CAST($sx AS DOUBLE) / CAST($n AS DOUBLE))"
    private def variance(q: String, sx: String, n: String): String =
      s"((CAST($q AS DOUBLE) - ${mean(sx, n)} * CAST($sx AS DOUBLE)) / " +
        s"CAST($n - 1 AS DOUBLE))"
    private val va = variance("qa", "sa", "na")
    private val vb = variance("qb", "sb", "nb")
    private val sea = s"($va / CAST(na AS DOUBLE))"
    private val seb = s"($vb / CAST(nb AS DOUBLE))"
    val t: String =
      s"((${mean("sa", "na")} - ${mean("sb", "nb")}) / sqrt($sea + $seb))"
    val df: String =
      s"((($sea + $seb) * ($sea + $seb)) / " +
        s"($sea * $sea / CAST(na - 1 AS DOUBLE) + " +
        s"$seb * $seb / CAST(nb - 1 AS DOUBLE)))"
  }
}
