package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.QueryDef
import graft.sources.Tables

/** Window functions (SURVEY §2.B B21-B23).
  *
  * Every window here carries a `partitionBy` — a global window without one
  * collapses to a single task and is exactly the 100-TB anti-pattern
  * SURVEY §7 bans. Ordering keys always end in a unique tiebreaker so
  * row_number/ntile/lag are deterministic.
  */
object Windows {

  val defs: Seq[QueryDef] = Seq(

    // B21 — ranking family. row_number/ntile need a total order; rank and
    // dense_rank run on a tie-ful ordering (their outputs are
    // tie-invariant, which is what makes them comparable).
    QueryDef(
      "q_window_rank",
      (s, dir) => {
        val wTotal = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wTies = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderpriority"))
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"), col("o_custkey"),
            row_number().over(wTotal).cast(LongType).as("rn"),
            ntile(4).over(wTotal).cast(LongType).as("quartile"),
            rank().over(wTies).cast(LongType).as("rk"),
            dense_rank().over(wTies).cast(LongType).as("drk"))
          .orderBy(col("o_orderkey"))
      },
      Some(
        """SELECT o_orderkey, o_custkey,
          |       row_number() OVER w_total AS rn,
          |       ntile(4) OVER w_total AS quartile,
          |       rank() OVER w_ties AS rk,
          |       dense_rank() OVER w_ties AS drk
          |FROM orders
          |WINDOW w_total AS (PARTITION BY o_custkey
          |                   ORDER BY o_totalprice DESC, o_orderkey),
          |       w_ties AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
          |ORDER BY o_orderkey""".stripMargin)
    ),

    // B21(b) — distribution ranks: cume_dist / percent_rank / nth_value.
    QueryDef(
      "q_window_rank2",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"), col("o_custkey"),
            round(cume_dist().over(w), 6).as("cd"),
            round(percent_rank().over(w), 6).as("pr"),
            nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
          .orderBy(col("o_orderkey"))
      },
      Some(
        """SELECT o_orderkey, o_custkey,
          |       round(cume_dist() OVER w, 6) AS cd,
          |       round(percent_rank() OVER w, 6) AS pr,
          |       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
          |         ORDER BY o_totalprice, o_orderkey
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |         AS second_order
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
          |ORDER BY o_orderkey""".stripMargin)
    ),

    // B22 — analytic offsets: lag/lead/first per user timeline.
    QueryDef(
      "q_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            first(col("value")).over(w).as("first_value"),
            lag(col("event_type"), 2, "none").over(w).as("type_2_back"))
          .orderBy(col("event_id"))
      },
      Some(
        """SELECT event_id, user_id,
          |       lag(value, 1) OVER w AS prev_value,
          |       lead(value, 1) OVER w AS next_value,
          |       first_value(value) OVER w AS first_value,
          |       coalesce(lag(event_type, 2) OVER w, 'none') AS type_2_back
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |ORDER BY event_id""".stripMargin)
    ),

    // B23 — frame-spec aggregates: 4-row moving stats and a value-range
    // frame (RANGE BETWEEN on the ordering value).
    QueryDef(
      "q_window_frame",
      (s, dir) => {
        val wRows = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 0)
        // fractional RANGE frame bounds need the SQL form — the typed
        // rangeBetween API only accepts Long offsets
        val bandSum = expr(
          """sum(value) OVER (PARTITION BY user_id ORDER BY value
            |RANGE BETWEEN 50.0 PRECEDING AND CURRENT ROW)""".stripMargin)
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"),
            round(avg(col("value")).over(wRows), 6).as("mavg_4"),
            round(sum(col("value")).over(wRows), 2).as("msum_4"),
            round(bandSum, 2).as("band_sum"))
          .orderBy(col("event_id"))
      },
      Some(
        """SELECT event_id, user_id,
          |       round(avg(value) OVER w_rows, 6) AS mavg_4,
          |       round(sum(value) OVER w_rows, 2) AS msum_4,
          |       round(sum(value) OVER w_range, 2) AS band_sum
          |FROM events
          |WINDOW w_rows AS (PARTITION BY user_id ORDER BY ts, event_id
          |                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
          |       w_range AS (PARTITION BY user_id ORDER BY value
          |                   RANGE BETWEEN 50.0 PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    ),

    // B21-23 — distribution window family: ntile (equi-depth bucket
    // assignment — the shard-balancing primitive), percent_rank and
    // cume_dist (the empirical-CDF pair behind percentile features).
    // ANSI semantics are identical across engines as long as the
    // partition ORDER is a total order — (ts, event_id) here, so ties
    // cannot reshuffle bucket boundaries between engines. One exchange
    // per user partition serves all three functions.
    QueryDef(
      "q_window_distribution",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cdist"))
          .orderBy(col("event_id"))
      },
      Some(
        """SELECT event_id, user_id,
          |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          |       round(percent_rank() OVER w, 6) AS pct_rank,
          |       round(cume_dist() OVER w, 6) AS cdist
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |ORDER BY event_id""".stripMargin)
    ),

    // DAU / trailing-7-day WAU / stickiness — the active-users rollup
    // every product-analytics stack runs, and the canonical "distinct
    // count over a sliding window" problem. COUNT(DISTINCT) does not
    // slide: re-counting each day's trailing week re-reads 7× the
    // fact table. The scale form: collapse events to the DISTINCT
    // (day, user) pair grid FIRST (one map-combined shuffle, the
    // grid-first discipline), then each pair CONTRIBUTES ITSELF to
    // the 7 target days via a map-side sequence+explode — no range
    // join, no window over the fact table — and a second pair-dedup
    // counts the union per day. Cost: 7×|pairs|, flat in event
    // volume; every step is an exchange on (day[, user]). Silent days
    // (no DAU row) are definitionally absent; trailing windows
    // starting before the range are partial, as reported.
    QueryDef(
      "q_active_users",
      (s, dir) => {
        val pairs = Tables.events(s, dir)
          .select(
            floor(unix_micros(col("ts")).cast("double") / 86400000000.0)
              .cast(LongType).as("day"),
            col("user_id"))
          .distinct()
        val dau = pairs.groupBy(col("day"))
          .agg(count(lit(1)).as("dau"))
        val wau = pairs
          .select(explode(sequence(col("day"), col("day") + 6))
            .as("day"), col("user_id"))
          .distinct()
          .groupBy(col("day")).agg(count(lit(1)).as("wau"))
        dau.join(wau, Seq("day"))
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau"), 6)
              .as("stickiness"))
          .orderBy(col("day"))
      },
      Some(
        """WITH pairs AS (
          |  SELECT DISTINCT
          |         CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000)
          |           AS BIGINT) AS day,
          |         user_id
          |  FROM events),
          |dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY 1),
          |expanded AS (
          |  SELECT DISTINCT day + i AS day, user_id
          |  FROM pairs, range(0, 7) t(i)),
          |wau AS (SELECT day, count(*) AS wau FROM expanded GROUP BY 1)
          |SELECT d.day, d.dau, w.wau,
          |       round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
          |FROM dau d JOIN wau w ON d.day = w.day
          |ORDER BY d.day""".stripMargin)
    )
  )
}
