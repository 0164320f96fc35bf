package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.QueryDef
import graft.functions.TextFns
import graft.sources.Tables

/** Aggregation family (SURVEY §2.B B14-B20).
  *
  * Everything here compiles to partial+final `HashAggregateExec` with
  * map-side combine — the shuffle carries one row per (group, partition),
  * so these plans scale with group cardinality, not input size. Floating
  * aggregates are rounded on both engine and oracle (SURVEY §7: summation
  * order differs between engines in the last ULPs).
  */
object Aggregates {

  /** Tracked capacity + top-N shared by q_topk_sketch and its
    * streaming twin q_stream_topk (r9 twin-query rule: one pipeline
    * function + one constant, or capacity edits drift silently). */
  private[graft] val TopKTracked = 1024
  private[graft] val TopKTopN = 10

  /** Per-source frequency-sketch accumulation over (source, term)
    * rows — the grouped half both twins run: batch directly, streaming
    * through the aggregation state's partial/merge contract (the
    * q_stream_quantile pattern — state per source is ONE bounded
    * sketch image regardless of stream length). */
  private[graft] def topkAccumulate(tokens: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    tokens.groupBy(col("source"))
      .agg(expr(s"approx_top_k_accumulate(term, $TopKTracked)").as("sk"))

  /** Combine the per-source sketches WITHOUT rescanning and read the
    * global top-N off the merged state — the tail both twins share
    * (batch: over the live agg; streaming: over the drained
    * complete-mode state rows). */
  private[graft] def topkEstimate(perSource: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    perSource
      .agg(expr(s"approx_top_k_estimate(approx_top_k_combine(sk, " +
        s"$TopKTracked), $TopKTopN)").as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "entry")))
      .select((col("pos") + 1).cast(LongType).as("rnk"),
        col("entry.item").as("term"),
        col("entry.count").cast(LongType).as("est_count"))

  /** HLL lgK shared by q_sketch_rollup and its streaming twin
    * q_stream_hll (twin rule: one pipeline + one constant). */
  private[graft] val HllLgK = 12

  /** Per-source HLL sketch over (source, doc_id) rows — the grouped
    * half both twins run (batch directly; streaming through the
    * aggregation state's partial/merge contract). */
  private[graft] def hllPerSource(rows: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    rows.groupBy(col("source"))
      .agg(hll_sketch_agg(col("doc_id"), lit(HllLgK)).as("sk"))

  /** Per-source estimates + the cross-source union estimate read off
    * the merged images WITHOUT rescanning — the tail both twins share.
    * Register state is a per-register max over hashed inputs, so the
    * estimates are a pure function of the input SET — identical
    * however micro-batches split it (spec-pinned stream == batch). */
  private[graft] def hllEstimate(per: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perEst = per.select(col("source"),
      hll_sketch_estimate(col("sk")).as("est_distinct"))
    val union = per
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
        .as("est_distinct"))
      .select(lit("__all__").as("source"), col("est_distinct"))
    perEst.unionAll(union).orderBy(col("source"))
  }

  val defs: Seq[QueryDef] = Seq(

    // B14 — the basic hash-agg family (TPC-H Q1 shape).
    QueryDef(
      "q_agg_basic",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            // exact cents: per-row round, BIGINT sum (order-independent)
            sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 100).cast("long")).as("revenue_c"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |       round(sum(l_quantity), 2) AS sum_qty,
          |       round(avg(l_quantity), 6) AS avg_qty,
          |       min(l_extendedprice) AS min_price,
          |       max(l_extendedprice) AS max_price,
          |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
          |         * 100) AS BIGINT)) AS BIGINT) AS revenue_c
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // B15 — exact distinct counts (expand + two-phase agg in Spark).
    QueryDef(
      "q_agg_distinct",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("nd_parts"),
            countDistinct(col("l_suppkey")).as("nd_supps"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """SELECT l_returnflag,
          |       count(DISTINCT l_partkey) AS nd_parts,
          |       count(DISTINCT l_suppkey) AS nd_supps,
          |       count(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // B16 — HLL++ approximate distinct. No hash oracle (estimator differs
    // engine-to-engine by design); RegistrySpec + AggregatesSpec assert
    // tolerance vs the exact count instead.
    QueryDef(
      "q_agg_approx_distinct",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
          .orderBy(col("l_returnflag"))
      },
      None
    ),

    // B16+ — MERGEABLE distinct sketches (Apache DataSketches HLL via
    // Spark's hll_sketch_agg / hll_union_agg): per-group sketches roll
    // up into a global estimate WITHOUT rescanning rows — the
    // pre-aggregation pattern a 100 TB deployment relies on (daily
    // sketch partitions merged into monthly uniques; a plain
    // approx_count_distinct result can't be merged after the fact).
    // Deterministic for fixed input, but the sketch estimator is
    // engine-specific — no SQL oracle; AggregatesSpec pins ±5% vs exact
    // distinct counts for every group and the union.
    QueryDef(
      "q_sketch_rollup",
      (s, dir) => {
        hllEstimate(hllPerSource(Tables.documents(s, dir)))
      },
      None
    ),

    // B16/north star — mergeable frequent-items (heavy hitters): one
    // DataSketches frequency sketch per source over the exploded token
    // stream (approx_top_k_accumulate), combined across sources WITHOUT
    // rescanning (approx_top_k_combine), then the global top-10 read
    // off the merged state. This is the 100 TB shard pattern: each
    // shard keeps a bounded sketch (maxItemsTracked bounds state, not
    // input volume), merges are associative, and the estimate runs on
    // the driver-sized merged state. No SQL oracle (sketch internals
    // aren't reproducible in DuckDB); AggregatesSpec pins the estimate
    // EQUAL to exact global counts — the 31-word vocabulary sits far
    // under the tracked capacity, where the sketch is exact by
    // construction.
    QueryDef(
      "q_topk_sketch",
      (s, dir) => {
        topkEstimate(topkAccumulate(
          Tables.documents(s, dir)
            .select(col("source"),
              explode(TextFns.tokens(col("text"))).as("term"))))
          .orderBy(col("rnk"))
      },
      None
    ),

    // B17 — ROLLUP with grouping() disambiguation of the NULL rows.
    QueryDef(
      "q_rollup",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
              .cast("long").as("g"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n"), col("sum_qty"), col("g"))
          .orderBy(col("flag"), col("status"), col("g"))
      },
      Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
          |       coalesce(l_linestatus, 'ALL') AS status,
          |       count(*) AS n,
          |       round(sum(l_quantity), 2) AS sum_qty,
          |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS g
          |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
          |ORDER BY flag, status, g""".stripMargin)
    ),

    // B17(b) — CUBE (all four grouping combinations) via the SQL API,
    // plus GROUPING SETS semantics pinned by the same query.
    QueryDef(
      "q_cube",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
        s.sql(
          """SELECT coalesce(l_returnflag, 'ALL') AS flag,
            |       coalesce(l_linestatus, 'ALL') AS status,
            |       count(*) AS n,
            |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            |         AS BIGINT) AS sum_price_c,
            |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS g
            |FROM graft_lineitem
            |GROUP BY CUBE (l_returnflag, l_linestatus)
            |ORDER BY flag, status, g""".stripMargin)
      },
      Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
          |       coalesce(l_linestatus, 'ALL') AS status,
          |       count(*) AS n,
          |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |         AS BIGINT) AS sum_price_c,
          |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS g
          |FROM lineitem
          |GROUP BY CUBE (l_returnflag, l_linestatus)
          |ORDER BY flag, status, g""".stripMargin)
    ),

    // B19(b) — approximate quantiles (t-digest-style sketch in Spark; no
    // hash oracle since estimators differ by design — AggregatesSpec
    // bounds it against the exact percentile instead).
    QueryDef(
      "q_agg_approx_quantile",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"),
            expr("approx_percentile(l_extendedprice, array(0.1, 0.9), 1000)")
              .getItem(0).as("approx_p10"))
          .orderBy(col("l_returnflag"))
      },
      None
    ),

    // B18 — central-moment statistics. DuckDB's skewness/kurtosis are
    // bias-corrected sample estimators while Spark's are population (g1 /
    // excess g2), so the oracle derives the population forms from raw
    // moments instead of using DuckDB's named functions.
    QueryDef(
      "q_agg_stats",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 6).as("std_qty"),
            round(var_samp(col("l_quantity")), 6).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
              .as("covar_qty_price"),
            round(skewness(col("l_extendedprice")), 6).as("skew_price"),
            round(kurtosis(col("l_extendedprice")), 6).as("kurt_price"))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """WITH a AS (
          |  SELECT l_returnflag AS f, avg(l_extendedprice) AS ax
          |  FROM lineitem GROUP BY 1)
          |SELECT l_returnflag,
          |       round(stddev_samp(l_quantity), 6) AS std_qty,
          |       round(var_samp(l_quantity), 6) AS var_qty,
          |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
          |       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
          |       round(avg(pow(l_extendedprice - ax, 3))
          |             / pow(avg(pow(l_extendedprice - ax, 2)), 1.5), 6) AS skew_price,
          |       round(avg(pow(l_extendedprice - ax, 4))
          |             / pow(avg(pow(l_extendedprice - ax, 2)), 2) - 3, 6) AS kurt_price
          |FROM lineitem JOIN a ON l_returnflag = a.f
          |GROUP BY l_returnflag, ax ORDER BY l_returnflag""".stripMargin)
    ),

    // B19 — exact median / interpolated quantiles (Spark `percentile` ==
    // DuckDB `quantile_cont`, both linear interpolation).
    QueryDef(
      "q_agg_quantile",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
            round(expr("percentile(l_quantity, 0.25)"), 6).as("q25_qty"),
            round(expr("percentile(l_extendedprice, 0.75)"), 6).as("q75_price"))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """SELECT l_returnflag,
          |       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
          |       round(quantile_cont(l_quantity, 0.25), 6) AS q25_qty,
          |       round(quantile_cont(l_extendedprice, 0.75), 6) AS q75_price
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // B20 — collect_set, sorted + stringified for deterministic compare.
    QueryDef(
      "q_agg_collect",
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(
            concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
              .as("priorities"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some(
        """SELECT o_orderstatus,
          |       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
          |       count(*) AS n
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),

    // B17 — explicit GROUPING SETS (the general form rollup/cube are
    // sugar for): three chosen grain combinations in ONE pass — Spark
    // plans a single Expand (3× row multiplier) + one aggregate, not
    // three scans unioned. Grain markers via coalesce sentinels (the
    // grouping columns are non-null by construction) so both engines
    // emit identical rows without engine-specific grouping_id layouts.
    QueryDef(
      "q_agg_grouping_sets",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("gs_lineitem")
        s.sql(
          """SELECT coalesce(l_returnflag, 'ALL') AS rf,
            |       coalesce(l_linestatus, 'ALL') AS ls,
            |       count(*) AS n,
            |       CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty
            |FROM gs_lineitem
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
            |                        (l_returnflag), ())
            |ORDER BY rf, ls""".stripMargin)
      },
      Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
          |       coalesce(l_linestatus, 'ALL') AS ls,
          |       count(*) AS n,
          |       CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_returnflag), ())
          |ORDER BY rf, ls""".stripMargin)
    ),

    // B19-adjacent — equi-width histogram of l_extendedprice in 20
    // buckets between the observed min and max, empty buckets
    // zero-filled from a generated bucket spine (the distribution-
    // profiling pass behind every data-quality dashboard and the
    // binning primitive q_drift_psi builds on). The bucket index is ONE
    // shared double expression — least(floor((v−lo)·20/(hi−lo)), 19) —
    // written with identical association on both engines so every row
    // lands in the same bucket bit-for-bit; the max value clamps into
    // the last bucket.
    //
    // Scale shape: two passes over the fact table (bounds, then a
    // map-combined 20-group aggregate) — the irreducible histogram
    // traffic; the 1-row bounds and the 20-row spine broadcast. At
    // 100 TB the same plan holds: the shuffle carries 20 rows per
    // map partition.
    QueryDef(
      "q_agg_histogram",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        val bucket = least(
          floor((col("l_extendedprice") - col("lo")) * 20.0 /
            (col("hi") - col("lo"))), lit(19.0)).cast("long")
        // Exact-cents bucket sums (order-independent BIGINT), never a
        // rounded double sum — at ~1e10 bucket magnitude the 2dp
        // rounding of a float sum is summation-order luck (ADVICE r8).
        val counts = li.crossJoin(broadcast(bounds))
          .groupBy(bucket.as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_extendedprice") * 100).cast("long"))
              .as("sum_price_cents"))
        s.range(20).select(col("id").as("bucket"))
          .crossJoin(broadcast(bounds))
          .join(counts, Seq("bucket"), "left")
          .select(col("bucket"),
            round(col("lo") + col("bucket") * (col("hi") - col("lo")) /
              20.0, 6).as("lo_edge"),
            round(col("lo") + (col("bucket") + 1) *
              (col("hi") - col("lo")) / 20.0, 6).as("hi_edge"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("sum_price_cents"), lit(0L))
              .as("sum_price_cents"))
          .orderBy(col("bucket"))
      },
      Some(
        """WITH bounds AS (
          |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
          |  FROM lineitem),
          |counts AS (
          |  SELECT CAST(least(floor((l_extendedprice - lo) * 20.0 /
          |           (hi - lo)), 19) AS BIGINT) AS bucket,
          |         count(*) AS n,
          |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |              AS BIGINT) AS sum_price_cents
          |  FROM lineitem, bounds
          |  GROUP BY 1)
          |SELECT t.bucket,
          |       round(lo + t.bucket * (hi - lo) / 20.0, 6) AS lo_edge,
          |       round(lo + (t.bucket + 1) * (hi - lo) / 20.0, 6) AS hi_edge,
          |       coalesce(c.n, 0) AS n,
          |       coalesce(c.sum_price_cents, 0) AS sum_price_cents
          |FROM range(0, 20) t(bucket) CROSS JOIN bounds
          |LEFT JOIN counts c ON c.bucket = t.bucket
          |ORDER BY t.bucket""".stripMargin)
    ),

    // B19-adjacent — statistical MODE with a DETERMINISTIC tie-break
    // (highest count, then lexicographically smallest value). Engines
    // disagree on native mode() tie semantics (DuckDB's is
    // unspecified), so the portable form is the count + per-group
    // rank — one map-combined count shuffle sized by the value
    // domain, then a window over the tiny (group × value) table,
    // never over the fact table.
    QueryDef(
      "q_agg_mode",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("n").desc, col("o_orderpriority"))
        counts.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("o_orderstatus"),
            col("o_orderpriority").as("mode_priority"), col("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some(
        """WITH c AS (
          |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |  FROM orders GROUP BY 1, 2),
          |r AS (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY o_orderstatus
          |    ORDER BY n DESC, o_orderpriority) AS rn
          |  FROM c)
          |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
          |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin)
    ),

    // EXACT mergeable distinct counting via bitmap aggregation — the
    // precise counterpart of the HLL rollup (q_sketch_rollup): for a
    // dense integer key domain, per-segment BITMAPS are an exact,
    // mergeable distinct index. The two-level shape is the production
    // pattern: level 1 builds one bitmap per (group, segment, bucket)
    // — the per-ingest-day artifact a pipeline persists; level 2
    // OR-merges bitmaps across segments per (group, bucket) and sums
    // bucket cardinalities — an exact cross-segment distinct WITHOUT
    // rescanning any segment's raw data. bitmap_bucket_number caps
    // each bitmap at 32 KB regardless of the key domain, so state per
    // (group, bucket) is bounded and the merge shuffle carries
    // bitmaps, not keys. Spark's bitmap_* functions (3.5+) are the
    // engine primitives; the oracle is plain COUNT(DISTINCT) — bitmaps
    // are exact, so they must agree to the last key.
    QueryDef(
      "q_agg_bitmap",
      (s, dir) => {
        // level 1: per-(flag, ship-year segment, bucket) bitmaps
        val seg = Tables.lineitem(s, dir)
          .select(col("l_returnflag"),
            year(col("l_shipdate")).as("segment"), col("l_partkey"))
          .groupBy(col("l_returnflag"), col("segment"),
            expr("bitmap_bucket_number(l_partkey)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))")
            .as("bm"))
        // level 2: OR-merge across segments, then count — no rescan
        val merged = seg.groupBy(col("l_returnflag"), col("bucket"))
          .agg(expr("bitmap_or_agg(bm)").as("merged"))
          .groupBy(col("l_returnflag"))
          .agg(sum(expr("bitmap_count(merged)")).as("n_distinct_parts"))
        val nSegs = seg.select(col("l_returnflag"), col("segment"))
          .distinct()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_segments_merged"))
        merged.join(nSegs, "l_returnflag")
          .select(col("l_returnflag"), col("n_distinct_parts"),
            col("n_segments_merged"))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """WITH seg AS (
          |  SELECT l_returnflag, year(l_shipdate) AS segment, l_partkey
          |  FROM lineitem),
          |segs AS (
          |  SELECT l_returnflag, count(DISTINCT segment) AS n_seg
          |  FROM seg GROUP BY 1)
          |SELECT s.l_returnflag,
          |       count(DISTINCT s.l_partkey) AS n_distinct_parts,
          |       CAST(max(g.n_seg) AS BIGINT) AS n_segments_merged
          |FROM seg s JOIN segs g ON s.l_returnflag = g.l_returnflag
          |GROUP BY s.l_returnflag ORDER BY s.l_returnflag""".stripMargin)
    ),

    // B16 — THETA sketch set algebra (audience overlap): the
    // INTERSECTION-capable member of the mergeable-sketch family —
    // HLL images union but cannot intersect; theta's KMV sample
    // supports union/intersection/difference on the merged images,
    // which is what cross-segment reach ("how many users did BOTH
    // purchase and click?") needs without an exact distinct-pair
    // scan. One map-combined theta sketch per event type (custom
    // `theta_sketch_agg` TypedImperativeAggregate over the bundled
    // DataSketches library, bounded ≤4096 retained hashes), then the
    // pairwise set algebra runs driver-side on the |types|² compact
    // images — the PCA bounded-collect discipline. Deterministic for
    // a fixed input set (fixed library seed) but not SQL-expressible:
    // no oracle; AggregatesSpec pins every estimate within 5% of the
    // exact distinct/overlap counts (near-exact here: distinct users
    // sit near the 4096-entry exact threshold).
    QueryDef(
      "q_sketch_theta",
      (s, dir) => {
        import graft.functions.ThetaFns
        val per = Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(ThetaFns.sketchAgg(col("user_id")).as("sk"))
          .collect()
          .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
          .sortBy(_._1)
        val rows = for {
          (ta, ba) <- per.toSeq
          (tb, bb) <- per.toSeq if ta < tb
        } yield {
          val (ea, eb, eu, ei) = ThetaFns.overlap(ba, bb)
          (ta, tb, math.round(ea), math.round(eb), math.round(eu),
            math.round(ei),
            BigDecimal(ei / eu).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
        s.createDataFrame(rows)
          .toDF("type_a", "type_b", "est_a", "est_b", "est_union",
            "est_overlap", "est_jaccard")
          .orderBy(col("type_a"), col("type_b"))
      },
      None
    ),

    // B16 — MERGEABLE QUANTILE sketch rollup (VERDICT r8 item 6), the
    // fourth mergeable-artifact family after HLL distinct
    // (q_sketch_rollup), frequent-items (q_topk_sketch), and exact
    // bitmap distinct (q_agg_bitmap): per-(flag, ship-year segment)
    // KLL doubles sketches of l_extendedprice — the per-day artifact a
    // pipeline persists — merged across segments per flag WITHOUT
    // rescanning, then p50/p95/p99 read off the merged image. The
    // custom `kll_sketch_agg`/`kll_merge_agg` TypedImperativeAggregates
    // wrap the DataSketches KLL library Spark already bundles (the
    // same execution shape as Spark's own hll_sketch_agg/hll_union_agg
    // pair). State per sketch is O(k·log(n/k)) bytes regardless of
    // input volume; k=200 gives ≤ ~1.65% normalized rank error at 99%
    // confidence. No SQL oracle (KLL compaction is randomized);
    // AggregatesSpec pins every estimate's EXACT rank within the KLL
    // error bound and the quantile ordering.
    QueryDef(
      "q_sketch_quantile",
      (s, dir) => {
        import graft.functions.KllFns
        val seg = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), year(col("l_shipdate")).as("segment"),
            col("l_extendedprice"))
          .groupBy(col("l_returnflag"), col("segment"))
          .agg(KllFns.sketchAgg(col("l_extendedprice"), 200).as("sk"),
            count(lit(1)).as("seg_rows"))
        seg.groupBy(col("l_returnflag"))
          .agg(KllFns.mergeAgg(col("sk")).as("m"),
            count(lit(1)).as("n_segments_merged"),
            sum(col("seg_rows")).as("n_rows"))
          .select(col("l_returnflag"),
            round(KllFns.quantile(col("m"), 0.5), 2).as("est_p50"),
            round(KllFns.quantile(col("m"), 0.95), 2).as("est_p95"),
            round(KllFns.quantile(col("m"), 0.99), 2).as("est_p99"),
            col("n_segments_merged"), col("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      None
    )
  )
}
