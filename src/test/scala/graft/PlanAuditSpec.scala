package graft

import org.apache.spark.sql.functions._

/** Plan-shape audit (SURVEY §7 "100-TB posture"): these tests pin the
  * physical-plan properties that matter at scale, so a regression that
  * silently de-optimizes a query (lost pushdown, lost broadcast, global
  * window) fails CI rather than surfacing as a 100× slowdown on a real
  * cluster. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("scan queries push filters and prune columns at the parquet scan") {
    val p = plan("q_scan_parquet")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      "projection must prune unused columns from the scan")
  }

  test("q_join_spatial: cell-bucketed radius join is hash-equi, never a distance theta-join") {
    val p = plan("q_join_spatial")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "spatial join must bucket into cells, not nested-loop on distance:\n" + p)
    assert(p.contains("cell"), "join key must be the grid cell id")
    // emit-once: a point sits in exactly one cell and each center's 9
    // covering cells are distinct, so no pair dedup exists in the plan
    assert(!p.contains("HashAggregate(keys=[center_id") ||
      !p.contains("Deduplicate"), "no pair-dedup stage expected")
    // and the cell decomposition loses nothing vs the naive distance
    // scan (driver replay at spec scale)
    val got = q("q_join_spatial").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def coord(salt: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$salt$id".getBytes("UTF-8"))
      val hex = h.take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000L
    }
    val pts = sources.Tables.events(spark, sf).select(col("event_id"))
      .collect().map(_.getLong(0))
      .map(id => (coord("px:", id), coord("py:", id)))
    val expected = (0L until 20L).map { c =>
      val (cx, cy) = (coord("cx:", c), coord("cy:", c))
      val d2s = pts.map { case (x, y) =>
        (x - cx) * (x - cx) + (y - cy) * (y - cy) }.filter(_ <= 2500L)
      (c, d2s.length.toLong, if (d2s.isEmpty) -1L else d2s.min, d2s.sum)
    }.filter(_._2 > 0)
    assert(got.toSeq == expected,
      "cell-bucketed result must equal the naive distance scan")
  }

  test("nested schema pruning: one struct field read prunes siblings from the scan") {
    q("q_nested_roundtrip").collect() // stages the nested parquet
    val out = Staging.dir("q_nested_roundtrip")
    val pruned = spark.read.parquet(out).select(col("meta.lbl"))
    val p = pruned.queryExecution.executedPlan.toString
    // Catalyst's nested-schema pruning rewrites the ReadSchema to the
    // touched leaf only — at 100 TB this is the difference between
    // reading a 4-byte column chunk and decoding the whole struct
    assert(p.contains("lbl"), "read must include the touched leaf")
    assert(!p.contains("head4"),
      "untouched struct sibling must be pruned from the parquet scan:\n" +
        p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("q_join_spatial_knn: ring-bounded search equals unbounded kNN; margin holds") {
    def coord(salt: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$salt$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(3).map("%02x".format(_)).mkString, 16) % 1000L
    }
    val pts = sources.Tables.events(spark, sf).select(col("event_id"))
      .collect().map(_.getLong(0))
      .map(id => (id, coord("px:", id), coord("py:", id)))
    val expected = (0L until 20L).flatMap { c =>
      val (cx, cy) = (coord("cx:", c), coord("cy:", c))
      pts.map { case (id, x, y) =>
        (c, id, (x - cx) * (x - cx) + (y - cy) * (y - cy)) }
        .sortBy { case (_, id, d2) => (d2, id) }.take(5).zipWithIndex
        .map { case ((cc, id, d2), i) => (cc, i + 1L, id, d2) }
    }
    val got = q("q_join_spatial_knn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected,
      "ring-bounded kNN must equal the UNBOUNDED naive search")
    // the exhaustiveness contract: every 5th neighbor sits inside the
    // 5x5 ring's 2r guarantee with real margin (measured 3341 vs the
    // 10000 bound at spec scale — ~3x; a shrinking margin means the
    // fixture density dropped and the ring needs to widen)
    val worst5 = expected.filter(_._2 == 5L).map(_._4).max
    assert(worst5 <= 10000L / 2L,
      s"5th-neighbor d2 $worst5 eats the ring margin")
  }

  test("q_typed_pipeline: scan pruned below the typed boundary; result matches untyped") {
    val p = plan("q_typed_pipeline")
    // the select(...).as[OrderSlim] boundary keeps pruning alive: the
    // parquet scan reads the 3 needed columns, not the full order row
    assert(p.contains("o_orderstatus") && p.contains("o_custkey"),
      "scan must read the needed columns")
    assert(!p.contains("o_comment") && !p.contains("o_orderpriority"),
      "typed boundary must not widen the scan to the full row")
    // and the typed path agrees exactly with the untyped equivalent
    val typed = q("q_typed_pipeline").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val untyped = sources.Tables.orders(spark, sf)
      .select(col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_custkey"))
      .filter(col("cents") > 100000L)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"),
        max(col("o_custkey")).as("m"))
      .orderBy(col("status")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(typed.toSeq == untyped.toSeq,
      "typed Aggregator must agree with the relational aggregation")
  }

  test("dimension joins broadcast (fact side never shuffles for the join)") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q_join_inner").contains("BroadcastHashJoin"),
      "customer/nation are dimension-sized; planner should broadcast")
  }

  test("flagship aggregates in two phases (partial + final)") {
    val p = plan("q_flagship")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_avg") || p.contains("partial"), p)
  }

  test("no window in any declared query lacks partitionBy (no global-window antipattern)") {
    Registry.all.foreach { qd =>
      val pl = qd.fn(spark, sf).queryExecution.optimizedPlan.toString
      // a Window over an empty partition spec renders as 'windowspecdefinition(<sort>' with
      // no partition columns before the sort spec; cheap heuristic: flag single-partition windows
      val bad = pl.linesIterator.exists(l =>
        l.contains("windowspecdefinition(") && l.contains("ROWS BETWEEN") &&
          l.matches(".*windowspecdefinition\\((?:[^,]+ (?:ASC|DESC)).*"))
      assert(!bad, s"${qd.name} appears to use a global (un-partitioned) window:\n$pl")
    }
  }

  test("whole-stage codegen covers the flagship pipeline") {
    // AQE finalizes (and codegen-wraps) the plan only on execution;
    // toString renders WholeStageCodegen spans as "*(id)" prefixes
    val df = q("q_flagship")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") && p.contains("HashAggregate"), p)
  }

  test("as-of joins (all directions) are windowed, never nested-loop") {
    for (name <- Seq("q_join_asof", "q_join_asof_fwd", "q_join_asof_nearest")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name must stay windowed, not quadratic:\n$p")
      assert(p.contains("Window"))
    }
  }

  test("cosine hot path uses the native expression, not interpreted HOFs") {
    val p = q("q_dedup_embedding").queryExecution.optimizedPlan.toString
    // expressions render under their class-derived pretty names
    assert(p.contains("dotproduct") || p.contains("cosinesimilarity"),
      s"expected native vector expression in plan:\n$p")
  }

  test("top-k never global-sorts the full input") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("no unexpected nested-loop/cartesian join anywhere in the registry") {
    // quadratic joins are allowed ONLY where they're the documented
    // intent: a tiny broadcast build side (band join, query set,
    // centroid set) or the oracled brute-force reference form
    val allowed = Set(
      "q_join_range",       // band join, tiny broadcast build side
      "q_similarity_topk",  // corpus x broadcast 5-query set
      "q_similarity_ivf",   // corpus x broadcast 16 centroids
      "q_similarity_ivfadc", // bounded 5-query slice x broadcast
                            // centroid table (the r13 corpus/query
                            // probe split: the corpus top-1 assign is
                            // checkpointed out of the audited plan as
                            // before, but the 5-row flat query ranking
                            // is now visible — 5 x nCells rows by
                            // construction, the q_similarity_topk class)
      "q_dedup_embedding",  // exact ground-truth form (scale path =
                            // _lsh): n²/2 brute at/below EmbedAnchorCap
                            // (this fixture), bounded ≤2048-anchor
                            // broadcast × corpus above it
      "q_dedup_semantic",   // corpus x broadcast ~sqrt(n) centroids
      "q_similarity_incremental", // BATCH x broadcast standing
                            // centroids (the faiss add step; corpus
                            // assignment is staged, never re-ranked)
      "q_text_tfidf",       // 1-row broadcast (corpus-size scalar attach)
      "q_text_bm25",        // 1-row broadcast (corpus stats attach)
      "q_rank_fusion",      // inherits the legs' 1-row stat attaches
                            // (bm25 corpus stats + docsim n_docs);
                            // the fusion layer itself is hash-agg only
      "q_text_vocab_encode", // join-rank over the vocab-sized term table
      "q_text_bpe",         // 1-row broadcast per merge round (argmax
                            // pair attach), over the bounded vocab

      "q_embed_cluster_labels", // 1-row broadcast (total-tokens /
                            // n-clusters scalar attach onto the bounded
                            // cluster×term grid)
      "q_market_basket",    // 1-row broadcast (basket-count scalar attach)
      "q_mix_domains",      // 1-row broadcast (budget/sum-of-weights attach)
      "q_mix_temperature",  // 1-row broadcast (total/sum-sqrt-weights attach)
      "q_mix_epochs",       // 1-row broadcast (total-tokens/sum-weights
                            // attach onto the |sources|-row plan table)
      "q_sample_stratified", // 1-row broadcast (min-stratum scalar attach)
      "q_ts_interpolate",   // keys x broadcast spine (bounded by the
                            // TIME RANGE, not the row count)
      "q_ts_corr_matrix",   // hour spine x broadcast series-key set
                            // (grid-sized, both sides post-aggregation)
      "q_ts_seasonal",      // keys x broadcast hour spine (zero-fill,
                            // bounded by the TIME RANGE like interpolate)
      "q_ts_holtwinters",   // same zero-fill grid build as q_ts_seasonal
      "q_drift_psi",        // sources x broadcast 6-row bin spine
      "q_agg_histogram",    // fact x broadcast 1-row bounds; 20-row
                            // bucket spine x the same bounds
      "q_interleave",       // JOIN-rank over the DISTINCT-SOURCE table
                            // (≤ |sources|² rows, a handful — the
                            // bounded tiny-table rank idiom; the fact
                            // table only ever equi-joins)
      "q_graph_jaccard_capped", // 1-row broadcast (degree-cap scalar
                            // attach; everything downstream is
                            // semi-join + hash-join sized by |E|)
      "q_text_pmi",         // 1-row broadcast (corpus totals attach)
      "q_text_llr",         // 1-row broadcast (bigram total attach)
      "q_snapshot_cdc",     // 1x1 per-commit insert/delete stat join
      "q_rank_prf",         // 1-row broadcast (corpus stats attach,
                            // the q_text_bm25 shape, in both passes)
      "q_rank_mmr",         // corpus x broadcast 8-query set (the
                            // q_similarity_topk candidate stage; the
                            // greedy rounds are bounded |Q|x12 joins)
      "q_eval_retrieval",   // corpus x broadcast 25-query eval set
                            // (the bounded-query brute ranking the
                            // metrics are DEFINED over)
      "q_embed_clusters",   // brute reference form below the
                            // 10^4-vector auto-switch (scale path =
                            // cell candidates, LlmOpsSpec refinement)
      "q_embed_standardize", // 1-row broadcast (the 64-dim mean/std
                            // moment arrays attach)
                            // (manifest-sized, 4 commits)
      "q_similarity_quantized", // corpus x broadcast 8-query set (the
                            // q_similarity_topk candidate shape over
                            // int8 codes)
      "q_embed_matryoshka", // corpus x broadcast 5-query set (the
                            // q_similarity_topk candidate shape; the
                            // 4 dim budgets explode post-join, adding
                            // generator rows, not join fan-out)
      "q_text_unigram",     // 1-row broadcast (vocab-total scalar
                            // attach onto the bounded ≤~300-row piece
                            // table; the DP itself is equi-joins over
                            // the bounded word table)
      "q_sample_hard_negatives", // corpus x broadcast 25-anchor set
                            // (the q_similarity_topk candidate shape
                            // with the label-mismatch filter riding
                            // the scan; scale path = ANN/IVF
                            // candidates per the QueryDef note)
      "q_pref_bradleyterry") // bounded 64-item all-pairs comparison
                            // build + per-round |items|-row rating
                            // attaches (the comparison LOG is the
                            // data; the item set is bounded)
    Registry.all.foreach { qd =>
      val p = qd.fn(spark, sf).queryExecution.executedPlan.toString
      val quad = p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
      if (!allowed(qd.name)) {
        assert(!quad, s"${qd.name} plans a quadratic join:\n$p")
      }
    }
  }

  test("q_join_range_binned plans the band join as an equi-join (no nested loop)") {
    val p = plan("q_join_range_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned range join must not plan a nested loop:\n$p")
    // the join must key on the bucket column — the property that lets
    // both sides shuffle-partition (large-large capable)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), // hash family on the equi-key
      s"expected a hash/merge equi-join on bucket:\n$p")
    // and it produces exactly the broadcast band join's rows
    val a = q("q_join_range_binned").collect().map(_.toSeq)
    val b = q("q_join_range").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "binned rewrite must be result-identical")
  }

  test("q_funnel: one hash exchange feeds all three window passes and the per-user agg") {
    val p = plan("q_funnel")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"funnel must shuffle once on user_id (found $hashEx hash exchanges):\n$p")
    // three chained running-min windows, stacked on the single exchange
    assert(p.linesIterator.count(_.contains("windowspecdefinition(user_id")) == 3, p)
  }

  test("q_text_tfidf's per-doc top-k plans as the bounded TopKPerKey operator") {
    // the row_number()+filter idiom must keep rewriting even through the
    // cast/Project Catalyst inserts between the filter and the window
    val opt = q("q_text_tfidf").queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"), s"rewrite lost:\n$opt")
  }

  test("q_sample_weighted selects through bounded TopKPerKey, never a per-source sort") {
    val opt = q("q_sample_weighted").queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"), s"bounded selection lost:\n$opt")
    // the k-row heap replaces any full Window pass over the corpus
    assert(!opt.contains("windowspecdefinition"),
      s"weighted sampling must not window the full corpus:\n$opt")
  }

  test("q_sessionize shuffles once: window, session agg and user rollup share the exchange") {
    // both group-bys cluster on a superset of the window's user_id
    // partitioning, so one hash exchange must feed all three operators —
    // at 100 TB the sessionization pays exactly one shuffle of
    // (user_id, us, event_id)
    val p = plan("q_sessionize")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly one hash exchange, got $hashEx:\n$p")
  }

  test("q_market_basket's pair self-join reuses the basket-key clustering") {
    // distinct, cap filter and self-join all cluster on ok: the pair join
    // must be exchange-free on top of the distinct's shuffle (no fresh
    // repartition of either side), and the final top-50 must plan as
    // TakeOrderedAndProject, never a global sort
    val p = plan("q_market_basket")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must not global-sort:\n$p")
  }

  test("q_join_dpp: the fact scan carries a dynamic-pruning subquery") {
    val p = q("q_join_dpp").queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"fact scan must be dynamically pruned:\n$p")
    // and the pruning is on the partition column, at the scan
    assert(p.contains("PartitionFilters"),
      s"partition filters must reach the scan:\n$p")
  }

  test("q_join_bucketed joins and aggregates with zero hash exchanges") {
    // both sides bucketed+sorted on the join key: the join AND the
    // per-order aggregate must reuse the bucketing — the only exchange
    // allowed is the final ORDER BY's range partitioning. On tiny test
    // data the planner may broadcast instead (fine, still no shuffle);
    // the 100 TB case is a non-broadcastable fact side, so pin the
    // exchange-free SortMergeJoin with the threshold off.
    assert(!plan("q_join_bucketed").contains("Exchange hashpartitioning"),
      "bucketed join/agg must not shuffle")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("q_join_bucketed")
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed SMJ must reuse the bucketing, not shuffle:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("partition-filtered read-back prunes at the source (PartitionFilters)") {
    // partition pruning is the #1 scan lever at 100 TB: a filter on the
    // hive-layout columns must land in the scan node's PartitionFilters
    // (directories never listed), not be applied post-scan
    q("q_partitioned_write").collect() // materializes the partitioned layout
    val out = Staging.dir("q_partitioned_write")
    val pruned = spark.read
      .schema("event_id LONG, value DOUBLE, y INT, mo INT, d INT")
      .json(out)
      .filter(col("mo") === 1 && col("d") <= 7)
      .groupBy(col("y")).agg(count(lit(1)).as("n"))
    val p = pruned.queryExecution.executedPlan.toString
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("(mo") && pf.contains("(d"),
      s"expected mo/d in PartitionFilters of the scan:\n$p")
    // and the data filter must NOT reappear as a post-scan Filter on rows
    // (codegen prints the node as "*(n) Filter", so match both spellings
    // after stripping the tree-branch prefix)
    val filterNode = raw"^(\*\(\d+\) )?Filter\b".r
    assert(!p.linesIterator.exists { l =>
      val t = l.trim.stripPrefix("+-").stripPrefix(":-").trim
      filterNode.findFirstIn(t).isDefined && l.contains("mo#")
    }, s"partition predicate must prune, not filter rows:\n$p")
  }

  test("q_pack_sequences shuffles once: the aggregate reuses the window's partitioning") {
    // partitioning by shard satisfies the (shard, pack_id) clustering,
    // so the pack aggregation must NOT add a second hash exchange — at
    // scale the packing pays exactly one shuffle of (id, n_tokens)
    val p = plan("q_pack_sequences")
    val hashExchanges = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange (the window's), got $hashExchanges:\n$p")
    assert(!p.contains("text#") || p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to doc_id+text")
  }

  test("q_revenue_by_nation aggregates without ExpandExec") {
    // mixed sum + countDistinct plans through Expand, doubling every
    // join-output row through the shuffle — the two-level form must not
    val p = plan("q_revenue_by_nation")
    assert(!p.contains("Expand"),
      s"revenue rollup must avoid ExpandExec:\n$p")
  }

  test("LSH/IVF index shapes scale with corpus size, anchored at tuned small-n") {
    import operators.Similarity.{ivfCellsFor, planesFor}
    // the test/bench corpora keep the tuned shapes EXACTLY — recall
    // stamps and spec floors must not move when n is small
    assert(planesFor(200) == 2 && planesFor(500) == 2 && planesFor(2000) == 2)
    assert(ivfCellsFor(200) == 32 && ivfCellsFor(2000) == 32)
    // beyond that, buckets/cells must grow: fixed shapes square the
    // in-bucket join (measured 2.4s -> 432s at 10x; SCALEPROBE.md)
    assert(planesFor(20000) == 6, s"got ${planesFor(20000)}")
    assert(planesFor(2000000) == 12, s"got ${planesFor(2000000)}")
    assert(ivfCellsFor(20000) > 32 && ivfCellsFor(200000) > ivfCellsFor(20000))
    // per-bucket population stays bounded: n / 2^planes <= target
    for (n <- Seq(10000L, 100000L, 10000000L))
      assert(n.toDouble / (1L << planesFor(n)) <= 500.0 + 1e-9,
        s"bucket population grows unbounded at n=$n")
  }

  test("selective dim joins compose with runtime bloom-filter injection") {
    // the other big shuffle-volume cutter at 100 TB (next to partition
    // pruning): when a non-broadcastable join's build side carries a
    // selective filter, Spark's InjectRuntimeFilter rule pushes a bloom
    // filter of the build-side keys into the fact side's stage, dropping
    // non-joining rows BEFORE the exchange. The engine's joins are plain
    // declarative equi-joins precisely so this rule can fire — pin that
    // the shape stays acceptable, with the production size thresholds
    // scaled down to test data (the application side normally must scan
    // ≥ 10 GB for the filter to pay for itself — exactly the 100 TB
    // situation, never the sf0.001 one).
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "-1") // fact side too big to broadcast
      val li = sources.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val sel = sources.Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 400000.0).select(col("o_orderkey"))
      val opt = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"runtime bloom filter not injected into the fact side:\n$opt")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("q_text_bm25: bounded top-k per query, corpus stats broadcast once") {
    val opt = q("q_text_bm25").queryExecution.optimizedPlan.toString
    // the rank must lower to the bounded operator — a raw window rank
    // would shuffle every (query, doc) score instead of <= k per
    // partition per query
    assert(opt.contains("TopKPerKey"), s"rewrite lost:\n$opt")
    val p = plan("q_text_bm25")
    // N/avgdl attach as a 1-row broadcast, never a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"corpus stats must broadcast:\n$p")
  }

  test("q_dedup_semantic: shuffle-hash vector attach, no corpus broadcast, bounded probe rank") {
    // the probe table is localCheckpoint'ed inside the query (three
    // consumers), so its rank isn't visible in the final plan — pin the
    // bounded TopKPerKey on the probe-assign builder itself
    val e = sources.Tables.embeddings(spark, sf)
    val probeOpt = operators.Similarity.ivfProbeAssign(
      e, "vec_id", "embedding", nCells = 32, trainIters = 0, nProbe = 3)
      .queryExecution.optimizedPlan.toString
    assert(probeOpt.contains("TopKPerKey"),
      s"probe ranking must lower to the bounded operator:\n$probeOpt")
    // the wide vector rows attach via shuffle-hash joins (the 30x-probe
    // lesson: an SMJ would sort pair rows carrying 64-float payloads)
    val p = plan("q_dedup_semantic")
    assert(p.contains("ShuffledHashJoin"),
      s"vector re-attach must be a shuffle-hash join:\n$p")
    // with auto-broadcast off (the 100 TB situation) the only broadcasts
    // left are the explicit bounded centroid tables — the corpus itself
    // must flow through shuffles
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p2 = plan("q_dedup_semantic")
      assert(p2.contains("ShuffledHashJoin"),
        s"attach joins must survive a non-broadcastable corpus:\n$p2")
    } finally spark.conf.set(key, prev)
  }

  test("q_mix_domains: fact side streams through a broadcast rate join") {
    // phase-2 membership must join the per-source rates TO the fact
    // side as a broadcast — shuffling documents to meet a 20-row rate
    // table would be the wrong side at any scale
    val p = plan("q_mix_domains")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"rates must broadcast:\n$p")
  }

  test("q_similarity_ann never broadcasts the embeddings corpus") {
    // no broadcast HINT anywhere: the corpus is unbounded, so any forced
    // broadcast of it is a scale-killer regardless of what the planner
    // does on tiny test data
    val opt = q("q_similarity_ann").queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("broadcast"),
      s"q_similarity_ann must not carry broadcast hints:\n$opt")
    // and when the corpus is too big to auto-broadcast (threshold off,
    // the 100 TB situation), the whole plan degrades to shuffle joins
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("q_similarity_ann")
      assert(!p.contains("BroadcastExchange") && !p.contains("BroadcastHashJoin"),
        s"vector re-attach must survive a non-broadcastable corpus:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("q_join_interval: overlap join is hash-equi on the hour cell, never nested-loop") {
    // the point of the cell rewrite: an interval theta join that plans
    // as an equi-join, with no broadcast-nested-loop or cartesian —
    // the shape that survives when BOTH interval sets are huge
    val p = plan("q_join_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"interval overlap must stay an equi-join on the cell:\n$p")
  }

  test("q_graph_triangles: wedges evaluated in-projection, no nested-loop joins") {
    // degree-oriented adjacency intersection: every join in the plan is
    // an equi-join on a node key; the 41M wedge pairs (sf0.1) exist only
    // inside array_intersect, never as join output rows
    val p = plan("q_graph_triangles")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"triangle counting must never plan a nested-loop join:\n$p")
    // r13: witnesses come from the packed merge-scan intersect (the
    // varint-delta adjacency attach); the arrays must also actually
    // ride the shuffle packed, i.e. no unpacked array_intersect left
    assert(p.contains("packedintersectvals") || p.contains("packed_intersect"),
      s"witness sets must come from the packed in-projection intersection:\n$p")
    assert(!p.contains("array_intersect"),
      s"an unpacked array_intersect would ship 8 B/neighbor through the attach:\n$p")
  }

  test("q_graph_jaccard: common counts in-projection, top-20 bounded") {
    // the edge-restricted form: common-neighbor counts exist only
    // inside the packed merge-scan intersect (a wedge shuffle OOM'd the
    // 10× probe and was rejected); the top-20 never global-sorts
    val p = plan("q_graph_jaccard")
    assert(p.contains("packedintersectcount") || p.contains("packed_intersect_count"),
      s"common counts must come from the packed in-projection intersection:\n$p")
    assert(!p.contains("array_intersect"),
      s"an unpacked array_intersect would ship 8 B/neighbor through the attach:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must plan as TakeOrderedAndProject:\n$p")
  }

  test("q_text_pmi: top-50 bounded, no global sort") {
    val p = plan("q_text_pmi")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must plan as TakeOrderedAndProject:\n$p")
  }

  test("q_embed_pca: the sample moment join broadcasts (no shuffle of products)") {
    // the plan under audit is the scoring projection; the moment join
    // runs eagerly at build time — audit it directly
    val e = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col("vec_id"), (col("p") + 1).as("i"),
        col("xf").cast("double").as("xi"))
    val j = e.join(broadcast(e.select(col("vec_id"), col("i").as("j"),
      col("xi").as("xj"))), "vec_id")
      .groupBy(col("i"), col("j")).count()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the d² moment pass must broadcast the sample side:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"moment aggregate must map-combine:\n$p")
  }

  test("q_agg_histogram: one map-combined aggregate over the fact scan") {
    val p = plan("q_agg_histogram")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"bucket counts must partial-aggregate map-side:\n$p")
  }

  test("table stats NDV auto-switch: no Expand above the threshold, exact below") {
    // r10 verdict item 7: above NdvExactMaxN the ANALYZE pass swaps
    // exact count(DISTINCT) for approx_count_distinct and the N×
    // Expand row multiplier must leave the plan; below it the exact
    // form stays (the oracled gate regime). Forced via the exactMax
    // parameter at fixture scale.
    val approx = operators.Maintenance.tableStatsPlan(spark, sf, exactMax = 0L)
    val pApprox = approx.queryExecution.executedPlan.toString
    assert(!pApprox.contains("Expand"),
      s"approx NDV pass must not plan through Expand:\n$pApprox")
    val exact = operators.Maintenance.tableStatsPlan(spark, sf,
      exactMax = Long.MaxValue)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"),
      "exact NDV pass (the oracled exemplar) plans through Expand")
    // the switch changes ONLY ndv, and approx ndv stays within the
    // HLL envelope of exact (default rsd 0.05 ⇒ 15% is the 3σ bound;
    // measured worst at this fixture: l_quantity 47 vs 50 = 6%)
    val eRows = exact.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val aRows = approx.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(eRows.keySet == aRows.keySet)
    eRows.foreach { case (c, (n, nn, ndv, mn, mx)) =>
      val (an, ann, andv, amn, amx) = aRows(c)
      assert((n, nn, mn, mx) == ((an, ann, amn, amx)), s"$c non-ndv drift")
      assert(math.abs(andv - ndv).toDouble / math.max(ndv, 1L) < 0.15,
        s"$c approx ndv $andv vs exact $ndv")
    }
  }

  test("table stats feed the CBO: ANALYZE flips a 3-way join order") {
    // Closes the q_table_stats loop (Maintenance.scala): the ANALYZE
    // pass that query exemplifies is consumed here by Spark's
    // cost-based optimizer. Without catalog statistics,
    // CostBasedJoinReorder is inapplicable (it requires a rowCount on
    // every join item) and the optimized plan keeps the USER's join
    // order — the selective supplier dim joined LAST. With the stats
    // in the catalog, the cardinality model (|L|·|R| / max ndv) puts
    // the selective join first, shrinking the intermediate ~5× before
    // the wide dim attaches. At 100 TB this reorder is the difference
    // between shuffling the raw fact table twice and once.
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.get(k))
    val li = sources.Tables.lineitem(spark, sf)
    try {
      keys.foreach(spark.conf.set(_, "true"))
      li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .write.mode("overwrite").saveAsTable("cbo_fact")
      li.select(col("l_partkey").as("pk")).distinct()
        .write.mode("overwrite").saveAsTable("cbo_dim_part")
      // the SELECTIVE dim: 2 of the ~10 suppliers survive
      li.select(col("l_suppkey").as("sk")).distinct()
        .filter(col("sk") <= 2)
        .write.mode("overwrite").saveAsTable("cbo_dim_supp")
      val sql =
        """SELECT count(*) AS n
          |FROM cbo_fact f
          |JOIN cbo_dim_part p ON f.l_partkey = p.pk
          |JOIN cbo_dim_supp s ON f.l_suppkey = s.sk""".stripMargin
      def joinOrder(): (Int, Int) = {
        val opt = spark.sql(sql).queryExecution.optimizedPlan.toString
        (opt.indexOf("cbo_dim_part"), opt.indexOf("cbo_dim_supp"))
      }
      val (pNo, sNo) = joinOrder()
      assert(pNo >= 0 && sNo >= 0)
      assert(pNo < sNo,
        "without stats the optimizer must keep the user's join order " +
          s"(part dim first): part@$pNo supp@$sNo")
      for (t <- Seq("cbo_fact", "cbo_dim_part", "cbo_dim_supp"))
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      val (pYes, sYes) = joinOrder()
      assert(sYes < pYes,
        "with ANALYZE statistics the CBO must join the selective " +
          s"supplier dim first: part@$pYes supp@$sYes")
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
      for (t <- Seq("cbo_fact", "cbo_dim_part", "cbo_dim_supp"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("AQE OptimizeSkewedJoin splits a genuinely skewed SMJ partition at runtime") {
    // q_join_skew_salted pins the PLANNED fix (manual salting); a
    // 100 TB deploy also leans on the AUTOMATIC mechanism — AQE
    // detecting a skewed shuffle partition from runtime stats and
    // splitting it. Staged here: 90% of the fact lands on one key, the
    // dim is too big to broadcast under the test thresholds, and the
    // skew thresholds are scaled to fixture size (defaults trigger at
    // 256 MB — the FACTOR x median rule is what's under test, not the
    // absolute cutoff).
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.range(0, 200000).select(
        when(pmod(col("id"), lit(10L)) =!= 0L, lit(0L))
          .otherwise(pmod(col("id"), lit(97L))).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 97).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      // terminal GLOBAL aggregate: tiny result, and its partial/final
      // split has no hash-partitioning requirement on k — a keyed agg
      // downstream would let AQE veto the split as introducing an
      // extra shuffle (a filter won't do: it gets pushed below the
      // join and deflates the skew)
      val j = fact.join(dim, "k").agg(sum(col("v") + col("w")).as("t"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"),
        "fixture must force a shuffle join (broadcast disabled):\n" + p)
      assert(p.contains("skew=true"),
        "AQE must mark the skewed partition split (skew=true):\n" + p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
