package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming depth beyond the declared queries: foreachBatch (the
  * idiomatic analog of the reference's per-file consumer Lambda,
  * `src/lambda_consumer.py:47-71` — arbitrary code per micro-batch) and
  * a watermarked stream-stream join. */
class Streams2Spec extends SparkSpec {

  private val schema =
    StructType.fromDDL("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts_us LONG")

  private def freshDir(name: String): String = {
    val p = s"/root/repo/target/tmp/streams2/$name"
    val dir = Paths.get(p)
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Files.createDirectories(dir)
    p
  }

  private def stageEvents(dir: String): Long = {
    val src = sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    src.write.mode("overwrite").json(dir)
    src.count()
  }

  test("foreachBatch: per-micro-batch consumer callback sees every row once") {
    val dir = freshDir("feb")
    val expected = stageEvents(dir)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.schema(schema).json(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the reference's consumer would 'read, massage, write to S3 etc'
        // here (dask_processing.py:26-27); we count as the side effect
        seen.addAndGet(batch.count())
        batches.incrementAndGet()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(seen.get() == expected)
    assert(batches.get() >= 1)
  }

  test("stream-stream join: purchases joined to same-user clicks within interval") {
    val dir = freshDir("ssj")
    stageEvents(dir)
    def side(tpe: String, userName: String, idName: String, tsName: String) =
      spark.readStream.schema(schema).json(dir)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(userName), col("event_id").as(idName),
          timestamp_micros(col("ts_us")).as(tsName))
        .withWatermark(tsName, "1 hour")
    val joined = side("purchase", "p_user", "purchase_id", "p_ts")
      .join(side("click", "c_user", "click_id", "c_ts"),
        expr("p_user = c_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 2 HOURS"))
    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ssj_sink").count()

    // batch equivalence
    val ev = sources.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val batch = p.join(c, col("user_id") === col("c_user") &&
      col("p_ts") >= col("c_ts") &&
      col("p_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS")).count()
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch > 0, "fixture should produce at least one purchase-click pair")
  }

  test("checkpoint restart: a second incarnation resumes exactly-once from the offset log") {
    // the failure-recovery contract a 100 TB/day pipeline lives on:
    // source offsets and the sink commit log live in the checkpoint, so
    // a job restarted with the same checkpoint + sink path emits every
    // input row exactly once ACROSS incarnations — already-committed
    // batches are never re-emitted, the un-read backlog is drained.
    import scala.jdk.CollectionConverters._
    val staged = freshDir("restart_staged")
    val src = sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
    src.repartition(8).write.mode("overwrite").json(staged)
    val expected = src.count()
    val parts = operators.Maintenance.listDir(Paths.get(staged))
      .filter(_.getFileName.toString.endsWith(".json")).sortBy(_.toString)
    assert(parts.length >= 2, "need a multi-file backlog to split across incarnations")
    val in = freshDir("restart_in")
    val sink = freshDir("restart_sink")
    val ckpt = freshDir("restart_ckpt")
    def copyIn(ps: Seq[java.nio.file.Path]): Unit = ps.foreach(p =>
      Files.copy(p, Paths.get(in, p.getFileName.toString)))
    def incarnation(): Unit = {
      val q = spark.readStream.schema(schema).json(in)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    copyIn(parts.take(1))
    incarnation() // first incarnation commits file 1, then terminates
    val afterFirst = spark.read.schema(schema).parquet(sink).count()
    assert(afterFirst > 0 && afterFirst < expected)
    copyIn(parts.drop(1))
    incarnation() // same checkpoint: must drain ONLY the new backlog
    val total = spark.read.schema(schema).parquet(sink).count()
    assert(total == expected,
      s"exactly-once across incarnations: got $total want $expected (first saw $afterFirst)")
  }

  test("session windows run unchanged on the RocksDB state store provider") {
    // the JVM-heap (HDFS-backed) provider caps state at executor memory;
    // RocksDB is the provider a 100 TB/day stream actually runs — state
    // lives off-heap/on-disk with incremental checkpoints. Results must
    // be provider-invariant, and the provider must really engage.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val defaultRows = q("q_stream_session").collect().map(_.toSeq).toSet
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rocksRows = q("q_stream_session").collect().map(_.toSeq).toSet
      assert(rocksRows == defaultRows,
        "session-window results must not depend on the state store provider")
      // a held query handle proves RocksDB engaged (provider-specific
      // state metrics appear in the operator progress)
      val dir = freshDir("rocks")
      stageEvents(dir)
      val agg = spark.readStream.schema(schema).json(dir)
        .select(timestamp_micros(col("ts_us")).as("ts"), col("user_id"))
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .count()
      val qh = agg.writeStream.format("memory").queryName("rocks_probe")
        .option("checkpointLocation", Staging.fastDir("rocks_probe_ckpt"))
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      qh.awaitTermination()
      val metricKeys = qh.lastProgress.stateOperators
        .flatMap(op => scala.jdk.CollectionConverters
          .MapHasAsScala(op.customMetrics).asScala.keys)
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"expected RocksDB state metrics, got: ${metricKeys.mkString(", ")}")
      spark.catalog.dropTempView("rocks_probe")
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  test("stream-static enrichment join is stateless and broadcast") {
    // q_stream_enrich's scale claim: the static-dimension join adds NO
    // stateful operator (only the downstream aggregate keeps state) and
    // the stream side never shuffles for it (broadcast join). A held
    // handle exposes both via progress + executed plan.
    val dir = freshDir("enrich")
    stageEvents(dir)
    val dim = sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = spark.readStream.schema(schema).json(dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"))
    val qh = enriched.writeStream.format("memory").queryName("enrich_probe")
      .option("checkpointLocation", Staging.fastDir("enrich_probe_ckpt"))
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    qh.awaitTermination()
    assert(qh.lastProgress.stateOperators.length == 1,
      "exactly one stateful operator: the aggregate, never the join")
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf))(qh.explain())
    val plan = buf.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"static dimension must broadcast:\n$plan")
    // and the streamed result equals the batch join over the same input
    val expect = spark.read.schema(schema).json(dir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = spark.table("enrich_probe")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect, s"stream-static join != batch join: $got vs $expect")
    spark.catalog.dropTempView("enrich_probe")
  }

  test("outer stream join: null rows only for state evicted below the final watermark") {
    val rows = q("q_stream_join_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(rows.exists(_._2.isEmpty), "outer path must actually emit")
    assert(rows.exists(_._2.isDefined), "inner path must actually emit")
    // recompute the final watermark (min of both sides' max ts − 4 h)
    // and every purchase's ts; null rows must sit strictly below it —
    // a purchase still inside the horizon must be withheld even if
    // unmatched (it could still match future input)
    val ev = sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val wm = math.min(
      ev.filter(_._2 == "purchase").map(_._3).max,
      ev.filter(_._2 == "click").map(_._3).max) - 4L * 3600L * 1000000L
    val pTs = ev.filter(_._2 == "purchase").map(t => t._1 -> t._3).toMap
    val nullEmits = rows.filter(_._2.isEmpty).map(_._1)
    assert(nullEmits.forall(id => pTs(id) < wm),
      "every null emission must be below the final watermark")
    val emitted = rows.map(_._1).toSet
    val withheld = pTs.filter { case (id, ts) => ts >= wm && !emitted(id) }
    assert(withheld.nonEmpty,
      "some unmatched in-horizon purchase must be withheld in state")
  }

  test("cdc apply: the streamed consumer's views equal the time-travel reads") {
    val applied = q("q_stream_cdc_apply").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // strictly ordered, contiguous versions — the in-order apply ran
    assert(applied.map(_._1).toSeq == applied.indices.map(_.toLong),
      s"versions must apply contiguously in order: ${applied.toSeq}")
    // cross-query pin: the consumer's view after each commit must
    // equal the snapshot reader's time travel to that version
    val snapshots = q("q_snapshot_txn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(applied.toSeq == snapshots.toSeq,
      "CDC apply must reconstruct exactly the snapshot history")
  }
}
