package graft

import org.apache.spark.sql.SparkSession

/** One place to build sessions so Verify / Bench / tests agree on config.
  *
  * Notable settings:
  *  - `nanosAsLong`: the `events` table carries parquet TIMESTAMP(NANOS)
  *    (FIXTURES.md §B), which Spark 4 rejects by default; with this flag
  *    it reads as a nanos-since-epoch long that [[sources.Tables.events]]
  *    normalizes to a µs timestamp.
  *  - AQE on: runtime coalescing + skew-join handling is part of the
  *    100 TB posture (SURVEY §4).
  *  - shuffle.partitions sized to the local core count, not the 200
  *    default; on a real cluster this would be executors × cores.
  */
object Sessions {
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureConfigured(spark)
    spark
  }

  /** Object-store (s3a) posture for a 100 TB deployment. Local test runs
    * never touch S3, so these are NOT applied by [[build]] — they are the
    * documented, reviewed config a cluster submit adds via `--conf`, or
    * programmatically with `s3aDefaults.foreach { case (k, v) =>
    * builder.config(k, v) }`. Values are public Hadoop/Spark s3a guidance:
    *
    *  - magic committer: S3 has no atomic rename; the classic
    *    FileOutputCommitter either double-copies (v1) or is unsafe under
    *    failure (v2). The magic committer writes task output straight to
    *    the destination via multipart uploads that only complete on job
    *    commit — zero-rename, correct under task retry.
    *  - directory.marker.retention=keep: skips delete-marker churn on
    *    every directory write (safe on any post-3.3 Hadoop fleet).
    *  - block-size/readahead/maxConnections: parquet column chunks arrive
    *    via ranged GETs; 128M partitions + 1M readahead keeps a 1000-task
    *    scan from thrashing connections.
    *  - `fs.s3a.experimental.input.fadvise=random` belongs on clusters
    *    whose scans are parquet-dominated (columnar seeks, not full-file
    *    streams); left out of the defaults because it penalizes
    *    whole-file formats (CSV/JSON/binaryFile).
    */
  val s3aDefaults: Map[String, String] = Map(
    "spark.hadoop.fs.s3a.committer.name" -> "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled" -> "true",
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
    "spark.hadoop.fs.s3a.directory.marker.retention" -> "keep",
    "spark.hadoop.fs.s3a.block.size" -> "128M",
    "spark.hadoop.fs.s3a.readahead.range" -> "1M",
    "spark.hadoop.fs.s3a.connection.maximum" -> "200",
    "spark.hadoop.fs.s3a.fast.upload" -> "true",
    "spark.sql.files.maxPartitionBytes" -> "134217728")

  /** Idempotent per-session setup that also works on sessions built
    * OUTSIDE this library (e.g. a test harness's own SparkSession):
    * runtime-settable configs, native function registration, and the
    * custom strategy/rule via the public `spark.experimental` extension
    * points (GraftExtensions offers the spark.sql.extensions wiring as
    * the spark-submit alternative). Every declared query calls this, so
    * the library has no hidden session prerequisites. */
  def ensureConfigured(spark: SparkSession): Unit = {
    // nanosAsLong is runtime-settable; without it the events table's
    // TIMESTAMP(NANOS) column is rejected outright by Spark 4
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    functions.Functions.registerAll(spark)
    if (!spark.experimental.extraStrategies.contains(plans.TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ plans.TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(plans.RewriteRowNumberTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.RewriteRowNumberTopK
    }
  }
}
