package graft

import org.apache.spark.sql.SparkSession

/** Per-query shuffle-partition posture (SURVEY §4; r11 verdict item 1).
  *
  * A session-global `spark.sql.shuffle.partitions` is the wrong shape
  * for a library: the measured 30×-probe A/B (SCALEPROBE r11) showed
  * big single-pass shuffles want partitions ∝ input data
  * (`q_graph_jaccard` 145.4 → 68.5 s at p128 — the "superlinearity"
  * was spill), while iterative loops get WORSE with more partitions
  * (`q_graph_mst` 70.5 → 195.8 s: rounds × per-task overhead on a
  * shrinking state table) and output-bound band joins pay pure
  * scheduling overhead (`q_join_range_binned` 145 → 290 s). The
  * reference's substrate makes the same call — Dask sizes partitions
  * from the DATA, one partition per day of timeseries
  * (coiled/dask-lambda-example `layer/python/dask_processing.py:31`).
  *
  * So partition count is a PER-QUERY hint, not an env knob: a
  * [[QueryDef]] whose dominant cost is one data-proportional shuffle
  * carries a [[ScaledShuffle]] hint naming its input tables and a
  * measured bytes-per-partition calibration; everything else (tiny
  * shuffles, iterative loops, output-bound bands) stays on the
  * cores-sized session default. The hint is applied as AQE's
  * `initialPartitionNum`, NOT `shuffle.partitions`: AQE can merge
  * small post-shuffle partitions back down (so small SFs see the same
  * coalesced plans as before) but can never SPLIT an oversized
  * non-skewed one — the initial count is the only spill lever.
  */
sealed trait PartitionHint

/** Partitions = clamp(Σ input-table scan bytes / bytesPerPartition,
  * [session default, MaxPartitions]).
  *
  * `bytesPerPartition` is per-SHAPE, not 64 MB of scan: it encodes the
  * query's measured shuffle amplification (a self-join that explodes
  * 11 MB of snappy parquet into ~GBs of shuffled pairs wants far less
  * scan per partition than a map-combined aggregate). Calibrate from a
  * probe A/B and cite the measurement at the hint site.
  */
final case class ScaledShuffle(tables: Seq[String],
                               bytesPerPartition: Long) extends PartitionHint

object Partitioning {

  val InitialPartitionNumKey =
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** Upper clamp — a runaway size estimate must not schedule millions
    * of tasks; 4096 initial partitions saturate any single job this
    * library plans before per-task overhead dominates. */
  val MaxPartitions = 4096

  /** The pure sizing rule, separated so the spec can pin it without
    * filesystem fixtures: never below the session default (small
    * inputs keep today's plans — AQE coalescing makes extra initial
    * partitions free, missing ones are unrecoverable), never above
    * [[MaxPartitions]]. */
  def scaledCount(bytes: Long, bytesPerPartition: Long, base: Int): Int = {
    require(bytesPerPartition > 0, "bytesPerPartition must be positive")
    val n = math.ceil(bytes.toDouble / bytesPerPartition).toLong
    math.max(base.toLong, math.min(MaxPartitions.toLong, n)).toInt
  }

  // per-(dir, table) listing cache: Bench runs every query twice and
  // the sizes are immutable test fixtures / append-only lake dirs
  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total on-disk bytes of `dir/table.parquet` (file OR directory —
    * Hadoop ContentSummary sums recursively), via the session's Hadoop
    * conf so the same call sizes local test data and an s3a lake.
    * ANY listing failure counts as 0 (⇒ the clamp returns the session
    * default): a sizing hint must never turn a runnable query into a
    * failing one, and cloud filesystems surface auth/URI problems as
    * non-IO exceptions too, so the net is NonFatal, not IOException.
    * Successful sizes are cached for the session lifetime — right for
    * immutable fixtures and per-job submits; a FAILED lookup is NOT
    * cached, so a transient listing error is retried on the next query
    * instead of silently disabling the hint for the whole session. A
    * long-lived service over a growing lake should invalidate per
    * batch. */
  def tableBytes(spark: SparkSession, dir: String, table: String): Long = {
    val key = s"$dir/$table.parquet"
    val cached = sizeCache.get(key)
    if (cached != null) cached.longValue()
    else {
      try {
        val path = new org.apache.hadoop.fs.Path(key)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bytes = fs.getContentSummary(path).getLength
        sizeCache.put(key, bytes)
        bytes
      } catch { case scala.util.control.NonFatal(_) => 0L }
    }
  }

  def derive(spark: SparkSession, dir: String, hint: PartitionHint): Int =
    hint match {
      case ScaledShuffle(tables, bpp) =>
        val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
        scaledCount(tables.map(tableBytes(spark, dir, _)).sum, bpp, base)
    }

  /** Applied by the SparkEntry wrapper around EVERY query: hinted
    * queries get their derived initial count, unhinted ones get the
    * conf UNSET (⇒ falls back to `shuffle.partitions`), so a hint can
    * never leak into the next query through the shared session. */
  def applyHint(spark: SparkSession, dir: String,
                hint: Option[PartitionHint]): Unit = hint match {
    case Some(h) =>
      spark.conf.set(InitialPartitionNumKey, derive(spark, dir, h).toString)
    case None => spark.conf.unset(InitialPartitionNumKey)
  }
}
