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
