package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.B B12): for each left row, attach the payload of
  * the right row with the greatest `ts <= left.ts` within the same key —
  * the Dask/pandas `merge_asof(direction="backward")` semantics the
  * reference's substrate advertises.
  *
  * Spark has no built-in; rather than a nested-loop theta join (quadratic
  * per key), we union the two sides, tag them, and run one
  * `last(payload, ignoreNulls)` window over (key, ts) with right rows
  * ordered before left rows on ties — a single shuffle on the key, fully
  * codegen-able, O(n log n) per partition. At 100 TB this scales exactly
  * like any windowed aggregation: one exchange + sort, no row explosion;
  * skewed keys fall under AQE's skew handling like every other window.
  */
object AsOf {

  /** @param left      rows to enrich
    * @param right     lookup rows; must be unique per (key, ts) — pre-dedup
    *                  if not, or the tie-winner is ambiguous
    * @param key       equality key column name on both sides
    * @param ts        ordering column name on both sides
    * @param payload   column on `right` to carry over (null when no match)
    */
  def lastEarlier(left: DataFrame, right: DataFrame, key: String, ts: String,
                  payload: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(1)).withColumn(payload, lit(null).cast(
      right.schema(payload).dataType))
    val r = right.select(
      col(key), col(ts), lit(0).as("__tag"), col(payload))
    // right rows sort before left rows on equal ts, so `<=` matches win
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((leftCols.map(col) :+ col("__tag") :+ col(payload)): _*)
      .unionByName(r, allowMissingColumns = true)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag")
  }

  def lastEarlier(left: DataFrame, right: DataFrame, key: String, ts: String,
                  payload: Column, payloadName: String): DataFrame =
    lastEarlier(left, right.withColumn(payloadName, payload), key, ts, payloadName)

  /** `merge_asof(direction="backward", tolerance=Δ)`: the backward
    * match, NULLed when it lies more than `tolUs` microseconds before
    * the left row — the pandas/dask tolerance parameter (a sensor
    * reading too stale to attach is no match at all). Same single
    * key-shuffle running-frame shape as [[lastEarlier]]; the match's
    * own ts rides along in a struct (the [[nearest]] trick) so the
    * staleness test is one exact-µs projection — no second join, no
    * extra exchange. `ts` must be a timestamp column. */
  def lastEarlierWithin(left: DataFrame, right: DataFrame, key: String,
                        ts: String, payload: String,
                        tolUs: Long): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    val rpType = StructType(Seq(
      StructField("ts", right.schema(ts).dataType),
      StructField("p", right.schema(payload).dataType)))
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__rp", lit(null).cast(rpType))
    val r = right.select(col(key), col(ts), lit(0).as("__tag"),
      struct(col(ts).as("ts"), col(payload).as("p")).as("__rp"))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((leftCols.map(col) :+ col("__tag") :+ col("__rp")): _*)
      .unionByName(r, allowMissingColumns = true)
      .withColumn("__b", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .withColumn(payload,
        when(unix_micros(col(ts)) - unix_micros(col("__b.ts")) <= tolUs,
          col("__b.p")))
      .drop("__tag", "__rp", "__b")
  }

  /** `merge_asof(direction="forward")`: payload of the right row with the
    * SMALLEST `ts >= left.ts` within the key. Same single-shuffle window
    * shape as [[lastEarlier]], mirrored: the window runs as a RUNNING
    * frame over DESCENDING (ts, tag) order — the exact reverse of the
    * ascending total order, so `last` over it is row-for-row identical
    * to `first` over a currentRow..unboundedFollowing frame, which Spark
    * would evaluate by re-aggregating the remaining partition per row
    * (O(n²) per key; running frames accumulate in O(n)). On equal ts the
    * right row (tag 1) sorts ahead of the left row in the descending
    * order, so a same-instant match is still in frame (distance 0). */
  def firstLater(left: DataFrame, right: DataFrame, key: String, ts: String,
                 payload: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(0)).withColumn(payload, lit(null).cast(
      right.schema(payload).dataType))
    val r = right.select(col(key), col(ts), lit(1).as("__tag"), col(payload))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((leftCols.map(col) :+ col("__tag") :+ col(payload)): _*)
      .unionByName(r, allowMissingColumns = true)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .drop("__tag")
  }

  /** `merge_asof(direction="nearest")`: payload of the right row whose
    * `ts` is closest in either direction; exact ties go backward (the
    * pandas convention). Both directional candidates come from ONE
    * unioned, key-partitioned exchange — two running-frame window passes
    * (asc and desc sorts) over it, still a single shuffle. Right rows sort before left rows
    * on equal ts, so a same-instant match is found by the backward frame
    * at distance 0 and wins any tie. */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
              payload: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
    val leftCols = left.columns
    val tsType = right.schema(ts).dataType
    val rpType = StructType(Seq(
      StructField("ts", tsType), StructField("p", right.schema(payload).dataType)))
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__rp", lit(null).cast(rpType))
    val r = right.select(col(key), col(ts), lit(0).as("__tag"),
      struct(col(ts).as("ts"), col(payload).as("p")).as("__rp"))
    val base = Window.partitionBy(col(key)).orderBy(col(ts), col("__tag"))
    val wB = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward candidates via the reversed-order RUNNING frame (see
    // firstLater): same rows as currentRow..unboundedFollowing, O(n)
    // instead of O(n²) per key
    val wF = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exact integer distances for timestamps (µs) — a double cast could
    // collapse a 1 µs difference into a spurious tie
    def dist(a: Column, b: Column): Column = tsType match {
      case TimestampType => unix_micros(a) - unix_micros(b)
      case _ => a.cast("double") - b.cast("double")
    }
    l.select((leftCols.map(col) :+ col("__tag") :+ col("__rp")): _*)
      .unionByName(r, allowMissingColumns = true)
      .withColumn("__b", last(col("__rp"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__rp"), ignoreNulls = true).over(wF))
      .filter(col("__tag") === 1)
      .withColumn(payload,
        when(col("__f").isNull, col("__b.p"))
          .when(col("__b").isNull, col("__f.p"))
          .when(dist(col(ts), col("__b.ts")) <= dist(col("__f.ts"), col(ts)),
            col("__b.p"))
          .otherwise(col("__f.p")))
      .drop("__tag", "__rp", "__b", "__f")
  }
}
