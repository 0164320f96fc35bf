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
}
