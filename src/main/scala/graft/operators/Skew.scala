package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting recipe (SURVEY §7 "salting for skewed keys") as a
  * reusable operator rather than folklore.
  *
  * For a join whose left side has heavily skewed keys: left rows get a
  * random-but-deterministic salt in [0, factor); the right side is
  * replicated `factor` times. The join key becomes (key, salt), so one
  * hot key spreads over `factor` reducers instead of melting one. Use
  * when AQE's skew-join split isn't available (non-SMJ plans, or
  * aggregations keyed on the hot column).
  *
  * Deterministic: the salt is `pmod(xxhash64(unique-ish cols), factor)`,
  * so replays partition identically.
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `key`, salted `factor` ways.
    * `saltSource` columns (from `left`) seed the deterministic salt —
    * pass something row-unique for even spread. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int, saltSource: Seq[String]): DataFrame = {
    require(factor >= 1)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(factor)))
    val replicated = right
      .withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
