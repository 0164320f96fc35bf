package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

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

  val defs: Seq[QueryDef] = Seq(

    // The salted join as a declared, oracled operator: semantically a
    // plain inner join (the oracle IS the plain join), physically spread
    // over `factor` reducers per key — so the correctness gate pins that
    // salting never changes results. The replicated side is the SMALL
    // one (supplier): factor× replication of a dimension is cheap, and
    // that asymmetry is exactly when salting beats letting one hot fact
    // key melt a reducer.
    QueryDef(
      "q_join_skew_salted",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
        val sup = Tables.supplier(s, dir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
        saltedJoin(li, sup, "l_suppkey", factor = 8,
            saltSource = Seq("l_orderkey", "l_linenumber"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some(
        """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, s_name
          |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    )
  )
}
