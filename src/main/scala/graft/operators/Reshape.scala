package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Reshaping operators: pivot (long→wide), unpivot/melt (wide→long), and
  * the null-safe equality join. Pivot with an explicit value list stays a
  * single partial+final aggregation (no extra pass to discover values —
  * the form to use at scale); unpivot is a zero-shuffle Expand.
  */
object Reshape {

  val defs: Seq[QueryDef] = Seq(

    // Long→wide: per returnflag, one quantity-sum column per linestatus.
    QueryDef(
      "q_pivot",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("O", "F"))
          .agg(round(sum(col("l_quantity")), 2))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """SELECT l_returnflag,
          |       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
          |       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // Wide→long: melt the per-rate columns into (metric, rate) rows.
    QueryDef(
      "q_unpivot",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_discount"), col("l_tax"))
          .unpivot(
            ids = Array(col("l_orderkey"), col("l_linenumber")),
            values = Array(col("l_discount"), col("l_tax")),
            variableColumnName = "metric",
            valueColumnName = "rate")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
      },
      Some(
        """SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS rate
          |FROM lineitem
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_tax' AS metric, l_tax AS rate
          |FROM lineitem
          |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)
    ),

    // fillna / replace / dropna (the DataFrameNaFunctions surface — the
    // dd.fillna/dropna/replace parity ops). Nulls are manufactured from
    // real columns since the test tables carry none.
    QueryDef(
      "q_nulls_handling",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            nullif(col("o_orderstatus"), lit("O")).as("status_n"),
            when(col("o_totalprice") < 50000, lit(null).cast("double"))
              .otherwise(col("o_totalprice")).as("price_n"))
          .na.fill(Map("price_n" -> 0.0))
          .na.replace("status_n", Map("F" -> "finished"))
          .na.drop(Seq("status_n"))
          .orderBy(col("o_orderkey"))
      },
      Some(
        """SELECT o_orderkey,
          |       CASE WHEN nullif(o_orderstatus, 'O') = 'F' THEN 'finished'
          |            ELSE nullif(o_orderstatus, 'O') END AS status_n,
          |       CASE WHEN o_totalprice < 50000 THEN 0.0
          |            ELSE o_totalprice END AS price_n
          |FROM orders
          |WHERE nullif(o_orderstatus, 'O') IS NOT NULL
          |ORDER BY o_orderkey""".stripMargin)
    ),

    // Null-safe equality (<=>): nulls match nulls, unlike plain =.
    QueryDef(
      "q_join_nullsafe",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            nullif(col("l_returnflag"), lit("N")).as("flag"))
        val dim = li.select(col("flag")).distinct()
          .withColumn("flag_label", coalesce(col("flag"), lit("unflagged")))
        li.join(dim, li("flag") <=> dim("flag"))
          .select(col("l_orderkey"), col("l_linenumber"), col("flag_label"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some(
        """WITH li AS (
          |  SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'N') AS flag
          |  FROM lineitem),
          |dim AS (
          |  SELECT flag, coalesce(flag, 'unflagged') AS flag_label
          |  FROM (SELECT DISTINCT flag FROM li))
          |SELECT l_orderkey, l_linenumber, flag_label
          |FROM li JOIN dim ON li.flag IS NOT DISTINCT FROM dim.flag
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // Nested complex types through the parquet sink: build
    // struct/array/map columns, round-trip them through a real parquet
    // write + read, then flatten back out. The round-trip is identity,
    // so the oracle computes the flattened result straight from the
    // source — any nested-encoding corruption fails the hash.
    QueryDef(
      "q_nested_roundtrip",
      (s, dir) => {
        val out = graft.Staging.dir("q_nested_roundtrip")
        Tables.embeddings(s, dir)
          .select(col("vec_id"),
            struct(col("label").cast("long").as("lbl"),
              slice(col("embedding"), 1, 4).as("head4")).as("meta"),
            map(lit("dim"), size(col("embedding")).cast("long"),
              lit("lbl2"), col("label").cast("long") * 2).as("props"))
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .select(col("vec_id"),
            col("meta.lbl").as("lbl"),
            round(aggregate(transform(col("meta.head4"), x => x.cast("double")),
              lit(0.0), (a, v) => a + v), 6).as("head4_sum"),
            element_at(col("props"), "dim").as("dim"),
            element_at(col("props"), "lbl2").as("lbl2"))
          .orderBy(col("vec_id"))
      },
      Some(
        """SELECT vec_id, CAST(label AS BIGINT) AS lbl,
          |       round(list_sum(list_transform(embedding[1:4],
          |         x -> CAST(x AS DOUBLE))), 6) AS head4_sum,
          |       CAST(len(embedding) AS BIGINT) AS dim,
          |       CAST(label AS BIGINT) * 2 AS lbl2
          |FROM embeddings ORDER BY vec_id""".stripMargin)
    )
  )
}
