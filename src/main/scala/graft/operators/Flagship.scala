package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** The reference's entire analytic, rebuilt Spark-first.
  *
  * Reference: `layer/python/dask_processing.py:29-33` — generate a
  * timeseries, `groupby("name").mean()`, select `y`, `.std()` (pandas
  * ddof=1 ⇒ sample std). Over the driver test tables the stand-ins are
  * `events.event_type` for `name` and `events.value` for `y`
  * (FIXTURES.md §B events).
  *
  * Spark shape: two-level aggregation. Level 1 is a hash aggregate with
  * map-side partial aggregation (`HashAggregateExec` partial → shuffle on
  * `event_type` → final); level 2 is a single-row global aggregate over
  * one row per group — at 100 TB the shuffle carries only
  * (n_group_keys × n_partitions) partial rows, so this plan scales with
  * group cardinality, not input rows.
  */
object Flagship {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_flagship",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(avg(col("value")).as("m"))
          .agg(round(stddev_samp(col("m")), 6).as("std_of_means"))
      },
      Some(
        """SELECT round(stddev_samp(m), 6) AS std_of_means
          |FROM (SELECT avg(value) AS m FROM events GROUP BY event_type)""".stripMargin)
    ),
    QueryDef(
      "q_scan_parquet",
      (s, dir) => {
        // Projection + predicate both reach the parquet scan (check
        // `.explain`: ReadSchema has 4 cols, PushedFilters has the GT).
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
          .filter(col("l_quantity") > 45)
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some(
        """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
          |FROM lineitem WHERE l_quantity > 45
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    )
  )
}
