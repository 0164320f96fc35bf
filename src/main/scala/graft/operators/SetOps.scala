package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Sorts, limits, set operations, exact dedup (SURVEY §2.B B24-B28).
  *
  * Global sort range-partitions on the sort key (SortExec after a range
  * exchange); top-k plans as TakeOrderedAndProject — no global shuffle of
  * the full input, the per-partition top-k is merged on the driver. Both
  * survive scale-up; the thing to avoid is sorting when only top-k is
  * needed, so q_topk goes through `limit`.
  */
object SetOps {

  val defs: Seq[QueryDef] = Seq(

    // B24 — global sort by a non-key column with unique tiebreakers.
    QueryDef(
      "q_sort",
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
          .orderBy(col("value").desc, col("event_id"))
      },
      Some(
        """SELECT event_id, event_type, value FROM events
          |ORDER BY value DESC, event_id""".stripMargin)
    ),

    // B25 — top-k (TakeOrderedAndProjectExec, not a full sort).
    QueryDef(
      "q_topk",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
    ),

    // B26 — union (positional) + unionByName (schema-aligned).
    QueryDef(
      "q_union",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .select(col("c_nationkey").as("nk")).withColumn("side", lit("cust"))
        val sup = Tables.supplier(s, dir)
          .select(lit("supp").as("side"), col("s_nationkey").as("nk"))
        c.unionByName(sup) // different column order: ByName realigns
          .groupBy(col("nk"), col("side"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("nk"), col("side"))
      },
      Some(
        """SELECT nk, side, count(*) AS n FROM (
          |  SELECT c_nationkey AS nk, 'cust' AS side FROM customer
          |  UNION ALL
          |  SELECT s_nationkey AS nk, 'supp' AS side FROM supplier)
          |GROUP BY nk, side ORDER BY nk, side""".stripMargin)
    ),

    // B27 — intersect / except (distinct set semantics), tagged.
    QueryDef(
      "q_setops",
      (s, dir) => {
        val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
        val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
        val both = cn.intersect(sn).withColumn("tag", lit("both"))
        val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
        both.unionByName(custOnly).orderBy(col("nk"), col("tag"))
      },
      Some(
        """SELECT nk, 'both' AS tag FROM (
          |  SELECT c_nationkey AS nk FROM customer
          |  INTERSECT SELECT s_nationkey FROM supplier)
          |UNION ALL
          |SELECT nk, 'cust_only' AS tag FROM (
          |  SELECT c_nationkey AS nk FROM customer
          |  EXCEPT SELECT s_nationkey FROM supplier)
          |ORDER BY nk, tag""".stripMargin)
    ),

    // B27 — intersectAll / exceptAll (multiset semantics: copies
    // preserved), aggregated to (value, tag, n) so the duplicate counts
    // themselves are what's compared — intersectAll keeps
    // min(count_l, count_r) copies, exceptAll keeps count_l - count_r.
    QueryDef(
      "q_setops_all",
      (s, dir) => {
        val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
        val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
        val both = cn.intersectAll(sn).withColumn("tag", lit("both_all"))
        val diff = cn.exceptAll(sn).withColumn("tag", lit("cust_minus_supp"))
        both.unionByName(diff)
          .groupBy(col("nk"), col("tag"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("nk"), col("tag"))
      },
      Some(
        """SELECT nk, tag, count(*) AS n FROM (
          |  SELECT nk, 'both_all' AS tag FROM (
          |    SELECT c_nationkey AS nk FROM customer
          |    INTERSECT ALL SELECT s_nationkey FROM supplier)
          |  UNION ALL
          |  SELECT nk, 'cust_minus_supp' AS tag FROM (
          |    SELECT c_nationkey AS nk FROM customer
          |    EXCEPT ALL SELECT s_nationkey FROM supplier))
          |GROUP BY nk, tag ORDER BY nk, tag""".stripMargin)
    ),

    // B28/B45 — exact dedup with a deterministic representative (min id
    // per key); `dropDuplicates` keeps an arbitrary row, so the library
    // canonicalizes via groupBy — same plan shape, stable output.
    QueryDef(
      "q_dedup_exact",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(col("event_id")).as("keeper_id"), count(lit(1)).as("n_dups"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some(
        """SELECT user_id, event_type, min(event_id) AS keeper_id,
          |       count(*) AS n_dups
          |FROM events GROUP BY user_id, event_type
          |ORDER BY user_id, event_type""".stripMargin)
    )
  )
}
