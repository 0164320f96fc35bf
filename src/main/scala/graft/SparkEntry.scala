package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * All declared queries live in [[Registry]] (one `QueryDef` per
  * implemented operator from SURVEY.md §2); this object just adapts them
  * to the driver's `queries` / `oracleSql` map shape.
  */
object SparkEntry {

  /** Flagship query (reference analytic, SURVEY §2 A6) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each query
    * self-configures the session (Sessions.ensureConfigured) so the
    * contract holds on ANY SparkSession the driver hands us. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        Sessions.ensureConfigured(s)
        // per-query shuffle-partition posture (set OR unset, so hints
        // never leak between queries on the shared session)
        Partitioning.applyHint(s, dir, q.hint)
        q.fn(s, dir)
      }
    }.toMap

  /** DuckDB-equivalent SQL per oracled query (driver hash-compare). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
