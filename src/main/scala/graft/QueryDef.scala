package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2.
  *
  * `fn` builds the DataFrame against the parquet tables under `sfDir`
  * (see TESTDATA.md / FIXTURES.md). `oracle`, when present, is the
  * equivalent ANSI SQL that DuckDB runs over the same parquet files for
  * the driver's hash-compare; queries without an oracle get a weaker
  * rows-only check.
  *
  * Determinism rules (SURVEY.md §5/§7): every oracled query ends in a
  * total-order `ORDER BY`, floating aggregates are `round`ed on BOTH
  * sides, collected lists are sorted and stringified, and raw `ts`
  * columns are truncated/bucketed before comparison (parquet ns vs µs).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Shuffle-partition posture for data-proportional shuffles — see
      * [[Partitioning]]. None = the cores-sized session default. */
    hint: Option[PartitionHint] = None)

object Registry {
  /** All declared queries, assembled from the per-module registries. */
  def all: Seq[QueryDef] =
    operators.Flagship.defs ++
      operators.TierA.defs ++
      operators.Relational.defs ++
      operators.Analytics.defs ++
      operators.TpchReports.defs ++
      operators.TpchReports2.defs ++
      operators.Aggregates.defs ++
      operators.Windows.defs ++
      operators.SetOps.defs ++
      operators.TopK.defs ++
      operators.Skew.defs ++
      operators.Reshape.defs ++
      functions.Scalars.defs ++
      functions.Scalars2.defs ++
      functions.Extensions.defs ++
      sources.Timeseries.defs ++
      streaming.Streams.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.TextAnalysis.defs ++
      operators.TextSimilarity.defs ++
      operators.Retrieval.defs ++
      operators.Multimodal.defs ++
      operators.Curation.defs ++
      operators.Maintenance.defs ++
      operators.Graph.defs ++
      operators.SeriesOps.defs ++
      operators.TypedOps.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
