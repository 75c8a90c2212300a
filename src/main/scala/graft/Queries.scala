package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared-compatibility query (SURVEY.md §2.9): a Spark
  * realization + its DuckDB oracle SQL. Column names/order and row
  * order must match exactly between the two (the driver hash-compares).
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Queries {
  /** Populated by the per-module registries; SparkEntry exposes it. */
  def all: Seq[QDef] =
    queries.ScanQueries.defs ++
      queries.FilterQueries.defs ++
      queries.AggQueries.defs ++
      queries.MutationQueries.defs ++
      queries.StreamQueries.defs ++
      queries.ExtQueries.defs ++
      queries.PipelineQueries.defs ++
      queries.CodecQueries.defs ++
      queries.ReplayQueries.defs ++
      queries.FlowQueries.defs
}
