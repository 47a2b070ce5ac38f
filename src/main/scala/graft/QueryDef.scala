package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: a Spark build function over an sf
  * directory, plus (when SQL-expressible) the equivalent ANSI SQL the
  * driver runs in DuckDB on the same parquet tables. Column names in
  * the Spark result and the oracle SQL must match exactly — the
  * driver's compare sorts columns by name before hashing. */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryRegistry {
  /** Ordered registry; families contribute their query maps. */
  def all: Seq[(String, QueryDef)] =
    queries.CoreQueries.defs ++
      queries.ExtendedQueries.defs ++
      queries.JoinQueries.defs ++
      queries.FunctionQueries.defs ++
      queries.PipelineQueries.defs ++
      queries.DedupQueries.defs ++
      queries.SimilarityQueries.defs ++
      queries.TextQueries.defs ++
      queries.StreamingQueries.defs ++
      queries.MultimodalQueries.defs
}
