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
  /** Ordered registry; families contribute their query maps. A duplicate
    * name across families would silently drop a query (and its oracle)
    * at the .toMap in SparkEntry, shrinking declared coverage with no
    * signal — so uniqueness is asserted here, once, on first access. */
  lazy val all: Seq[(String, QueryDef)] = {
    val defs = allDefs
    val dups = defs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  private def allDefs: Seq[(String, QueryDef)] =
    queries.CoreQueries.defs ++
      queries.ExtendedQueries.defs ++
      queries.JoinQueries.defs ++
      queries.FunctionQueries.defs ++
      queries.PipelineQueries.defs ++
      queries.DedupQueries.defs ++
      queries.SimilarityQueries.defs ++
      queries.TextQueries.defs ++
      queries.StreamingQueries.defs ++
      queries.MultimodalQueries.defs ++
      queries.SamplingQueries.defs ++
      queries.SourceQueries.defs ++
      queries.ClusterQueries.defs ++
      queries.ProfileQueries.defs ++
      queries.AnalyticsQueries.defs ++
      queries.PrepQueries.defs ++
      queries.CurationQueries.defs ++
      queries.CapstoneQueries.defs ++
      queries.DiagQueries.defs
}
