package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 that is SQL-expressible is declared in
  * `queries` with a matching DuckDB oracle in `oracleSql`; operators
  * whose semantics DuckDB can't mirror (MinHash signatures, LSH buckets,
  * …) are declared queries with a rows-only check and full ScalaTest
  * coverage instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all.map { case (name, q) => name -> q.build }.toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    QueryRegistry.all.collect {
      case (name, QueryDef(_, Some(sql), _)) => name -> sql
    }.toMap
}
