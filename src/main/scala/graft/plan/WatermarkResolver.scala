package graft.plan

import org.apache.spark.sql.types.{DataType, DateType, StructType, TimestampNTZType, TimestampType}

/** Watermark-column resolution (SURVEY.md §2.8 C2,
  * `PostgresToDataLake_Ingestion_Notebook.py:149-170`).
  *
  * Order of precedence, exactly as the reference:
  *  1. explicit config `{task}_{table}_watermarks` — a comma list;
  *  2. otherwise *infer* from the schema by name prefix (string prefix,
  *     not regex — SURVEY §7 hard part (d)): timestamp columns whose
  *     name starts with created, modified, updated, lastmodified, log,
  *     or registration; date columns starting with merge or unmerge.
  *
  * Pure function of (config, schema) — unit-testable without Spark.
  */
object WatermarkResolver {

  private val TimestampPrefixes =
    Seq("created", "modified", "updated", "lastmodified", "log", "registration")
  private val DatePrefixes = Seq("merge", "unmerge")

  def configKey(task: String, table: String): String =
    s"${task.toLowerCase}_${table.toLowerCase}_watermarks"

  /** @param configured the config value for `configKey`, if present */
  def resolve(configured: Option[String], schema: StructType): Seq[String] =
    configured match {
      case Some(list) if list.trim.nonEmpty =>
        list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case _ => infer(schema)
    }

  /** The reference matches dtype=='timestamp' (`Ingest:164`); Spark 4
    * surfaces parquet isAdjustedToUTC=false as TIMESTAMP_NTZ, so both
    * flavors count as "timestamp" here. */
  private def isTimestamp(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  def infer(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if isTimestamp(f.dataType) &&
        TimestampPrefixes.exists(f.name.toLowerCase.startsWith) => f.name
      case f if f.dataType == DateType &&
        DatePrefixes.exists(f.name.toLowerCase.startsWith) => f.name
    }
}
