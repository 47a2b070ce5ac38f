package graft.model

import java.sql.Timestamp

/** Typed control-plane state (SURVEY.md §1.1). The reference keeps all of
  * this as untyped rows in PostgreSQL/metastore tables; here each is a
  * case class with an Encoder, stored in parquet-backed stores. */

/** One row of the key-value config relation `configurations.configvalues`
  * (`PostgresToDataLake_Ingestion_Notebook.py:68-75`,
  * `insert_Postgres_Configs.py:106-126`). */
final case class ConfigValue(
    group_name: String,
    config_name: String,
    config_value: String,
    is_active: Boolean,
    is_encrypt: Boolean = false)

/** Watermark state row, schema from the MERGE at `Ingest:373-414`.
  * Key is (systemType, databaseName, tableName-lowercased); id is a
  * deterministic hash of the key — the reference's MAX(id)+1 manual
  * sequence (`Ingest:368-369`) is race-prone under concurrent loads. */
final case class TableLoadDetail(
    tableloaddetailsid: Long,
    systemType: String,
    databaseName: String,
    tableName: String,
    lastLoadDate: Option[Timestamp],
    sqlCreatedDate: Timestamp,
    sqlUpdatedDate: Option[Timestamp])

/** One planned per-table ingestion job (C1 fan-out, `Ingest:446-451`). */
final case class TableJob(
    task: String,
    dbName: String,
    tableSpec: String)

/** Resolved source/sink naming for a table spec (S7, `Ingest:175-200`). */
final case class TablePaths(
    filePath: String,
    selectAllQuery: String,
    filterQueryTable: String,
    table: String)

/** Audit log entry (`Ingest:57,66,461,470,481` loglist accumulation). */
final case class LogEntry(message: String, count: Long)

/** Per-run outcome: table -> Right(rows written) | Left(error). */
final case class RunReport(results: Seq[(String, Either[String, Long])]) {
  def succeeded: Seq[String] = results.collect { case (t, Right(_)) => t }
  def failed: Seq[(String, String)] =
    results.collect { case (t, Left(e)) => (t, e) }
  /** `dbutils.notebook.exit` result map equivalent (`Ingest:489-490`). */
  def exitStatus: String =
    if (failed.isEmpty) "SUCCESS" else s"ERROR: ${failed.map(_._1).mkString(",")}"
}
