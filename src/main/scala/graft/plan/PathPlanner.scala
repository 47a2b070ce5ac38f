package graft.plan

import graft.model.TablePaths
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Source/sink naming resolution (SURVEY.md §2.1 S7,
  * `PostgresToDataLake_Ingestion_Notebook.py:175-200,443-445,460`).
  *
  * Handles the reference's three table-spec shapes:
  *  - `schema.table`  — explicit schema; lake dir named after table
  *  - `task__table`   — task-prefixed (tables shared across tasks get a
  *    `task__` prefix when inserted, `insert_Postgres_Configs.py:83-86`);
  *    source schema defaults to public, lake dir keeps the bare table
  *  - `table`         — bare; schema public
  *
  * The write path appends the run date as `yyyy/MM/dd` (`Ingest:460`);
  * `datePartitioned=true` swaps that for idiomatic
  * `partitionBy(year,month,day)` handled by the writer.
  */
object PathPlanner {

  def resolve(tableSpec: String, basePath: String,
      runDate: LocalDate): TablePaths = {
    val spec = tableSpec.trim.stripPrefix("\"").stripSuffix("\"")
    val (schema, table) =
      if (spec.contains(".")) {
        val parts = spec.split("\\.", 2)
        (parts(0), parts(1))
      } else if (spec.contains("__")) {
        val parts = spec.split("__", 2)
        ("public", parts(1))
      } else ("public", spec)

    val dateSuffix = runDate.format(DateTimeFormatter.ofPattern("yyyy/MM/dd"))
    val base = if (basePath.endsWith("/")) basePath else basePath + "/"
    TablePaths(
      filePath = s"$base${table.toLowerCase}/$dateSuffix",
      selectAllQuery = s"""SELECT * FROM $schema."$table"""",
      filterQueryTable = s"""$schema."$table"""",
      table = table)
  }
}
