package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format breadth (SURVEY §2.1 S-family beyond parquet/JDBC):
  * CSV and JSON-lines read paths with explicit schemas, verified by
  * round-tripping a parquet table through the format and comparing
  * against the original via the DuckDB oracle. Staged files are
  * memoized per (JVM, sf dir) — the write is harness setup; the query
  * times the READ path.
  */
object SourceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private val stages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def staged(s: SparkSession, dir: String, table: String,
      format: String): String =
    stages.computeIfAbsent(s"$dir|$table|$format", { _ =>
      val out = java.nio.file.Files.createTempDirectory(s"src_$format")
        .toString + s"/$table"
      val w = t(s, dir, table).coalesce(1).write.mode("overwrite")
      (format match {
        case "csv" => w.option("header", "true")
        case _ => w
      }).format(format).save(out)
      out
    })

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- S13 CSV read with explicit schema (header, quoted fields —
    // commas in n_comment exercise the quote path)
    "s13_csv_roundtrip" -> QueryDef(
      (s, dir) => {
        val schema = t(s, dir, "nation").schema
        s.read.schema(schema).option("header", "true")
          .csv(staged(s, dir, "nation", "csv"))
      },
      Some("SELECT * FROM nation")),

    // ---- S14 JSON-lines read with explicit schema
    "s14_jsonl_roundtrip" -> QueryDef(
      (s, dir) => {
        val schema = t(s, dir, "supplier").schema
        s.read.schema(schema)
          .json(staged(s, dir, "supplier", "json"))
      },
      Some("SELECT * FROM supplier"))
  )
}
