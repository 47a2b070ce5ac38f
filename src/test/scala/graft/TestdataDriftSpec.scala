package graft

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types.TimestampType

/** Testdata-encoding canary. The driver regenerates the testdata each
  * round and its writer has drifted twice already: round 4 (timestamp
  * conf race) and round 5, when `events.ts` silently changed from
  * int64 TIMESTAMP(NANOS) to timestamp[us] without timezone and broke
  * seven streaming queries. This spec reads the parquet FOOTERS and
  * fails in one line, naming observed vs understood encodings, the
  * moment the writer drifts again — so the fix starts at the canary,
  * not at a pile of red downstream queries.
  */
class TestdataDriftSpec extends SparkSpec {

  /** (physicalType, logicalAnnotation) of a column from the footer. */
  private def footerType(table: String, col: String)
      : (PrimitiveTypeName, Option[LogicalTypeAnnotation]) = {
    val conf = spark.sessionState.newHadoopConf()
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet"), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val t = schema.getFields.get(schema.getFieldIndex(col))
        .asPrimitiveType()
      (t.getPrimitiveTypeName, Option(t.getLogicalTypeAnnotation))
    } finally reader.close()
  }

  private def describe(t: (PrimitiveTypeName, Option[LogicalTypeAnnotation])) =
    s"${t._1}/${t._2.map(_.toString).getOrElse("<no-annotation>")}"

  /** An encoding [[Tables.normalizeTs]] knows how to canonicalize:
    * int64 carrying a TIMESTAMP annotation of any unit/adjustment
    * (nanos surface as LongType under the legacy conf, micros/millis
    * as TIMESTAMP or TIMESTAMP_NTZ) or bare int64 epoch values. */
  private def understood(
      t: (PrimitiveTypeName, Option[LogicalTypeAnnotation])): Boolean =
    t._1 == PrimitiveTypeName.INT64 && (t._2 match {
      case None => true
      case Some(_: TimestampLogicalTypeAnnotation) => true
      case _ => false
    })

  test("events.ts parquet encoding is one Tables.normalizeTs understands") {
    val t = footerType("events", "ts")
    assert(understood(t),
      s"events.ts drifted AGAIN: observed ${describe(t)}; understood: " +
        "int64 + TIMESTAMP(NANOS|MICROS|MILLIS, utc or not) or bare " +
        "int64 — extend Tables.normalizeTs and restage streaming inputs")
    // and normalization actually lands on canonical tz-adjusted micros
    assert(Tables(spark, sfDir, "events").schema("ts").dataType ==
      TimestampType)
  }

  test("nanos-encoded events (the pre-r5 encoding) still normalize, " +
    "and registerAll lands the view on the CALLER's session") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = tmpDir("nanosfix")
    Tables.names.foreach { n =>
      Files.copy(Paths.get(sfDir, s"$n.parquet"),
        Paths.get(dir, s"$n.parquet"))
    }
    Files.copy(Paths.get("src/test/resources/events_nanos.parquet"),
      Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // the fallback path: bare read rejects TIMESTAMP(NANOS), the child
    // session's legacy-long surface kicks in, normalizeTs truncates
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 200)
    // the re-rooted view is visible in the CALLER's catalog even
    // though the frame is bound to the fallback child session
    Tables.registerAll(spark, dir)
    assert(spark.sql("SELECT count(*) AS c FROM events")
      .head().getLong(0) == 200)
    assert(spark.sql("SELECT count(*) AS c FROM region")
      .head().getLong(0) > 0)
    Tables.names.foreach(n => spark.catalog.dropTempView(n))
  }

  test("orders/lineitem temporal columns keep an int64 timestamp encoding") {
    for ((table, col) <- Seq("orders" -> "o_orderdate",
        "lineitem" -> "l_shipdate")) {
      val t = footerType(table, col)
      assert(understood(t),
        s"$table.$col drifted: observed ${describe(t)}; every oracle SQL " +
          "comparing this column assumes an int64 timestamp/date-like " +
          "encoding readable identically by Spark and DuckDB")
    }
  }
}
