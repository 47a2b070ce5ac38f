package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table registry over the driver-generated testdata
  * (TESTDATA.md). Plays the role of the reference's source scans
  * (`PostgresToDataLake_Ingestion_Notebook.py:287-297` JDBC scan,
  * `:347` parquet re-read) for the offline harness: one named table
  * per parquet file under an sf directory.
  *
  * Scale note: `spark.read.parquet` is a V2 FileScan — filters and
  * projections declared downstream are pushed into the scan by
  * Catalyst (verify via `.explain`: `PushedFilters`, `ReadSchema`).
  * At 100 TB the same call reads a partitioned directory tree; no
  * code change needed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    // rejects outright; read it as long nanos and truncate to micros (the
    // same truncation DuckDB applies), keeping TimestampType downstream.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register every table as a temp view (the reference exposes staged
    * frames to SQL the same way, `Ingest:421`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
