package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Event-time normalization. The driver's `events.parquet` encoding
    * has drifted across rounds — int64 TIMESTAMP(NANOS) (surfaces as
    * LongType under the legacy nanosAsLong conf), parquet timestamp[us]
    * without timezone (surfaces as TIMESTAMP_NTZ), or tz-adjusted
    * micros (TimestampType directly). All three normalize to the same
    * canonical tz-adjusted TimestampType `ts`: under the UTC session
    * the NTZ wall-clock IS the UTC instant, and nanos truncate to
    * micros (the same truncation DuckDB applies). Anything else is a
    * new drift — fail loudly rather than compute wrong event times.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts surfaced as $other — expected int64 nanos (LongType), " +
          "TIMESTAMP_NTZ (parquet timestamp[us] no tz) or TIMESTAMP; the " +
          "testdata encoding drifted again, extend Tables.normalizeTs")
    }

  /** Inferred-schema cache, keyed by (path, file length, mtime) — the
    * catalog role a lakehouse manifest plays at scale (guide §6: avoid
    * re-deriving metadata per query). `spark.read.parquet` with no
    * schema launches a footer-inference JOB on every call; across a
    * 221-query bench that is ~450 pure-overhead jobs (~40 ms each,
    * measured round 19), and at 100 TB schema inference over a
    * million-file table is a driver-side stall. The cache only skips
    * the INFERENCE — the returned frame is byte-identical (same
    * relation, same pushdown) and a testdata swap invalidates via the
    * (length, mtime) key. `events` is excluded: its encoding-drift
    * detection (normalizeTs + the nanos fallback) must re-run per
    * call by design. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name != "events") {
      val f = new java.io.File(path)
      if (f.isFile) {
        val key = (path, f.length(), f.lastModified())
        val schema = schemaCache.get(key) match {
          case null =>
            val s = spark.read.parquet(path).schema
            schemaCache.put(key, s)
            s
          case s => s
        }
        spark.read.schema(schema).parquet(path)
      } else spark.read.parquet(path) // directory tables: infer as before
    }
    else normalizeTs(
      try spark.read.parquet(path)
      catch {
        // ONLY the nanos-rejection is retried: TIMESTAMP(NANOS) is
        // refused by the parquet schema converter unless the legacy
        // long surface is enabled; scoped to a CHILD session —
        // mutating the shared session's conf is the race class that
        // broke f3/j4 in round 4. A missing file, corrupt footer or
        // permission error must surface with ITS OWN message, not a
        // secondary failure from a pointless retry.
        case e: Throwable
            if scala.util.control.NonFatal(e) && {
              val m = Option(e.getMessage).getOrElse("")
              m.contains("NANOS") || m.contains("nanosAsLong") ||
                m.contains("Illegal Parquet type")
            } =>
          val c = spark.newSession()
          c.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          c.read.parquet(path)
      })
  }

  /** Register every table as a temp view (the reference exposes staged
    * frames to SQL the same way, `Ingest:421`). When the nanos
    * fallback bound a frame to a child session, the view must still
    * land in the CALLER's catalog — re-root the analyzed plan; the
    * relation keeps its own (nanos-enabled) session for execution. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = apply(spark, dir, n)
      val local =
        if (df.sparkSession eq spark) df
        else org.apache.spark.sql.GraftShims.ofRows(spark,
          org.apache.spark.sql.GraftShims.planOf(df))
      local.createOrReplaceTempView(n)
    }
}
