package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}

/** Source abstraction (SURVEY.md §2.1 S1–S4). The reference reads
  * PostgreSQL via `.format("postgresql").option("query", …)`
  * (`Ingest:287-297`); production path here is plain Spark JDBC with the
  * same query pushdown, and the offline harness substitutes a
  * parquet-backed source with identical semantics (filters/projections
  * still push into the scan — structurally for parquet, remotely for
  * JDBC).
  */
trait Source {
  /** Full-table scan (`selectAllQuery`, P2). */
  def table(spark: SparkSession, table: String): DataFrame
}

/** Offline source: one parquet file/dir per table under a base dir. */
final class ParquetSource(baseDir: String) extends Source {
  def table(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$baseDir/$table.parquet")
}

/** Production JDBC source with query pushdown (S1). `partitionColumn`
  * parallelism is deliberately supported — the reference reads on a
  * single connection (`Ingest:291`, no partitionColumn), which is the
  * first thing that breaks at scale. */
final class JdbcSource(url: String, user: String, password: String,
    fetchSize: Int = 10000) extends Source {
  def table(spark: SparkSession, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("fetchsize", fetchSize)
      .load()

  def query(spark: SparkSession, sql: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("user", user).option("password", password)
      .option("fetchsize", fetchSize)
    partitionColumn match {
      case Some((col, lo, hi, n)) => base
        // Spark rejects `query` + `partitionColumn` together; the
        // partitioned form must go through a dbtable subquery alias.
        // Each of the n partitions issues the pushed-down query with
        // its own `col >= lo AND col < hi` range appended — n parallel
        // connections instead of the reference's single one.
        .option("dbtable", s"($sql) graft_subq")
        .option("partitionColumn", col).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n).load()
      case None => base.option("query", sql).load()
    }
  }
}

/** Lake table format (S4/S6): the reference writes Delta by default and
  * plain parquet for two task families (`Ingest:302-306`). Offline,
  * `Snapshot` supplies the Delta semantics from first principles —
  * [[graft.operators.Versioned]] manifest-log tables: atomic commits,
  * readers never see a half-written chunk, every ingest run time-
  * travelable, VACUUM/RESTORE/DESCRIBE HISTORY and the DSv2 catalog on
  * top. `Parquet` is the plain-dir form. */
sealed trait LakeFormat
object LakeFormat {
  case object Parquet extends LakeFormat
  case object Snapshot extends LakeFormat
}

/** Lake sink (S5/S6/S8, `Ingest:302-306`): parquet/snapshot tables with
  * append/overwrite modes and optional compaction coalesce. Reference
  * pins `coalesce(1)` — one file per chunk; ours makes N configurable
  * because a single writer task serializes the write at scale.
  *
  * Schema-evolution note (the reference sets `mergeSchema=true` on every
  * WRITE, `Ingest:304`): for parquet, `mergeSchema` is a READ option —
  * on a write it is silently inert. Each appended file simply carries
  * its own schema; the additive-evolution semantics the reference wants
  * live entirely on the read side, so they are implemented in
  * [[LakeReader]] and exercised by IngestSpec's evolution case. */
object LakeWriter {
  /** `bucket = Some((col, n))` commits a bucketed physical layout
    * (Snapshot format only): the write-time shuffle that buys every
    * subsequent co-bucketed join/aggregate the storage-partitioned
    * zero-exchange path. Bucketed writes skip the compaction coalesce —
    * commitBucketed's own repartition(n, bucket) IS the file-count
    * contract (one file per bucket per segment). */
  def write(df: DataFrame, path: String, mode: SaveMode,
      coalesceTo: Option[Int] = Some(1),
      format: LakeFormat = LakeFormat.Parquet,
      bucket: Option[(String, Int)] = None): Unit = {
    require(bucket.isEmpty || format == LakeFormat.Snapshot,
      "bucketed layout requires LakeFormat.Snapshot (the manifest " +
        "declares the layout; plain parquet dirs cannot)")
    val d =
      if (bucket.isDefined) df
      else coalesceTo.map(df.coalesce).getOrElse(df)
    format match {
      case LakeFormat.Parquet => d.write.mode(mode).parquet(path)
      case LakeFormat.Snapshot =>
        // SaveMode semantics against the snapshot log. ErrorIfExists
        // and Ignore ride the ATOMIC "create" commit mode: the
        // exists-check happens inside the commit CAS, so two racing
        // creators can never both think they created the table (the
        // former check-then-act probe let the loser destructively
        // overwrite the winner)
        def commit(m: String): Unit = bucket match {
          case Some((c, n)) =>
            graft.operators.Versioned.commitBucketed(d, path, c, n, m)
          case None => graft.operators.Versioned.commit(d, path, m)
        }
        mode match {
          case SaveMode.Append => commit("append")
          case SaveMode.Overwrite => commit("overwrite")
          case SaveMode.ErrorIfExists => commit("create")
          case SaveMode.Ignore =>
            try commit("create")
            catch { case _: graft.operators.Versioned.CreateConflict =>
              () } // no-op, per contract
        }
    }
  }
}

/** Lake read path (S3 re-read + the reference's additive schema
  * evolution): `mergeSchema=true` unions the schemas of every file in
  * the dir, so a chunk appended with a new column surfaces it
  * (NULL-filled for older files) — Delta's additive evolution, on
  * parquet. Footer-merge cost is per-FILE, not per-row, so it stays
  * negligible at 100 TB as long as chunk writes keep file counts sane
  * (LakeWriter's coalesce does). Snapshot tables read their LATEST
  * committed version (mergeSchema across segments built in). */
object LakeReader {
  /** `mergeSchema` applies to the Parquet form only; Snapshot tables
    * ALWAYS read the union schema across their committed segments
    * (additive evolution is part of the format's contract, so the
    * parameter is rejected rather than silently dropped). */
  def read(spark: SparkSession, path: String,
      mergeSchema: Boolean = true,
      format: LakeFormat = LakeFormat.Parquet): DataFrame = format match {
    case LakeFormat.Parquet =>
      spark.read.option("mergeSchema", mergeSchema.toString).parquet(path)
    case LakeFormat.Snapshot =>
      require(mergeSchema,
        "Snapshot tables always merge segment schemas; mergeSchema=false " +
          "is not supported for LakeFormat.Snapshot")
      graft.operators.Versioned.read(spark, path)
  }
}
