package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the lake-maintenance pass the reference's
  * `coalesce(1)`-per-chunk write pattern (`Ingest:304,306`) makes
  * necessary over time: a year of daily chunk appends leaves hundreds
  * of files per table dir, and at 100 TB the per-file open/footer cost
  * dominates scan time long before data volume does.
  *
  * `compact` rewrites one directory to `targetFiles` files via the
  * staged-overwrite commit (write-new + dir swap — readers never see a
  * half-compacted dir). Partitioned tables compact per partition dir:
  * only partitions exceeding `maxFiles` are touched, so steady-state
  * compaction cost tracks the WRITE rate, not the table size.
  */
object Compaction {

  /** A `col=value` partition child dir. Hidden names (leading '.' or
    * '_': staging/backup siblings from staged rewrites, `_SUCCESS`-style
    * markers) are excluded, matching what Spark's FileIndex ignores —
    * a crash-leftover `.part=1.merge-staging` must never be compacted
    * or walked as if it were a partition. */
  private def isPartitionDir(s: org.apache.hadoop.fs.FileStatus): Boolean =
    s.isDirectory && s.getPath.getName.contains("=") &&
      !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_")

  /** Number of data files directly under `path`. */
  def fileCount(spark: SparkSession, path: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite the (unpartitioned) dir at `path` into `targetFiles`
    * parquet files. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
      targetFiles: Int = 1): (Int, Int) = {
    val before = fileCount(spark, path)
    if (before > targetFiles) {
      val df = spark.read.option("mergeSchema", "true").parquet(path)
        .coalesce(targetFiles)
      DataMerge.stagedOverwrite(spark, path, df, Nil)
    }
    (before, fileCount(spark, path))
  }

  /** Compact every `partCol=` child dir holding more than `maxFiles`
    * files down to `targetFiles`. Untouched partitions keep their
    * exact files. Returns the compacted partition dir names. */
  def compactPartitions(spark: SparkSession, path: String,
      maxFiles: Int, targetFiles: Int = 1): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(isPartitionDir)
      .map(_.getPath.toString)
    compactOver(spark, parts.toSeq, maxFiles, targetFiles)
      .map(p => new org.apache.hadoop.fs.Path(p).getName)
  }

  /** Run the per-dir check + compaction for each candidate dir on a
    * bounded driver pool: each compaction is its own small Spark JOB
    * over one partition's files, so serial submission pays
    * (#partitions × job latency) on an otherwise idle cluster — a
    * 10k-partition backlog must not take 10k round trips. Dirs are
    * disjoint and each staged overwrite stages under its own hidden
    * sibling, so the jobs are independent; the scheduler interleaves
    * them. Returns the compacted dirs in input order. */
  private def compactOver(spark: SparkSession, dirs: Seq[String],
      maxFiles: Int, targetFiles: Int): Seq[String] =
    DriverPar.map(dirs, maxThreads = 8) { d =>
      if (fileCount(spark, d) > maxFiles) {
        compact(spark, d, targetFiles)
        Some(d)
      } else None
    }.flatten

  /** LEAF partition dirs under `path`, any partition depth — the dirs
    * whose children are data files, not further `col=` dirs. A
    * multi-level table (the reference's y/m/d layout) compacts leaf by
    * leaf so untouched leaves keep their exact files. */
  def leafPartitionDirs(spark: SparkSession, path: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] = {
      val kids = fs.listStatus(p)
        .filter(isPartitionDir)
      if (kids.isEmpty) Seq(p.toString)
      else kids.toSeq.flatMap(k => walk(k.getPath))
    }
    val top = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(isPartitionDir)
    top.toSeq.flatMap(k => walk(k.getPath))
  }

  /** Compact every leaf partition dir (any depth) over `maxFiles` down
    * to `targetFiles`; returns the table-relative leaf paths touched.
    * Relativization QUALIFIES both sides first: `leafPartitionDirs`
    * hands back fully qualified URIs (`file:/...`, `hdfs://nn/...`),
    * so a plain `stripPrefix(path)` on an unqualified caller path
    * would be a silent no-op and leak absolute URIs as "relative"
    * names. */
  def compactLeaves(spark: SparkSession, path: String,
      maxFiles: Int, targetFiles: Int = 1): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val rootQ = fs.makeQualified(
      new org.apache.hadoop.fs.Path(path)).toString
    compactOver(spark, leafPartitionDirs(spark, path), maxFiles,
      targetFiles).map { d =>
      fs.makeQualified(new org.apache.hadoop.fs.Path(d)).toString
        .stripPrefix(rootQ).stripPrefix("/")
    }
  }
}
