package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-column file clustering — the lake-layout
  * pass that makes min/max file skipping work on MORE THAN ONE column.
  *
  * The reference partitions lake dirs by run date only
  * (`Ingest:460` — `…/yyyy/MM/dd`), so a predicate on any data column
  * reads every file of every matching day. Sorting files by one column
  * fixes skipping for that column and destroys it for all others. The
  * standard fix (Delta OPTIMIZE ZORDER, Hudi/Iceberg clustering) is a
  * space-filling curve: map each clustering column to a quantile bucket
  * id, interleave the bucket bits into a z-value, and range-partition +
  * sort files by z. Every clustered column's per-file min/max range then
  * shrinks to ~curve-cell size, so a range predicate on ANY of the
  * columns prunes most files via parquet footer stats.
  *
  * Scale shape (100 TB): boundaries come from one Greenwald–Knna
  * `approxQuantile` pass (driver result bounded by bucket count, never
  * data size); the z-value is pure codegen'd column arithmetic; the only
  * shuffle is the `repartitionByRange` every layout rewrite needs.
  * Quantile (not min/max-uniform) buckets make the curve skew-robust:
  * a hot key range gets more cells, not one overloaded cell.
  */
object Clustering {

  /** Sorted quantile cut points for `colName` (≤ buckets−1 values, deduped
    * for low-cardinality columns), from a one-pass GK sketch. */
  def boundaries(df: DataFrame, colName: String, buckets: Int): Array[Double] =
    boundariesAll(df, Seq(colName), buckets).head

  /** Cut points for ALL clustering columns from ONE GK pass — the
    * multi-column `approxQuantile` overload sketches every column in a
    * single scan, so boundary cost does not multiply with column count. */
  def boundariesAll(df: DataFrame, cols: Seq[String],
      buckets: Int): Seq[Array[Double]] = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    df.stat.approxQuantile(cols.toArray, probs, 0.001)
      .map(_.distinct.sorted).toSeq
  }

  /** 0-based bucket id of `c` given sorted cut points — the count of cut
    * points ≤ value (nulls → bucket 0, keeping them clustered together). */
  def bucketId(c: Column, cuts: Array[Double]): Column = {
    val arr = typedLit(cuts.toSeq)
    coalesce(size(filter(arr, b => c.cast("double") >= b)), lit(0)).cast("long")
  }

  /** Morton interleave: bit b of bucket column i lands at z-bit b*n + i,
    * so consecutive z-values alternate through all dimensions. Pure
    * shift/and/or — stays inside whole-stage codegen. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n * bits <= 62, s"z-value would overflow a long: $n cols x $bits bits")
    val terms = for {
      b <- 0 until bits
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** `df` plus a `__z` Morton code over `cols` (2^bits quantile buckets
    * per column). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 6): DataFrame = {
    val nb = 1 << bits
    val bucketCols = cols.zip(boundariesAll(df, cols, nb)).map {
      case (c, cuts) => bucketId(col(c), cuts)
    }
    df.withColumn("__z", interleave(bucketCols, bits))
  }

  /** Rewrite `df` to `path` as `files` parquet files clustered on `cols`:
    * range-partitioned and sorted by the z-value, which is dropped before
    * write (projection preserves the sort order into the file writer). */
  def clusterWrite(df: DataFrame, cols: Seq[String], path: String,
      files: Int, bits: Int = 6): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Mean per-file normalized span of `colName` across the files at
    * `path`: 0 ⇒ every file covers a point of the column's domain (ideal
    * for skipping), 1 ⇒ every file spans the whole domain (no file can
    * ever be skipped on this column). This is exactly the footer-stats
    * geometry a min/max-pruning reader sees. */
  def avgFileSpan(spark: SparkSession, path: String, colName: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg(min(col(colName)).cast("double"),
      max(col(colName)).cast("double")).head()
    val width = g.getDouble(1) - g.getDouble(0)
    if (width == 0) 0.0
    else df.groupBy(input_file_name())
      .agg(((max(col(colName)) - min(col(colName))) / width).as("span"))
      .agg(avg("span")).head().getDouble(0)
  }

  /** Number of files at `path` holding at least one row matching `pred` —
    * the file-touch count a perfectly min/max-pruned scan achieves. */
  def filesTouched(spark: SparkSession, path: String, pred: Column): Long =
    spark.read.parquet(path).where(pred)
      .select(input_file_name()).distinct().count()
}
