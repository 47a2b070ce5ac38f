package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate — the rollup-table
  * pattern the reference's consumers build downstream of its ingest
  * (`PostgresToDataLake_Ingestion_Notebook.py:329-415` lands raw chunks;
  * any BI layer then re-aggregates the WHOLE table every day). This
  * operator keeps a (keys → count + sums) aggregate table current by
  * folding in just the new chunk:
  *
  *  - the chunk is aggregated alone (map-side partial → one small
  *    shuffle on the group keys, sized by the CHUNK, not the table);
  *  - existing rows for touched groups are read back (semi-join; when
  *    the aggregate table is partitioned by a prefix of the keys this
  *    read is partition-pruned), combined by summing counts-with-counts
  *    and sums-with-sums — valid because count and sum are commutative
  *    monoids, the same algebra Spark's own partial aggregation uses;
  *  - the merged groups are upserted via [[DataMerge]]: partition-
  *    scoped when partitioned (untouched partitions keep their exact
  *    files), staged-overwrite otherwise.
  *
  * At 100 TB the win is the usual incremental-view one: a day's chunk
  * touches a handful of partition keys, so maintenance cost tracks the
  * CHUNK size while full recompute tracks the TABLE size.
  *
  * Sums should be exact types (integers or decimals): decimal partial
  * sums re-summed per group equal the one-shot sum exactly, order-
  * independent, so the incrementally-maintained table is bit-identical
  * to a full recompute (IncrementalAggSpec proves this; im1's oracle
  * IS a full recompute). Double sums would drift by summation order.
  */
object IncrementalAgg {

  /** Fold `chunk` into the aggregate table at `path`. `countAs` is the
    * row-count column; `sums` maps source column → aggregate column.
    * `partitionKeys` (a subset of `keys`, possibly empty) is the
    * table's dir-partitioning. Creates the table on first call. */
  def upsert(spark: SparkSession, path: String, chunk: DataFrame,
      keys: Seq[String], countAs: String, sums: Seq[(String, String)],
      partitionKeys: Seq[String] = Nil): Unit = {
    require(partitionKeys.forall(keys.contains),
      "partitionKeys must be a subset of the group keys")
    val chunkAgg = chunk.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countAs),
        sums.map { case (src, al) => sum(col(src)).as(al) }: _*)

    // recovery FIRST: a crash inside a prior fold's staged-overwrite
    // window leaves the table at the hidden .old backup and the path
    // missing — an exists-check before the recover would recreate the
    // aggregate from just this chunk, silently discarding all history
    DataMerge.recoverStagedOverwrite(spark, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      val w = chunkAgg.write
      (if (partitionKeys.nonEmpty) w.partitionBy(partitionKeys: _*) else w)
        .parquet(path)
      return
    }

    // existing rows for touched groups only; the combine re-sums the
    // (count,sum...) monoid values — partial + partial = total.
    // NULL-SAFE matching throughout (here and in the merge below):
    // GROUP BY legitimately yields a NULL-keyed group, and plain
    // equality would never read its stored row back — the running
    // total resets each fold and duplicate NULL rows accumulate
    val stored = spark.read.option("mergeSchema", "true").parquet(path)
    val touchedKeys = chunkAgg.select(keys.map(col): _*)
    val existing = stored.join(touchedKeys,
      keys.map(k => stored(k) <=> touchedKeys(k)).reduce(_ && _),
      "left_semi")
    val combined = existing.unionByName(chunkAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(countAs)).cast("long").as(countAs),
        sums.map { case (_, al) =>
          // keep the stored sum type (decimal stays decimal, long
          // stays long) — a widening re-sum would change the schema
          // on every fold
          sum(col(al)).cast(existing.schema(al).dataType).as(al)
        }: _*)
    if (partitionKeys.nonEmpty)
      DataMerge.mergeIntoParquet(spark, path, combined, keys, partitionKeys,
        nullSafeKeys = true)
    else
      DataMerge.mergeIntoParquetFull(spark, path, combined, keys,
        nullSafeKeys = true)
  }
}
