package graft.streaming

import graft.operators.{DataMerge, Versioned}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming upsert into the parquet lake — the production shape of the
  * reference's ENTIRE pipeline (incremental read → MERGE into the lake →
  * commit watermark, `Ingest:329-415`) with Spark's streaming engine
  * owning offsets, retries, and restart semantics instead of a
  * hand-rolled chunk loop + TableLoadDetails state.
  *
  * Each micro-batch is deduplicated on the key columns (last write in
  * the batch wins via the max of `versionCol`) and MERGEd with
  * `DataMerge`'s staged-commit upsert. The checkpoint makes the sink
  * effectively exactly-once across restarts: a replayed batch re-merges
  * the same keys to the same values (the merge is idempotent), and
  * committed batches are never re-read.
  *
  * At 100 TB the same code runs with the partitioned
  * `mergeIntoParquet(partCol)` variant so each micro-batch rewrites only
  * the partitions it touches; the unpartitioned form here keeps the spec
  * surface small.
  */
object UpsertSink {

  /** Start a foreachBatch upsert of `stream` into `path` keyed by
    * `keys`, resolving in-batch duplicates by the greatest `versionCol`. */
  def start(stream: DataFrame, path: String, keys: Seq[String],
      versionCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = dedupBatch(batch, keys, versionCol)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
          deduped.write.parquet(path)
        else
          DataMerge.mergeIntoParquetFull(spark, path, deduped, keys)
        ()
      }
      .start()

  /** Last-writer-wins within the batch; the row's ORDERABLE columns
    * are the sort key (version first, the rest as tiebreak) so
    * equal-version duplicates resolve identically on checkpoint
    * REPLAY — a version-only sort would let row_number pick a
    * different winner per execution, breaking idempotent re-merge.
    * Unorderable columns (maps) are excluded or the window itself
    * would fail analysis. */
  private def dedupBatch(batch: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rest = batch.schema.fields.toSeq
      .filterNot(f => keys.contains(f.name) || f.name == versionCol)
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(_.name)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc +: rest.map(col(_).desc): _*)
    batch.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Streaming MERGE-ON-READ upsert into a [[Versioned]] snapshot
    * table: each micro-batch lands as ONE atomic commit that
    * DV-deletes the superseded rows (a sidecar of row positions,
    * stats-scoped to the files the batch's key window may touch) and
    * appends the batch as a small fresh segment — ZERO pre-existing
    * segments are rewritten. Where the COW [[start]] re-merges the
    * whole table per batch (write amplification = table size), a
    * small batch here costs O(batch) writes; OPTIMIZE (threshold
    * compaction) folds the accumulated sidecars and small segments on
    * whatever schedule the operator runs it. Checkpoint replay
    * converges: a re-delivered batch DV-deletes its own previous
    * append and re-appends identical rows. */
  def startMergeOnRead(stream: DataFrame, path: String, keys: Seq[String],
      versionCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = dedupBatch(batch, keys, versionCol)
        if (!deduped.isEmpty)
          upsertBatchMor(batch.sparkSession, path, keys, deduped)
        ()
      }
      .start()

  /** One merge-on-read upsert commit (exposed for the spec). */
  private[streaming] def upsertBatchMor(spark: SparkSession, path: String,
      keys: Seq[String], deduped: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{sources => sf}
    if (Versioned.versions(spark, path).isEmpty) {
      Versioned.commit(deduped, path, "overwrite")
      return
    }
    // stats scope from the batch's key bounds (so provably-unaffected
    // segments are never even opened) — ONE aggregate job for every
    // key's min/max/has-null, not one per key. The matched-row mark
    // itself is a broadcast semi-join on the batch's distinct key
    // tuples (null-SAFE, matching dedupBatch's grouping — a NULL-key
    // batch row must supersede the table's NULL-key row or duplicates
    // accumulate across replays), never an O(distinct-keys) literal
    // predicate tree.
    val aggCols = keys.flatMap(k => Seq(min(col(k)), max(col(k)),
      max(col(k).isNull.cast("int"))))
    val row = deduped.agg(aggCols.head, aggCols.tail: _*).head()
    val bounds: Seq[sf.Filter] = keys.zipWithIndex.flatMap { case (k, i) =>
      val mn = row.get(3 * i); val mx = row.get(3 * i + 1)
      val hasNull = !row.isNullAt(3 * i + 2) && row.getInt(3 * i + 2) == 1
      val range =
        if (mn == null) None
        else Some(sf.And(sf.GreaterThanOrEqual(k, mn),
          sf.LessThanOrEqual(k, mx)))
      (range, hasNull) match {
        // min/max ignore nulls, and a range filter prunes a segment
        // holding only NULL keys — widen the scope when the batch
        // carries a NULL so that segment stays in reach of the delete
        case (Some(r), true) => Some(sf.Or(r, sf.IsNull(k)))
        case (Some(r), false) => Some(r)
        case (None, true) => Some(sf.IsNull(k))
        case (None, false) => None
      }
    }
    val scope: graft.operators.SegmentStats.FileStats => Boolean =
      st => bounds.forall(graft.sources.StatsPruner.mayMatch(st, _))
    // matched rows: DV-delete + the WHOLE batch appended, one commit;
    // nothing matched: the batch is pure inserts — an append that
    // must keep a bucketed target's declared layout (a plain append
    // would silently de-bucket the table and cost every later join
    // its co-partitioning)
    val matched = Versioned.updateWithDvKeyed(spark, path, scope, keys,
      deduped, bounds, _ => deduped)
    if (matched == 0L) Versioned.bucketSpec(spark, path) match {
      case Some((c, n)) =>
        Versioned.commitBucketed(deduped, path, c, n, "append")
      case None => Versioned.commit(deduped, path, "append")
    }
  }
}
