package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming ANN ingest: grow a persisted IVF index from a change
  * feed ([EXT] — the incremental-ingest loop of the similarity-search
  * family, st17's sibling). Each micro-batch is assigned against a
  * FROZEN codebook and written to its own partition directory
  * (`<path>/batch=<id>/list_id=<cell>/`), so a probe prunes on
  * `list_id` across every batch dir exactly as it does on a
  * build-once index, and the index grows at chunk cost.
  *
  * Exactly-once needs NO ledger here — the deliberate contrast with
  * [[NearDedup]]: a near-dedup batch's PROBE depends on the index
  * state, so a replay after the batch's own append must be detected
  * (the commit-meta ledger); an IVF assignment depends ONLY on the
  * frozen codebook, so recomputing a batch is deterministic whatever
  * the index holds, and the per-batch-dir overwrite makes a replay a
  * byte-identical rewrite. Idempotence by construction beats
  * idempotence by protocol when the computation permits it.
  *
  * Drift: the first non-empty batch seeds the `_ivf_stats.json`
  * baseline; every batch's mean assigned-centroid cosine is compared
  * against it and `retrainRecommended` (the [[Similarity.IvfAppend]]
  * rule) is logged at WARN — the signal that the frozen codebook has
  * stopped describing the arriving distribution and a rebuild is due.
  *
  * The stream's `batch=/list_id=` layout and
  * [[Similarity.writePersistedIvf]]'s root-level `list_id=` layout
  * cannot share a directory — parquet partition discovery refuses
  * leaf files at conflicting depths, so EVERY read of a mixed dir
  * would fail. The sink refuses a build-once-layout path up front;
  * migrate an existing index into a stream-fed one with
  * [[Similarity.retrainPersistedIvf]] to a fresh path and point the
  * stream there.
  */
object AnnIngest {

  /** Refuse a root-level `list_id=` (build-once) layout before the
    * first byte lands — a mixed dir is unreadable with no write-time
    * error otherwise. One listing per batch (object-store-cheap). */
  private def requireBatchLayout(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("list_id=")))
      throw new IllegalStateException(
        s"$path holds a root-level list_id= layout (writePersistedIvf's " +
          "build-once shape) — streaming batch= dirs into it would mix " +
          "partition depths and make every read fail; start the stream " +
          "on a fresh path (retrainPersistedIvf migrates the existing " +
          "index into one)")
  }

  /** What one micro-batch did. */
  case class BatchOutcome(batchId: Long, appended: Long, meanSim: Double,
      retrainRecommended: Boolean)

  /** Process one micro-batch (the foreachBatch body, callable directly
    * so specs can drive replay schedules deterministically). */
  def processBatch(batch: DataFrame, batchId: Long, embedding: String,
      codebook: Similarity.IvfCodebook, path: String): BatchOutcome = {
    val spark = batch.sparkSession
    requireBatchLayout(spark, path)
    // ONE assignment pass (the dominant per-row compute) and ONE read
    // of the micro-batch source, materialized chunk-local: the dir
    // write and the drift aggregate both consume it
    val assigned = Similarity.ivfAssignWithSim(batch, embedding, codebook)
      .localCheckpoint(true)
    assigned.drop(Similarity.AssignSimCol)
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/batch=$batchId")
    val q = Similarity.qualityOf(assigned)
    // the first NON-EMPTY cohort seeds the baseline — the distribution
    // at stream start; a replay rewrites the same value. An empty
    // batch must never seed: IvfStats(0, 0.0) would silence
    // retrainRecommended for the stream's lifetime, and a degenerate
    // baseline left by an older writer is re-seeded the same way.
    val base = Similarity.readIvfStats(spark, path) match {
      case Some(s) if s.vectors > 0 => s
      case _ if q.vectors > 0 =>
        Similarity.writeIvfStats(spark, path, q); q
      case other => other.getOrElse(q) // nothing non-empty yet: no seed
    }
    val drift = Similarity.IvfAppend(q.vectors, q.meanSim, base)
    if (drift.retrainRecommended)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"IVF stream index $path batch $batchId: cohort mean sim " +
          f"${q.meanSim}%.4f vs baseline ${base.meanSim}%.4f — frozen " +
          "codebook no longer fits the arriving distribution; " +
          "rebuild (retrain) recommended")
    BatchOutcome(batchId, q.vectors, q.meanSim, drift.retrainRecommended)
  }

  /** The foreachBatch sink: `writeStream.foreachBatch(AnnIngest.sink(
    * "embedding", codebook, indexPath))`. */
  def sink(embedding: String, codebook: Similarity.IvfCodebook,
      path: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val o = processBatch(batch, batchId, embedding, codebook, path)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"ann-ingest batch ${o.batchId}: appended=${o.appended} " +
          f"mean_sim=${o.meanSim}%.4f retrain=${o.retrainRecommended}")
      ()
    }
}
