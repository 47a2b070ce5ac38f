package graft.streaming

import graft.operators.{Similarity, Versioned}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming ANN ingest: grow a persisted IVF index from a change
  * feed ([EXT] — the incremental-ingest loop of the similarity-search
  * family, st17's sibling). The index is a Versioned snapshot table
  * bucketed by `list_id` (graft.operators.Similarity's r16 layout), so
  * each micro-batch is one CAS-guarded manifest COMMIT: the batch is
  * assigned against the index's COMMITTED codebook and appended under
  * the declared bucket layout — probes bucket-prune on `list_id`
  * across every batch's rows exactly as on a build-once index, and the
  * index grows at chunk cost.
  *
  * Exactly-once across restarts WITHOUT trusting Spark's checkpoint
  * (the NearDedup discipline): each append carries `annbatch=<id>` in
  * its manifest meta — committed atomically WITH the rows — and a
  * replayed batch (checkpoint lost after the sink ran) finds its id
  * recorded and skips, where a snapshot append replayed blindly would
  * DUPLICATE the batch's vectors. (The pre-r16 plain-dir layout was
  * idempotent by construction — per-batch dir overwrites — but paid
  * for it with no commit protocol at all: no concurrent writers, no
  * in-place retrain, mixed-layout read failures. The ledger is the
  * price of the snapshot layout's multi-writer safety, and it is the
  * same ledger st17 already proved.) A root-level `_annbatch` mirror
  * backstops the manifest against vacuum erasure, exactly like
  * NearDedup's (see [[BatchMirror]]).
  *
  * Retrain handoff is BY CONSTRUCTION: batches assign under the
  * codebook resolved from the index's own latest commit, and the
  * append is CAS'd on that exact version, so a retrain landing
  * mid-stream either precedes the batch (which then assigns under the
  * NEW codebook) or conflicts the CAS (the batch re-resolves and
  * re-assigns). The caller's codebook only SEEDS a missing index; it
  * is never trusted afterwards.
  *
  * Drift: the seed commits a zero-vector baseline (which never
  * justifies a verdict); the first non-empty batch re-seeds it
  * crash-atomically in its own commit meta, and every batch's mean
  * assigned-centroid cosine is compared against it —
  * `retrainRecommended` (the [[Similarity.IvfAppend]] rule) is logged
  * at WARN. With an [[AutoRetrain]] policy the sink CLOSES the loop
  * itself: the flagged batch triggers `Similarity.retrainPersistedIvf`
  * in place, and because the retrain is one CAS'd overwrite commit,
  * probes pinned before it keep reading the old (version, codebook,
  * data) triple while the next probe resolves the new one atomically
  * — the commit IS the swap, no pointer file or probe repoint needed.
  * Without the policy the WARN remains the operator's signal.
  *
  * With `pqId` set, the sink grows an IVF-PQ index instead: batches
  * assign on TRUE embeddings, quantize to int8 codes, and append
  * ~1/4 the bytes — same ledger, same mirror, same drift signal
  * (pre-quantization sims). [[AutoRetrain]] refuses to compose with
  * it (lossy codes cannot rebuild a codebook); the quantized sink's
  * drift response is [[AutoRebuild]], which retrains from the SOURCE
  * table's true embeddings via
  * [[Similarity.rebuildPersistedIvfPq]].
  *
  * With `productBooks` additionally set (requires `pqId`), a MISSING
  * index seeds as TRUE product quantization (scheme 2 — one byte per
  * subvector, [[graft.operators.ProductQuant]]) instead of int8.
  * After the seed, every batch follows the INDEX's resolved scheme,
  * not the caller's arguments: the appended codes and the re-emitted
  * descriptor come from the committed state inside the CAS loop, so
  * a mid-stream rebuild that swaps the product books (or an operator
  * migration between quantization schemes) hands off to the stream
  * atomically, exactly like a float retrain. [[AutoRebuild]]
  * composes with BOTH quantized schemes: it dispatches on the live
  * state — [[Similarity.rebuildPersistedIvfProduct]] (keeping the
  * current numSub/k shape) for a product index,
  * [[Similarity.rebuildPersistedIvfPq]] for int8.
  *
  * A LEGACY pre-r16 dir (`batch=<id>/list_id=` stream layout or a
  * root-level `list_id=` plain build, no commit log) refuses up front:
  * committing a snapshot over it would permanently shadow every legacy
  * vector from the catalog read. Migrate with
  * [[Similarity.migratePersistedIvf]] to a fresh path and point the
  * stream there.
  */
object AnnIngest {

  /** Manifest meta key carrying the last applied foreachBatch id. */
  val BatchKey = "annbatch"

  private def mirrorFile(path: String) =
    new org.apache.hadoop.fs.Path(path, "_annbatch")

  /** Highest batch id recorded in the index's commit ledger (manifest
    * meta, newest-first — foreign commits without the key are skipped
    * over) or its vacuum-proof mirror, whichever is higher. None when
    * the stream has never committed. */
  def lastAppliedBatch(spark: SparkSession, path: String): Option[Long] = {
    val fromMeta = Versioned.latestMeta(spark, path)(
      _.get(BatchKey).flatMap(s => scala.util.Try(s.toLong).toOption))
      .map(_._2)
    val fromFile = BatchMirror.read(spark, mirrorFile(path), path)
    (fromMeta ++ fromFile).maxOption
  }

  /** Refuse a legacy plain-dir layout before the first commit lands —
    * a snapshot committed over it would shadow every legacy vector
    * with no write-time error. Runs per micro-batch (one exists +
    * listing); it short-circuits on the commit log's presence, so the
    * listing only happens while the dir is still uncommitted. */
  private def requireSnapshotOrEmpty(spark: SparkSession,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) ||
        fs.exists(new org.apache.hadoop.fs.Path(p, Versioned.LogDir)))
      return
    val legacy = fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      (st.isDirectory &&
        (n.startsWith("list_id=") || n.startsWith("batch="))) ||
        (!st.isDirectory && n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith("."))
    }
    if (legacy) throw new IllegalStateException(
      s"$path holds a legacy plain-dir IVF layout (pre-snapshot " +
        "list_id=/batch= dirs) but no commit log — committing a " +
        "snapshot over it would shadow every legacy vector; migrate " +
        "it first with Similarity.migratePersistedIvf to a fresh path " +
        "and point the stream there")
  }

  /** In-stream drift response: when a batch's drift check fires, the
    * sink retrains the index IN PLACE instead of only WARNing — the
    * drift loop's last manual step, automated. `id` names the vector
    * id column (the codebook builder needs it); `nlist` = 0 keeps the
    * current codebook's cell count, a positive value re-sizes the
    * codebook (the usual response when drift means the corpus outgrew
    * it). The retrain runs AFTER the batch's ledger commit, so a crash
    * in between loses only the retrain, never the batch: the replayed
    * batch skips, and the still-drifted distribution re-fires the flag
    * on its next cohort — the signal is self-healing, which is why the
    * retrain needs no ledger of its own. Cost is one assignment pass
    * over the index per FIRE (not per batch) plus `refineIters` Lloyd
    * passes — the default of 1 is deliberate: `buildCodebook` seeds
    * from the LOWEST ids, which on a drifted index are the PRE-drift
    * rows, and without at least one Lloyd pass the rebuilt codebook
    * can fail to place any centroid in the arrived mass (the drift
    * flag then re-fires every batch instead of once). With refinement
    * the post-retrain baseline describes the whole corpus, so a
    * stationary-after-shift stream fires once, not forever. */
  final case class AutoRetrain(id: String, nlist: Int = 0,
      refineIters: Int = 1) {
    require(nlist >= 0, s"nlist must be >= 0, got $nlist")
    require(refineIters >= 0, s"refineIters must be >= 0, got $refineIters")
  }

  /** [[AutoRetrain]]'s counterpart for the QUANTIZED sink (`pqId`
    * set), closing the PQ drift loop AutoRetrain correctly refuses:
    * a PQ index's rows are lossy int8 codes, so an in-place retrain
    * has nothing to rebuild FROM — but the SOURCE table (which every
    * PQ probe already rescores against, so it exists and stays in
    * sync by the layout's own contract) carries the true embeddings.
    * When a batch's drift check fires, the sink calls
    * [[Similarity.rebuildPersistedIvfPq]]: fresh codebook over the
    * source, re-assign, re-quantize, ONE CAS'd in-place overwrite —
    * probes handoff atomically exactly as under AutoRetrain. `source`
    * resolves the corpus frame per fire (a function, not a captured
    * frame, so a long-lived stream always reads the source's CURRENT
    * rows); it must cover everything streamed into the index — index
    * rows absent from it are dropped by the rebuild (the source is
    * the truth). DUPLICATE safety: each batch's append carries the
    * in-call absorption guard (Similarity's epoch anti-join), so a
    * rebuild interleaving with a batch never doubles that batch's
    * rows. The remaining window is a source that runs AHEAD of the
    * change feed — rows committed to the source but not yet streamed
    * are absorbed by a rebuild and appended again when they finally
    * arrive; such deployments hold transient duplicates until the
    * next rebuild re-converges on the source. A pipeline where the
    * stream itself is the source's writer (or the feed IS the
    * source's change feed, st18's shape) never opens that window.
    * Crash discipline is AutoRetrain's: the rebuild runs
    * AFTER the batch's ledger commit, so a crash in between loses
    * only the rebuild, and the still-drifted distribution re-fires on
    * the next cohort. `nlist` = 0 keeps the current cell count;
    * `refineIters` defaults to 1 for the same seed-placement reason
    * as AutoRetrain's. */
  final case class AutoRebuild(
      source: SparkSession => org.apache.spark.sql.DataFrame,
      id: String, nlist: Int = 0, refineIters: Int = 1) {
    require(nlist >= 0, s"nlist must be >= 0, got $nlist")
    require(refineIters >= 0, s"refineIters must be >= 0, got $refineIters")
  }

  /** What one micro-batch did (`appended` = -1 when replayed: nothing
    * was committed this invocation; `retrained` = the sink's
    * [[AutoRetrain]] (or, on a PQ index, [[AutoRebuild]]) policy
    * fired and the in-place retrain/rebuild committed;
    * `compacted` = the sink's [[AutoCompact]] policy folded small
    * segments after this batch's commit). */
  case class BatchOutcome(batchId: Long, appended: Long, meanSim: Double,
      retrainRecommended: Boolean, replayed: Boolean,
      retrained: Boolean = false, compacted: Boolean = false)

  /** Process one micro-batch (the foreachBatch body, callable directly
    * so specs can drive replay/retrain schedules deterministically). */
  def processBatch(batch: DataFrame, batchId: Long, embedding: String,
      seedCodebook: Similarity.IvfCodebook, path: String,
      autoRetrain: Option[AutoRetrain] = None,
      autoCompact: Option[AutoCompact] = None,
      pqId: Option[String] = None,
      autoRebuild: Option[AutoRebuild] = None,
      productBooks: Option[graft.operators.ProductQuant.PqCodebooks] =
        None): BatchOutcome = {
    val spark = batch.sparkSession
    require(productBooks.isEmpty || pqId.nonEmpty,
      "productBooks seeds a quantized index — it requires pqId (the " +
        "vector-id column); a float index carries its own embeddings")
    // pqId names the vector-id column and switches the sink to the
    // IVF-PQ layout: batches assign on TRUE embeddings, quantize, and
    // append codes (~1/4 the index bytes). AutoRetrain cannot compose
    // with it — a PQ index's rows are lossy codes, so an in-place
    // rebuild has nothing to retrain FROM; refuse up front rather
    // than on the first drifted batch mid-stream. The PQ drift
    // response is AutoRebuild, which retrains from the SOURCE table.
    require(autoRetrain.isEmpty || pqId.isEmpty,
      "AutoRetrain cannot rebuild an IVF-PQ index from its lossy " +
        "codes — use AutoRebuild(source, ...) to retrain from the " +
        "source table, or stream into a float index")
    require(autoRebuild.isEmpty || pqId.nonEmpty,
      "AutoRebuild retrains from the source table a PQ probe rescores " +
        "against — it only composes with pqId; a float index retrains " +
        "in place with AutoRetrain")
    requireSnapshotOrEmpty(spark, path)
    (pqId, productBooks) match {
      case (Some(id), Some(books)) =>
        Similarity.ensurePersistedIvfProduct(batch, embedding, id,
          seedCodebook, books, path)
      case (Some(id), None) =>
        Similarity.ensurePersistedIvfPq(batch, embedding, id,
          seedCodebook, path)
      case _ =>
        Similarity.ensurePersistedIvf(batch, embedding, seedCodebook, path)
    }
    val applied = lastAppliedBatch(spark, path)
    if (applied.exists(_ >= batchId)) {
      // re-converge a lagging mirror on the skip path too (a crash
      // between the commit and the mirror write) — monotone rewrite
      applied.foreach(a => BatchMirror.write(spark, mirrorFile(path),
        path, a))
      return BatchOutcome(batchId, -1, 0.0, retrainRecommended = false,
        replayed = true)
    }
    // ONE descriptor resolution serves the scheme dispatch here AND
    // the post-append policies (nlist default, AutoRebuild's scheme
    // dispatch): the codebook family can't change during our own
    // append (a raced rebuild keeps the scheme and the CAS loop
    // re-resolves internally), so re-loading per use would only buy
    // extra manifest scans and a dispatch/append race window
    val preState = Similarity.loadPersistedIvf(spark, path)
    // the append follows the INDEX's resolved scheme (not the seed
    // arguments): a stream pointed at a product index appends product
    // codes even when seeded for int8, and vice versa — the committed
    // descriptor is the single source of layout truth
    val app = pqId match {
      case Some(id) if preState.exists(_.pqBooks.nonEmpty) =>
        Similarity.appendToPersistedIvfProduct(batch, embedding, id,
          path, Map(BatchKey -> batchId.toString))
      case Some(id) => Similarity.appendResolvedToPersistedIvfPq(batch,
        embedding, id, path, Map(BatchKey -> batchId.toString))
      case None => Similarity.appendResolvedToPersistedIvf(batch,
        embedding, path, Map(BatchKey -> batchId.toString))
    }
    // after the commit: the vacuum-proof mirror (see lastAppliedBatch)
    BatchMirror.write(spark, mirrorFile(path), path, batchId)
    def currentNlist(declared: Int): Int =
      if (declared > 0) declared
      else preState
        .map(_.codebook.entries.length)
        .getOrElse(throw new IllegalStateException(
          s"$path carries no IVF descriptor — a foreign overwrite " +
            "landed; rebuild the index"))
    val retrained = app.retrainRecommended && (autoRetrain.exists { ar =>
      val nlist = currentNlist(ar.nlist)
      try {
        val (_, stats) = Similarity.retrainPersistedIvf(spark, path,
          embedding, ar.id, nlist, ar.refineIters)
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"ann-ingest batch $batchId: drift fired, retrained $path in " +
            f"place (nlist=$nlist, new baseline ${stats.vectors} " +
            f"vectors @ mean_sim=${stats.meanSim}%.4f)")
        true
      } catch {
        // best-effort like the PQ rebuild below: the batch's ledger
        // commit already landed — a retrain that exhausts its CAS
        // retries under an ingest storm WARNs and defers (drift
        // re-fires on the next cohort), never crashes the stream
        case e: Versioned.CommitRaceExhausted =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"ann-ingest batch $batchId: drift fired but the retrain " +
              s"of $path lost its commit race to the ingest storm; " +
              "deferring — drift re-fires on the next cohort", e)
          false
      }
    } || autoRebuild.exists { ar =>
      val nlist = currentNlist(ar.nlist)
      try {
        // dispatch on the resolved scheme: a product index keeps its
        // current subspace shape through the rebuild (the books are
        // retrained, not reshaped — reshaping is an operator decision,
        // not a drift response)
        val stats = preState.flatMap(_.pqBooks) match {
          case Some(books) =>
            Similarity.rebuildPersistedIvfProduct(spark, path,
              ar.source(spark), embedding, ar.id, nlist,
              numSub = books.numSub, kSub = books.k,
              refineIters = ar.refineIters)._3
          case None =>
            Similarity.rebuildPersistedIvfPq(spark, path,
              ar.source(spark), embedding, ar.id, nlist,
              ar.refineIters)._2
        }
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"ann-ingest batch $batchId: drift fired, rebuilt PQ index " +
            s"$path in place from its source table (nlist=$nlist, new " +
            f"baseline ${stats.vectors} vectors @ " +
            f"mean_sim=${stats.meanSim}%.4f)")
        true
      } catch {
        // best-effort like AutoCompact: the batch's ledger commit has
        // already landed — a rebuild that exhausts its CAS retries
        // under an ingest storm WARNs and defers (the still-drifted
        // distribution re-fires the flag on its next cohort), never
        // crashes a stream whose data is safe
        case e: Versioned.CommitRaceExhausted =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"ann-ingest batch $batchId: drift fired but the PQ " +
              s"rebuild of $path lost its commit race to the ingest " +
              "storm; deferring — drift re-fires on the next cohort", e)
          false
      }
    })
    // segment hygiene LAST: a retrain just rewrote everything (nothing
    // small left), and the fold must see this batch's segments. A
    // compaction here is a foreign commit to the ledger/descriptor
    // scans — see [[AutoCompact]] for why that composes.
    val compacted = !retrained &&
      autoCompact.exists(_.maybeCompact(spark, path).isDefined)
    BatchOutcome(batchId, app.appended, app.meanSim,
      app.retrainRecommended, replayed = false, retrained = retrained,
      compacted = compacted)
  }

  /** The foreachBatch sink: `writeStream.foreachBatch(AnnIngest.sink(
    * "embedding", seedCodebook, indexPath))`. Pass an [[AutoRetrain]]
    * (float index) or [[AutoRebuild]] (PQ index, with `pqId`) policy
    * to close the drift loop in-stream. */
  def sink(embedding: String, seedCodebook: Similarity.IvfCodebook,
      path: String, autoRetrain: Option[AutoRetrain] = None,
      autoCompact: Option[AutoCompact] = None,
      pqId: Option[String] = None,
      autoRebuild: Option[AutoRebuild] = None,
      productBooks: Option[graft.operators.ProductQuant.PqCodebooks] =
        None):
      (DataFrame, Long) => Unit = {
    require(autoRetrain.isEmpty || pqId.isEmpty,
      "AutoRetrain cannot rebuild an IVF-PQ index from its lossy " +
        "codes — fail at sink construction, not on the first drifted " +
        "batch")
    require(autoRebuild.isEmpty || pqId.nonEmpty,
      "AutoRebuild only composes with pqId — fail at sink " +
        "construction, not on the first drifted batch")
    require(productBooks.isEmpty || pqId.nonEmpty,
      "productBooks requires pqId — fail at sink construction, not " +
        "on the first batch")
    (batch, batchId) => {
      val o = processBatch(batch, batchId, embedding, seedCodebook, path,
        autoRetrain, autoCompact, pqId, autoRebuild, productBooks)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        if (o.replayed)
          s"ann-ingest batch ${o.batchId}: replay detected, skipped"
        else s"ann-ingest batch ${o.batchId}: appended=${o.appended} " +
          f"mean_sim=${o.meanSim}%.4f retrain=${o.retrainRecommended} " +
          s"retrained=${o.retrained}")
      ()
    }
  }
}
