package graft.streaming

import graft.operators.Versioned
import org.apache.spark.sql.SparkSession

/** Opt-in small-file maintenance for the streaming index sinks
  * ([[NearDedup]], [[AnnIngest]]) — the [[AnnIngest.AutoRetrain]]
  * pattern applied to segment hygiene. A bucketed streaming sink
  * commits one small file per bucket per micro-batch; left alone, a
  * night of batches turns every probe's bucket-pruned read into
  * hundreds of file opens. With this policy the sink checks the LIVE
  * manifest after each commit (one cached manifest read — the check
  * costs no filesystem listing) and, when at least `minSmallFiles`
  * data files sit under `minBytes`, fires ONE
  * [[Versioned.compactSmall]]: small segments fold bin-packed into
  * the declared bucket layout, full-size segments are carried on
  * their manifest lines verbatim, so cost tracks the small-file
  * bytes, never the index.
  *
  * The compaction commit is FOREIGN to the sinks' protocols by
  * design and safe by construction: the replay ledger
  * (`annbatch`/`neardedup_batch`) and the index descriptors (IVF
  * codebook/fingerprint/baseline, LSH plane family, band layout) are
  * resolved by newest-first meta scans that skip commits without
  * their key, and `compactSmall` re-buckets under the DECLARED spec,
  * so probes bucket-prune across the folded segments exactly as
  * before (spec-pinned by the r16 maintenance-composition case; the
  * policy only automates the trigger). Racing appenders are handled
  * inside `compactSmall`'s CAS loop; a lost race just retries against
  * the newer manifest.
  *
  * Thresholds: `minBytes` is both the "small" cutoff and the packing
  * target (Delta OPTIMIZE's discipline); `minSmallFiles` gates how
  * often the fold pays its read-rewrite cost — at the default 64, a
  * 16-bucket index folds roughly every four micro-batches' worth of
  * stragglers, and the fold cost stays proportional to those
  * batches' bytes. Files whose manifest line carries no bytes stat
  * (legacy segments) don't count toward the trigger — `compactSmall`
  * itself still probes and folds them once it runs. */
final case class AutoCompact(minBytes: Long = 8L << 20,
    minSmallFiles: Int = 64) {
  require(minBytes > 0, s"minBytes must be positive, got $minBytes")
  require(minSmallFiles >= 2,
    s"minSmallFiles must be >= 2 (compaction of one file is a no-op), " +
      s"got $minSmallFiles")

  /** Check the live manifest and compact iff the threshold is
    * crossed. Returns (new version, files rewritten, files carried)
    * when a compaction committed; None when the index is still tidy
    * (or a concurrent compaction got there first and left fewer than
    * two small files). */
  def maybeCompact(spark: SparkSession, path: String)
      : Option[(Long, Long, Long)] = {
    val small = Versioned.fileStats(spark, path).valuesIterator
      .count(_.bytes.exists(_ < minBytes))
    if (small < minSmallFiles) None
    else {
      // best-effort by contract: the micro-batch whose commit
      // triggered this fold has already landed — a compaction that
      // exhausts its CAS retries under a writer storm must WARN and
      // yield (the backlog re-triggers next batch), never crash the
      // stream over maintenance
      val res =
        try Versioned.compactSmall(spark, path, minBytes)
        catch {
          case e: IllegalStateException
              if e.getMessage != null &&
                e.getMessage.contains("losing the commit race") =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"auto-compact $path lost its commit race to the writer " +
                "storm; deferring to the next batch", e)
            None
        }
      res.foreach { case (v, rewritten, carried) =>
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"auto-compact $path: folded $rewritten small files " +
            s"(carried $carried) into version $v")
      }
      res
    }
  }
}
