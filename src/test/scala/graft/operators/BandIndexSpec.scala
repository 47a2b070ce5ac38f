package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** The persisted MinHash band index's 100-TB contract: the index is a
  * snapshot table BUCKETED by band_hash, so a chunk probe is a
  * co-located join — the chunk shuffles ONCE into the index's layout
  * (one-side-shuffle storage-partitioned join, the Iceberg
  * `bucket`-transform precedent) and the index side, whose full-scale
  * form is itself enormous, is read with ZERO Exchange. Proved on the
  * physical plan, not claimed in a comment. */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Pairwise-independent texts (12 md5 tokens): distinct docs share
    * no shingles, so LSH flags are deterministic (OperatorSpec's
    * device). */
  private def synth(ids: Seq[Long]): DataFrame =
    ids.toDF("doc_id").select($"doc_id",
      concat_ws(" ", (0 until 12).map(i =>
        md5(concat($"doc_id".cast("string"), lit(s"_$i")))): _*).as("text"))

  private def resolve(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => resolve(a.executedPlan)
    case q: QueryStageExec => resolve(q.plan)
    case r: ReusedExchangeExec => resolve(r.child)
    case other => other
  }
  private def kids(p: SparkPlan): Seq[SparkPlan] =
    resolve(p).children.map(resolve)
  private def subtree(p: SparkPlan): Seq[SparkPlan] = {
    val r = resolve(p)
    r +: kids(r).flatMap(subtree)
  }
  private def isIndexScan(p: SparkPlan): Boolean = p match {
    case b: BatchScanExec => b.scan.getClass.getName.startsWith("graft.")
    case _ => false
  }

  /** The child subtree of the probe join that contains the index's
    * catalog scan (the innermost such join). */
  private def indexSideOfProbe(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // AQE: final plan only materializes after execution
    val root = resolve(df.queryExecution.executedPlan)
    val joins = subtree(root).collect {
      case j: BaseJoinExec if subtree(j).exists(isIndexScan) => j
    }
    assert(joins.nonEmpty, s"no join over the index scan in:\n$root")
    val innermost = joins.last
    val side = kids(innermost).filter(s => subtree(s).exists(isIndexScan))
    assert(side.size == 1, s"index scan on both sides of:\n$innermost")
    subtree(side.head)
  }

  test("chunk probe against the bucketed band index: the index side " +
    "joins CO-LOCATED — zero Exchange between the scan and the join") {
    val ix = tmpDir("bandix") + "/index"
    Dedup.writeBandIndex(synth(1L to 400L), $"text", "doc_id", ix)
    // the layout is declared, not incidental: band_hash, 16 buckets
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 16)))

    val chunk = synth(1001L to 1040L)                     // clean originals
      .union(synth(1L to 8L).select($"doc_id" + 5000, $"text")) // corpus dups
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast: the probe must survive on co-location alone
      // (at 100 TB the index never fits a broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val flags = Dedup.dedupChunkAgainstIndex(chunk, $"text", "doc_id", ix)
      val indexSide = indexSideOfProbe(flags)
      val exchanges = indexSide.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"index side of the probe must not exchange, found:\n" +
          exchanges.mkString("\n---\n"))
      // and the probe is still exact: every injected corpus copy
      // flagged, every clean original untouched
      val m = flags.collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
      (1001L to 1040L).foreach(id => assert(m(id) == ((false, false)), id))
      (5001L to 5008L).foreach(id => assert(m(id)._1, s"$id not flagged"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("append mode grows the index under the SAME declared layout; " +
    "the probe sees both generations") {
    val ix = tmpDir("bandixa") + "/index"
    Dedup.writeBandIndex(synth(1L to 50L), $"text", "doc_id", ix)
    Dedup.writeBandIndex(synth(51L to 100L), $"text", "doc_id", ix,
      mode = "append")
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 16)))
    assert(Versioned.versions(spark, ix).size == 2)
    val chunk = synth(Seq(10L, 90L))
      .select(($"doc_id" + 5000).as("doc_id"), $"text")
      .union(synth(Seq(2001L)))
    val m = Dedup.dedupChunkAgainstIndex(chunk, $"text", "doc_id", ix)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m(5010L) && m(5090L) && !m(2001L),
      s"both index generations must answer the probe, got $m")
  }

  test("bucket sizing rule: 64 MB/bucket, power-of-two, clamped to " +
    "[16, 65536] — scale-aware, never a constant") {
    assert(Dedup.bucketsForIndexBytes(0L) == 16)
    assert(Dedup.bucketsForIndexBytes(1L << 20) == 16) // tiny → floor
    // 16 × 64 MB = 1 GiB is the last floor-clamped size
    assert(Dedup.bucketsForIndexBytes(1L << 30) == 16)
    assert(Dedup.bucketsForIndexBytes((1L << 30) + 1) == 32) // next pow2
    assert(Dedup.bucketsForIndexBytes(100L << 30) == 2048) // 100 GiB
    // 12 TB index (≈100 TB corpus) → ceiling, ~200 MB buckets
    assert(Dedup.bucketsForIndexBytes(12L << 40) == 65536)
    assert(Dedup.bucketsForIndexBytes(Long.MaxValue / 4) == 65536)
  }

  test("sizing a fresh index from a snapshot-backed corpus is " +
    "manifest-only: exact stats rowCount, ZERO jobs for the decision") {
    val root = tmpDir("bandixs")
    Versioned.commit(synth(1L to 120L), s"$root/corpus")
    val cat = "graft_bandix_stats"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val corpus = spark.table(s"$cat.corpus").select($"doc_id", $"text")
    // suites share the session and run concurrently: count only jobs
    // carrying THIS test's job group (thread-local, so any job the
    // sizing decision spawned on this thread would inherit it)
    val group = "bandix-sizing-probe"
    val jobs = new java.util.concurrent.CopyOnWriteArrayList[Integer]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group)) {
          jobs.add(j.jobId); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, "band index sizing decision")
    try {
      assert(Dedup.statsRowCount(corpus).contains(120L),
        "catalog snapshot scan must expose its exact manifest rowCount")
      // marker job: the listener bus is FIFO, so once the marker's
      // start lands, any job the sizing decision had spawned would
      // already have been recorded before it
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.currentTimeMillis() + 30000
      while (jobs.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(jobs.size == 1,
        s"sizing decision must spawn ZERO jobs (marker only), saw $jobs")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
    // a filter makes the leaf count an over-statement → must decline
    assert(Dedup.statsRowCount(corpus.where($"doc_id" > 60L)).isEmpty)
    // plain-parquet reads report no exact rowCount → count-job fallback
    assert(Dedup.statsRowCount(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")).isEmpty)
    // and the zero-job sizing feeds the same layout the count() path
    // would have chosen
    val ix = s"$root/index"
    Dedup.writeBandIndex(corpus, $"text", "doc_id", ix)
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 16)))
  }

  test("append reports REBUCKET RECOMMENDED when the index has " +
    "outgrown its inherited layout >=4x") {
    val ix = tmpDir("bandixw") + "/index"
    // deliberately under-provisioned layout: 1 bucket, pinned
    val fresh = Dedup.writeBandIndex(synth(1L to 150L), $"text", "doc_id",
      ix, buckets = 1)
    assert(fresh.buckets == 1 && fresh.recommendedBuckets == 16 &&
      fresh.rebucketRecommended)
    // append inherits the outgrown layout — and says so
    val app = Dedup.writeBandIndex(synth(151L to 200L), $"text", "doc_id",
      ix, mode = "append")
    assert(app.buckets == 1, "append must still inherit the declared layout")
    assert(app.recommendedBuckets == 16 && app.rebucketRecommended,
      s"outgrown inherited layout must recommend a rebucket, got $app")
    // a well-sized auto build recommends nothing
    val ok = Dedup.writeBandIndex(synth(1L to 150L), $"text", "doc_id",
      tmpDir("bandixok") + "/index")
    assert(ok.buckets == 16 && !ok.rebucketRecommended, ok.toString)
  }

  test("REBUCKET migrates an index that outgrew its layout: the " +
    "probe is still co-located (zero index-side Exchange) at the new " +
    "count, and append inherits the NEW layout") {
    val ix = tmpDir("bandixr") + "/index"
    Dedup.writeBandIndex(synth(1L to 200L), $"text", "doc_id", ix)
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 16)),
      "auto sizing on a tiny corpus must clamp to the 16-bucket floor")
    val written = Dedup.rebucketBandIndex(spark, ix, newBuckets = 32)
    assert(written == 32)
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 32)))
    // auto-inheriting append under the NEW layout (buckets left 0)
    Dedup.writeBandIndex(synth(201L to 260L), $"text", "doc_id", ix,
      mode = "append")
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 32)),
      "append must inherit the rebucketed layout without being told")
    val chunk = synth(Seq(10L, 230L))
      .select(($"doc_id" + 5000).as("doc_id"), $"text")
      .union(synth(Seq(3001L)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val flags = Dedup.dedupChunkAgainstIndex(chunk, $"text", "doc_id", ix)
      val exchanges = indexSideOfProbe(flags)
        .collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"rebucketed index side must not exchange, found:\n" +
          exchanges.mkString("\n---\n"))
      val m = flags.collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(m(5010L) && m(5230L) && !m(3001L),
        s"pre- and post-rebucket generations must answer, got $m")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("REBUCKET migrates a LEGACY plain-parquet index dir to the " +
    "bucketed snapshot form (auto-sized)") {
    val ix = tmpDir("bandixl") + "/index"
    // the pre-bucketing layout older builds wrote: loose parquet
    Dedup.withBands(Dedup.withMinhashSignature(
        synth(1L to 120L), $"text", shingleSize = 3, numHashes = 16),
        bands = 4, rowsPerBand = 4)
      .select($"band_id", $"band_hash", $"doc_id")
      .write.parquet(ix)
    assert(Versioned.bucketSpec(spark, ix).isEmpty)
    val n = Dedup.rebucketBandIndex(spark, ix) // auto from actual bytes
    assert(n == 16, s"tiny legacy index must clamp to the floor, got $n")
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 16)))
    val flags = Dedup.dedupChunkAgainstIndex(
      synth(Seq(7L)).select(($"doc_id" + 9000).as("doc_id"), $"text"),
      $"text", "doc_id", ix)
    assert(flags.collect().head.getBoolean(1),
      "migrated index must still flag a corpus duplicate")
  }

  test("probe under CONCURRENT index append — the production " +
    "interleave: every probe reads a consistent committed snapshot " +
    "(base dups always flagged, clean docs never, no errors), and " +
    "the final probe sees the appended generations") {
    val ix = tmpDir("bandixq") + "/index"
    Dedup.writeBandIndex(synth(1L to 60L), $"text", "doc_id", ix)
    val appendErr =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try (0 until 6).foreach { g =>
        val lo = 100L + g * 10
        Dedup.writeBandIndex(synth(lo until lo + 10L), $"text", "doc_id",
          ix, mode = "append")
      } catch { case t: Throwable => appendErr.set(t) }
    }, "bandix-appender")
    writer.start()
    try {
      // copies of base-corpus docs + never-indexed cleans: their flags
      // are interleave-INDEPENDENT, so any torn/partial manifest read
      // mid-append shows up as a wrong flag or a probe error here
      val chunk = synth(Seq(3L, 17L, 42L))
        .select(($"doc_id" + 5000).as("doc_id"), $"text")
        .union(synth(Seq(9001L, 9002L)))
      (1 to 5).foreach { i =>
        val m = Dedup.dedupChunkAgainstIndex(chunk, $"text", "doc_id", ix)
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(m(5003L) && m(5017L) && m(5042L),
          s"probe $i lost base-corpus dups mid-append: $m")
        assert(!m(9001L) && !m(9002L),
          s"probe $i spuriously flagged a clean doc mid-append: $m")
      }
    } finally writer.join(180000)
    assert(!writer.isAlive, "appender did not finish")
    assert(appendErr.get() == null,
      s"append failed under concurrent probes: ${appendErr.get()}")
    // quiesced: a copy of a doc from the LAST appended generation
    val fin = Dedup.dedupChunkAgainstIndex(
      synth(Seq(155L)).select(($"doc_id" + 7000).as("doc_id"), $"text"),
      $"text", "doc_id", ix)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(fin(7155L), s"appended generation invisible after quiesce: $fin")
    assert(Versioned.versions(spark, ix).size == 7)
  }

  test("REBUCKET is a CAS: a stale read-rewrite-overwrite cannot drop " +
    "an interleaved chunk append; the guarded migration keeps it") {
    val ix = tmpDir("bandixcas") + "/index"
    Dedup.writeBandIndex(synth(1L to 60L), $"text", "doc_id", ix) // v0
    Dedup.writeBandIndex(synth(200L to 220L), $"text", "doc_id", ix,
      mode = "append") // v1 — the chunk a lost-update rebucket would drop
    // the lost-update shape rebucketBandIndex used to have: a rewrite
    // of the rows read at v0, committed as an unconditional overwrite,
    // silently drops v1 (its docs then re-admitted as "new" by every
    // later probe). The CAS must refuse to land on a moved base.
    val stale = Versioned.commitIf(
      Versioned.read(spark, ix, Some(0L)), ix, "overwrite", Map.empty,
      expectedBase = 0L, bucket = Some(("band_hash", 32)))
    assert(stale.isEmpty, "stale overwrite must not land on a moved base")
    assert(Versioned.versions(spark, ix).max == 1L,
      "refused CAS must leave the version chain untouched")
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 16)))
    // the guarded migration reads the REAL latest: append survives
    assert(Dedup.rebucketBandIndex(spark, ix, 32) == 32)
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 32)))
    val m = Dedup.dedupChunkAgainstIndex(
      synth(Seq(205L)).select(($"doc_id" + 9000).as("doc_id"), $"text"),
      $"text", "doc_id", ix)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m(9205L),
      "the interleaved append's docs must survive the migration")
  }

  test("append REFUSES (BucketLayoutChanged) when a REBUCKET lands in " +
    "its check-to-commit window — never old-layout files under the " +
    "new declaration; a re-run buckets under the landed layout") {
    val ix = tmpDir("bandixlc") + "/index"
    Dedup.writeBandIndex(synth(1L to 60L), $"text", "doc_id", ix,
      buckets = 4)
    @volatile var fired = false
    // suites run in PARALLEL against the shared session: guard the
    // global hook to THIS thread, or another suite's commit fires it
    // first (stealing the interleave from our append — and running a
    // rebucket inside an innocent suite's commit flow)
    val self = Thread.currentThread()
    Versioned.commitTestHook = () => if (Thread.currentThread() eq self) {
      Versioned.commitTestHook = () => () // inner commits must not recurse
      fired = true
      Dedup.rebucketBandIndex(spark, ix, 16)
      ()
    }
    val e =
      try intercept[Versioned.BucketLayoutChanged] {
        Dedup.writeBandIndex(synth(100L to 110L), $"text", "doc_id", ix,
          mode = "append")
      } finally Versioned.commitTestHook = () => ()
    assert(fired, "the interleave hook must have run")
    assert(e.getMessage.contains("band_hash/4") &&
      e.getMessage.contains("band_hash/16"),
      s"refusal must name both layouts: ${e.getMessage}")
    // nothing half-landed: the rebucket IS the latest, its rows intact
    assert(Versioned.bucketSpec(spark, ix).contains(("band_hash", 16)))
    // the re-run hashes under the landed layout and sticks
    assert(Dedup.writeBandIndex(synth(100L to 110L), $"text", "doc_id",
      ix, mode = "append").buckets == 16)
    val m = Dedup.dedupChunkAgainstIndex(
      synth(Seq(105L)).select(($"doc_id" + 9000).as("doc_id"), $"text"),
      $"text", "doc_id", ix)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m(9105L), "re-run append must be probeable under the new layout")
  }

  test("an all-short corpus (no banded docs) still writes a probeable " +
    "index: empty version WITH schema, chunk probes clean") {
    val ix = tmpDir("bandixe") + "/index"
    val shorts = Seq((1L, "alpha"), (2L, "x y")).toDF("doc_id", "text")
    Dedup.writeBandIndex(shorts, $"text", "doc_id", ix)
    val flags = Dedup.dedupChunkAgainstIndex(
      synth(Seq(7L)), $"text", "doc_id", ix)
    assert(flags.where($"dup_of_corpus" || $"dup_in_chunk").count() == 0)
  }
}
