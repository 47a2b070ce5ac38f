package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming ANN ingest (graft.streaming.AnnIngest): replay
  * idempotence BY CONSTRUCTION (no ledger — assignment depends only on
  * the frozen codebook), drift detection against the stream-seeded
  * baseline, dir-pruning over the multi-batch layout, and
  * checkpoint-restart convergence through a real stop/start. */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  /** One-hot 16-dim vectors: closed-form cosines (1 on the same axis,
    * 0 across axes), and the 8 lowest ids cover axes 0-7 so the seed
    * codebook assigns the build cohort at sim 1.0 exactly. */
  private def oneHot(axis: Int): Array[Float] =
    Array.tabulate(16)(d => if (d == axis) 1f else 0f)

  private def vecs(rows: (Long, Int)*): DataFrame =
    rows.map { case (id, a) => (id, oneHot(a)) }.toDF("vec_id", "embedding")

  test("replay is a byte-identical rewrite: same batch id twice leaves " +
    "the index and the baseline unchanged — no ledger needed") {
    val path = tmpDir("annreplay") + "/ivf"
    val b0 = vecs((1L to 8L).map(i => (i, (i % 8).toInt)): _*)
    val cb = Similarity.buildCodebook(b0, "embedding", "vec_id", nlist = 8)
    val first = AnnIngest.processBatch(b0, 0L, "embedding", cb, path)
    assert(first.appended == 8 && !first.retrainRecommended)
    val rows = spark.read.parquet(path)
      .select($"vec_id", $"list_id").as[(Long, Long)].collect().toSet
    val base = Similarity.readIvfStats(spark, path)
    val replay = AnnIngest.processBatch(b0, 0L, "embedding", cb, path)
    assert(replay == first, s"replay outcome diverged: $replay vs $first")
    assert(spark.read.parquet(path)
      .select($"vec_id", $"list_id").as[(Long, Long)].collect().toSet
      == rows, "replay changed the index contents")
    assert(Similarity.readIvfStats(spark, path) == base,
      "replay changed the drift baseline")
  }

  test("drift: the first batch seeds the baseline; an orthogonal later " +
    "batch flags retrainRecommended, an in-distribution one does not") {
    val path = tmpDir("anndrift") + "/ivf"
    val b0 = vecs((1L to 16L).map(i => (i, (i % 8).toInt)): _*)
    val cb = Similarity.buildCodebook(b0, "embedding", "vec_id", nlist = 8)
    assert(!AnnIngest.processBatch(b0, 0L, "embedding", cb, path)
      .retrainRecommended)
    assert(Similarity.readIvfStats(spark, path)
      .exists(s => math.abs(s.meanSim - 1.0) < 1e-9))
    assert(!AnnIngest.processBatch(
      vecs((100L to 107L).map(i => (i, (i % 8).toInt)): _*),
      1L, "embedding", cb, path).retrainRecommended)
    val shifted = AnnIngest.processBatch(
      vecs((200L to 207L).map(i => (i, 8 + (i % 8).toInt)): _*),
      2L, "embedding", cb, path)
    assert(shifted.retrainRecommended, s"orthogonal batch silent: $shifted")
  }

  test("streaming onto a build-once (root list_id=) layout refuses up " +
    "front — a mixed dir would be unreadable with no write-time error") {
    val path = tmpDir("annmixed") + "/ivf"
    val b0 = vecs((1L to 8L).map(i => (i, (i % 8).toInt)): _*)
    val cb = Similarity.buildCodebook(b0, "embedding", "vec_id", nlist = 8)
    Similarity.writePersistedIvf(b0, "embedding", cb, path)
    assert(intercept[IllegalStateException] {
      AnnIngest.processBatch(vecs(100L -> 1), 0L, "embedding", cb, path)
    }.getMessage.contains("fresh path"))
  }

  test("an EMPTY first batch never seeds the drift baseline — the first " +
    "non-empty cohort does, so the signal still arms") {
    val path = tmpDir("annempty") + "/ivf"
    val b0 = vecs((1L to 8L).map(i => (i, (i % 8).toInt)): _*)
    val cb = Similarity.buildCodebook(b0, "embedding", "vec_id", nlist = 8)
    // batch 0 delivers zero rows: an IvfStats(0, 0.0) baseline would
    // set the drift threshold at meanSim <= -1, silencing the flag for
    // the stream's lifetime
    assert(AnnIngest.processBatch(b0.limit(0), 0L, "embedding", cb, path)
      .appended == 0)
    assert(Similarity.readIvfStats(spark, path).isEmpty,
      "empty batch must not seed the baseline")
    assert(!AnnIngest.processBatch(b0, 1L, "embedding", cb, path)
      .retrainRecommended)
    assert(Similarity.readIvfStats(spark, path)
      .exists(s => s.vectors == 8 && math.abs(s.meanSim - 1.0) < 1e-9))
    // with the baseline armed by the non-empty batch, drift still fires
    assert(AnnIngest.processBatch(
      vecs((200L to 207L).map(i => (i, 8 + (i % 8).toInt)): _*),
      2L, "embedding", cb, path).retrainRecommended)
  }

  test("checkpoint-restart through a real stream: the full probe of the " +
    "streamed-in multi-batch index equals brute force on the union, " +
    "and a narrow probe still dir-prunes on list_id") {
    val base = tmpDir("annstream")
    val table = s"$base/vecs"
    val idx = s"$base/ivf"
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val corpus = emb.where($"vec_id" =!= 0)
    val q = emb.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    val cb = Similarity.buildCodebook(corpus.where($"vec_id" % 2 === 0),
      "embedding", "vec_id", nlist = 8)
    def startStream() = spark.readStream.format("graft-changes")
      .option("path", table).load()
      .writeStream
      .foreachBatch(AnnIngest.sink("embedding", cb, idx))
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update").start()
    graft.operators.Versioned.commit(
      corpus.where($"vec_id" % 2 === 0).coalesce(2), table)
    val q1 = startStream()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the checkpoint; v1 lands while the stream is down
    graft.operators.Versioned.commit(
      corpus.where($"vec_id" % 2 =!= 0).coalesce(2), table, "append")
    val q2 = startStream()
    try q2.processAllAvailable() finally q2.stop()
    val probed = Similarity.probePersistedIvf(spark, idx, "embedding",
      "vec_id", q, cb, nprobe = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
      q, 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(probed.toSeq == brute.toSeq,
      s"streamed index full probe diverged: ${probed.toSeq} vs ${brute.toSeq}")
    // dir-pruning holds across batch dirs: the innermost dirs a narrow
    // probe reads are <= nprobe distinct list_id= partitions
    val narrow = Similarity.probePersistedIvf(spark, idx, "embedding",
      "vec_id", q, cb, nprobe = 2, k = 5)
    val scan = narrow.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.nonEmpty, "no partition filters in probe")
    val readCells = scan.relation.location
      .listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files.map(_.getPath.getParent.getName)).distinct
    assert(readCells.nonEmpty && readCells.size <= 2 &&
      readCells.forall(_.startsWith("list_id=")), s"dirs read: $readCells")
  }
}
