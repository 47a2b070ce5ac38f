package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TRUE product quantization (ProductQuant + Similarity's scheme-2
  * index family): training determinism, codec round-trip, probe
  * parity with brute force under exact-reconstruction conditions,
  * persisted descriptor resolution, scheme cross-guards, append
  * re-encoding under the live state, and the source-based rebuild. */
class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  // dim 16 = 4 subspaces x 4 dims; one-hot corpus — every distinct
  // subvector appears among the lowest-id seed rows, so the trained
  // codebooks reconstruct EXACTLY (argmin distance 0) and the
  // approximate scorer degrades to the exact cosine: parity against
  // brute force is then bit-for-bit, not a recall bound.
  private def oneHot(axis: Int): Array[Float] =
    Array.tabulate(16)(d => if (d == axis) 1f else 0f)

  private lazy val corpus = (1L to 64L).map(i => (i, oneHot((i % 16).toInt)))
    .toDF("vec_id", "embedding")

  private lazy val cb = Similarity.buildCodebook(corpus, "embedding",
    "vec_id", nlist = 8)
  private lazy val books = ProductQuant.train(corpus, "embedding",
    "vec_id", numSub = 4, k = 32, iters = 2)

  test("train is deterministic, caps k at the seed supply, refuses " +
    "a non-divisible split, and codes are numSub bytes") {
    val again = ProductQuant.train(corpus, "embedding", "vec_id",
      numSub = 4, k = 32, iters = 2)
    assert(books.flat.toSeq == again.flat.toSeq &&
      books.k == again.k && books.subDim == again.subDim)
    assert(books.k == 32 && books.subDim == 4 && books.dim == 16)
    // a 10-row corpus supplies only 10 seeds
    val small = ProductQuant.train(corpus.limit(10), "embedding",
      "vec_id", numSub = 4, k = 256, iters = 0)
    assert(small.k == 10)
    intercept[IllegalArgumentException] {
      ProductQuant.train(corpus, "embedding", "vec_id", numSub = 5)
    }
    // storage form: one byte per subspace — the compression claim
    val codes = corpus.select(ProductQuant.encodeCol($"embedding",
      books).as("c")).head().getAs[Array[Byte]](0)
    assert(codes.length == 4)
    // zero-norm row → null codes (ranks nothing)
    val z = Seq((0L, Array.fill(16)(0f))).toDF("vec_id", "embedding")
    assert(z.select(ProductQuant.encodeCol($"embedding", books))
      .head().isNullAt(0))
  }

  test("codebooks codec round-trips bit-exactly and the fingerprint " +
    "is content-stable") {
    val rt = ProductQuant.decodeBooks(ProductQuant.encodeBooks(books))
    assert(rt.numSub == books.numSub && rt.subDim == books.subDim &&
      rt.k == books.k && rt.flat.toSeq == books.flat.toSeq)
    assert(ProductQuant.fingerprint(rt) ==
      ProductQuant.fingerprint(books))
    intercept[IllegalArgumentException] {
      ProductQuant.decodeBooks("garbage-header\n")
    }
    // a TRUNCATED sidecar (header + a prefix of centroid lines — the
    // out-of-band damage class) must refuse loudly, never zero-fill
    val enc = ProductQuant.encodeBooks(books)
    val truncated = enc.split('\n').take(1 + books.numSub * books.k / 2)
      .mkString("\n")
    val e = intercept[IllegalArgumentException] {
      ProductQuant.decodeBooks(truncated)
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("single and batch product probes equal brute force at full " +
    "nprobe (exact reconstruction corpus), and batch equals single " +
    "per query when pruned") {
    val pq = Similarity.ivfProductIndex(corpus, "embedding", "vec_id",
      cb, books)
    assert(pq.columns.toSeq == Seq("vec_id", "list_id", "pq_code"))
    val q = oneHot(5)
    val brute = Similarity.bruteForceTopK(corpus, "embedding",
      "vec_id", q, 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val single = Similarity.ivfProductTopK(pq, corpus, "embedding",
      "vec_id", q, cb, books, nprobe = 8, m = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(single.toSeq == brute.toSeq, s"${single.toSeq} vs ${brute.toSeq}")
    val queries = Seq(3, 5, 9).map(a => (a.toLong, oneHot(a)))
      .toDF("qid", "qemb")
    def asMap(f: org.apache.spark.sql.DataFrame) = f.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (nprobe <- Seq(2, 8)) {
      val many = asMap(Similarity.ivfProductTopKMany(pq, corpus,
        "embedding", "vec_id", queries, "qid", "qemb", cb, books,
        nprobe, m = 20, k = 3))
      Seq(3, 5, 9).foreach { a =>
        val s = Similarity.ivfProductTopK(pq, corpus, "embedding",
          "vec_id", oneHot(a), cb, books, nprobe, m = 20, k = 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(many(a.toLong) == s, s"nprobe=$nprobe axis $a")
      }
    }
    // isin point-fetch vs broadcast semi-join rescore parity
    val viaJoin = asMap(Similarity.ivfProductTopKMany(pq, corpus,
      "embedding", "vec_id", queries, "qid", "qemb", cb, books, 8, 20,
      3, idLiteralCap = 0))
    val viaIsin = asMap(Similarity.ivfProductTopKMany(pq, corpus,
      "embedding", "vec_id", queries, "qid", "qemb", cb, books, 8, 20,
      3))
    assert(viaJoin == viaIsin)
    // dim mismatch between the two codebook families refuses
    intercept[IllegalArgumentException] {
      Similarity.ivfProductIndex(corpus, "embedding", "vec_id", cb,
        ProductQuant.PqCodebooks(2, 4, 1, new Array[Double](8)))
    }
    // zero-norm query RANKS NOTHING — the family convention (the
    // float/int8 probes return empty via null cosines); the ADC
    // probe must return the same empty frame, not throw
    val zero = Similarity.ivfProductTopK(pq, corpus, "embedding",
      "vec_id", Array.fill(16)(0f), cb, books, nprobe = 8, m = 20,
      k = 3)
    assert(zero.columns.toSeq == Seq("vec_id", "score") &&
      zero.count() == 0)
  }

  test("persisted product index: write resolves scheme 2 with books, " +
    "probes match in-memory, scheme cross-guards refuse, append " +
    "lands and stays scheme 2, rebuild retrains from source") {
    val path = tmpDir("pqprod") + "/idx"
    val stats = Similarity.writePersistedIvfProduct(corpus, "embedding",
      "vec_id", cb, books, path)
    assert(stats.vectors == 64)
    val st = Similarity.loadPersistedIvf(spark, path).get
    assert(st.pq && st.pqBooks.nonEmpty &&
      st.pqFingerprint.contains(ProductQuant.fingerprint(books)))
    // persisted probe == in-memory probe (single + batch)
    val q = oneHot(7)
    val mem = Similarity.ivfProductTopK(
      Similarity.ivfProductIndex(corpus, "embedding", "vec_id", cb,
        books), corpus, "embedding", "vec_id", q, cb, books, 8, 64, 5)
      .collect().toSeq
    val per = Similarity.probePersistedIvfProduct(spark, path, corpus,
      "embedding", "vec_id", q, 8, 64, 5).collect().toSeq
    assert(per == mem)
    val queries = Seq((7L, oneHot(7))).toDF("qid", "qemb")
    val perMany = Similarity.probePersistedIvfProductMany(spark, path,
      corpus, "embedding", "vec_id", queries, "qid", "qemb", 8, 64, 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(perMany == per.map(r => (r.getLong(0), r.getDouble(1))))
    // cross-guards: every other-family entry point refuses scheme 2
    assert(intercept[IllegalArgumentException] {
      Similarity.probePersistedIvfPq(spark, path, corpus, "embedding",
        "vec_id", q, 8, 64, 5)
    }.getMessage.contains("probePersistedIvfProduct"))
    assert(intercept[IllegalArgumentException] {
      Similarity.appendToPersistedIvfPq(corpus, "embedding", "vec_id",
        cb, path)
    }.getMessage.contains("appendToPersistedIvfProduct"))
    assert(intercept[IllegalArgumentException] {
      Similarity.rebuildPersistedIvfPq(spark, path, corpus,
        "embedding", "vec_id", nlist = 8)
    }.getMessage.contains("rebuildPersistedIvfProduct"))
    // ...and the product probe refuses an int8 index
    val pqPath = tmpDir("pqint8") + "/idx"
    Similarity.writePersistedIvfPq(corpus, "embedding", "vec_id", cb,
      pqPath)
    assert(intercept[IllegalArgumentException] {
      Similarity.probePersistedIvfProduct(spark, pqPath, corpus,
        "embedding", "vec_id", q, 8, 64, 5)
    }.getMessage.contains("not a product-quantized index"))
    // append: new rows retrievable, descriptor still scheme 2
    val extra = (100L to 103L).map(i => (i, oneHot((i % 16).toInt)))
      .toDF("vec_id", "embedding")
    val app = Similarity.appendToPersistedIvfProduct(extra, "embedding",
      "vec_id", path)
    assert(app.appended == 4)
    val st2 = Similarity.loadPersistedIvf(spark, path).get
    assert(st2.pqBooks.nonEmpty &&
      st2.pqFingerprint == st.pqFingerprint && st2.version > st.version)
    val hit = Similarity.probePersistedIvfProduct(spark, path,
      corpus.unionByName(extra), "embedding", "vec_id", oneHot(4),
      8, 68, 68).collect().map(_.getLong(0)).toSet
    assert(hit.contains(100L), s"appended id missing from $hit")
    // rebuild from a grown source: fresh codebooks, epoch bump, full
    // probe equals brute force on the new corpus
    val grown = corpus.unionByName(extra)
    val e0 = Similarity.rebuildEpoch(spark, path)
    val (cb2, books2, stats2) = Similarity.rebuildPersistedIvfProduct(
      spark, path, grown, "embedding", "vec_id", nlist = 8,
      numSub = 4, kSub = 32, pqIters = 1)
    assert(stats2.vectors == 68)
    assert(Similarity.rebuildEpoch(spark, path) == e0 + 1)
    val st3 = Similarity.loadPersistedIvf(spark, path).get
    assert(st3.fingerprint == Similarity.fingerprint(cb2) &&
      st3.pqFingerprint.contains(ProductQuant.fingerprint(books2)))
    val brute = Similarity.bruteForceTopK(grown, "embedding", "vec_id",
      oneHot(9), 5).collect().toSeq
    val reb = Similarity.probePersistedIvfProduct(spark, path, grown,
      "embedding", "vec_id", oneHot(9), 8, 68, 5).collect().toSeq
    assert(reb == brute, s"$reb vs $brute")
  }

  test("streaming product ingest (processBatch): seed commits scheme " +
    "2, batches append product codes, replay skips, and AutoRebuild " +
    "dispatches to the product rebuild on drift — post-rebuild full " +
    "probe equals brute force") {
    import graft.streaming.AnnIngest
    val path = tmpDir("pqstream") + "/idx"
    val b0 = corpus.where($"vec_id" <= 32L)
    val b1 = corpus.where($"vec_id" > 32L)
    val o0 = AnnIngest.processBatch(b0, 0L, "embedding", cb, path,
      pqId = Some("vec_id"), productBooks = Some(books))
    assert(o0.appended == 32 && !o0.replayed)
    val st = Similarity.loadPersistedIvf(spark, path).get
    assert(st.pqBooks.nonEmpty, "stream seed did not commit scheme 2")
    // replay of batch 0 must skip without touching the index
    val r0 = AnnIngest.processBatch(b0, 0L, "embedding", cb, path,
      pqId = Some("vec_id"), productBooks = Some(books))
    assert(r0.replayed && Versioned.read(spark, path).count() == 32)
    val o1 = AnnIngest.processBatch(b1, 1L, "embedding", cb, path,
      pqId = Some("vec_id"), productBooks = Some(books))
    assert(o1.appended == 32)
    // full probe over the streamed-in index == brute force
    val brute = Similarity.bruteForceTopK(corpus, "embedding",
      "vec_id", oneHot(3), 5).collect().toSeq
    assert(Similarity.probePersistedIvfProduct(spark, path, corpus,
      "embedding", "vec_id", oneHot(3), 8, 64, 5).collect().toSeq
      == brute)
    // a drifted cohort (negated vectors: assignment cosine <= 0 trips
    // the absolute floor) under AutoRebuild → the PRODUCT rebuild
    // fires, retraining books from the source; probe stays exact
    val drifted = (500L to 515L)
      .map(i => (i, oneHot((i % 16).toInt).map(x => -x)))
      .toDF("vec_id", "embedding")
    val source = corpus.unionByName(drifted)
    val o2 = AnnIngest.processBatch(drifted, 2L, "embedding", cb, path,
      pqId = Some("vec_id"),
      autoRebuild = Some(AnnIngest.AutoRebuild(_ => source, "vec_id")))
    assert(o2.retrainRecommended && o2.retrained,
      s"drifted cohort did not fire the product rebuild: $o2")
    val st2 = Similarity.loadPersistedIvf(spark, path).get
    assert(st2.pqBooks.nonEmpty &&
      st2.pqBooks.get.numSub == books.numSub,
      "rebuild changed the subspace shape or demoted the scheme")
    val brute2 = Similarity.bruteForceTopK(source, "embedding",
      "vec_id", oneHot(9), 5).collect().toSeq
    assert(Similarity.probePersistedIvfProduct(spark, path, source,
      "embedding", "vec_id", oneHot(9), 8, 200, 5).collect().toSeq
      == brute2)
  }

  test("declared sim8 recall queries hold their oracle guarantee on " +
    "the real embeddings table (the driver's hash check, locally)") {
    val defs = graft.queries.SimilarityQueries.defs.toMap
    // single probe: the injected copy MUST come back as the exact-1.0
    // top hit
    val single = defs("sim8_product_recall").build(spark, sfDir)
      .collect()
    assert(single.length == 1 && single(0).getLong(0) == 1000000L &&
      single(0).getDouble(1) == 1.0, single.mkString(","))
    // batch probe: all ten injected copies retrieved at exactly 1.0
    val batch = defs("sim8_product_batch_recall").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(batch.length == 10 &&
      batch.forall { case (q, h, s) => h == q + 1000000L && s == 1.0 },
      batch.mkString(","))
  }

  test("append racing a rebuild: a cohort absorbed by the rebuild's " +
    "source read is anti-joined on the stale-epoch retry — no " +
    "duplicate ids (the source-first protocol's guarantee)") {
    val path = tmpDir("pqabs") + "/idx"
    Similarity.writePersistedIvfProduct(corpus, "embedding", "vec_id",
      cb, books, path)
    // the appender captures its epoch token BEFORE its cohort enters
    // the source...
    val token = Similarity.rebuildEpoch(spark, path)
    val cohort = (200L to 204L).map(i => (i, oneHot((i % 16).toInt)))
      .toDF("vec_id", "embedding")
    val source = corpus.unionByName(cohort)
    // ...then a rebuild absorbs the source (cohort included) first
    Similarity.rebuildPersistedIvfProduct(spark, path, source,
      "embedding", "vec_id", nlist = 8, numSub = 4, kSub = 32)
    // the delayed index append must detect the epoch advance and drop
    // the already-absorbed rows
    val app = Similarity.appendToPersistedIvfProduct(cohort,
      "embedding", "vec_id", path, sourceEpoch = Some(token))
    assert(app.appended == 0, s"absorbed cohort re-appended: $app")
    val ids = Versioned.read(spark, path).select($"vec_id").collect()
      .map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      "duplicate vec_ids after rebuild/append race")
    assert(ids.length == 69)
  }
}
