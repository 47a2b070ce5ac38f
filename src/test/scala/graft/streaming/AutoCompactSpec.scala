package graft.streaming

import graft.SparkSpec
import graft.operators.{Similarity, Versioned}
import org.apache.spark.sql.DataFrame

/** The AutoCompact trigger's anti-thrash contract (r17 ADVICE): a
  * bucketed fold re-buckets small rows into one file per OCCUPIED
  * bucket, so an index with more occupied buckets than minSmallFiles
  * leaves a fold with the count-only trigger still tripped — a naive
  * policy would rewrite the whole young index on EVERY micro-batch.
  * The policy must instead fire only when minSmallFiles NEW small
  * files accumulated beyond the last fold's residue. */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def oneHot(axis: Int): Array[Float] =
    Array.tabulate(16)(d => if (d == axis) 1f else 0f)

  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, oneHot((i % 16).toInt))).toDF("vec_id", "embedding")

  test("a fold that cannot reduce the small-file count quiesces the " +
    "trigger until minSmallFiles NEW small files accumulate — no " +
    "every-batch whole-index rewrite when occupied buckets >= " +
    "minSmallFiles") {
    val path = tmpDir("acthrash") + "/index"
    val build = vecs(1L to 16L) // 16 occupied cells > minSmallFiles
    val cb = Similarity.buildCodebook(build, "embedding", "vec_id",
      nlist = 16)
    Similarity.writePersistedIvf(build, "embedding", cb, path)
    def smallFiles(): Int = Versioned.fileStats(spark, path)
      .valuesIterator.count(_.bytes.exists(_ < (1L << 20)))
    def versions(): Int = Versioned.versions(spark, path).length
    // every file is tiny at spec scale; the trigger wants 4 new ones
    val policy = AutoCompact(minBytes = 1L << 20, minSmallFiles = 4)
    assert(smallFiles() >= 4, s"setup: ${smallFiles()} small files")
    // first fold fires (floor 0) — and on a 16-occupied-bucket layout
    // it comes out with >= minSmallFiles files still small
    assert(policy.maybeCompact(spark, path).isDefined)
    val afterFirst = smallFiles()
    val vAfterFirst = versions()
    assert(afterFirst >= 4, s"this scenario needs an irreducible " +
      s"residue above the trigger, got $afterFirst")
    // the thrash case: with no new files, the policy must NOT fire
    // again (pre-fix it re-folded the whole young index every call)
    (1 to 3).foreach { i =>
      assert(policy.maybeCompact(spark, path).isEmpty,
        s"call $i re-folded with zero new small files")
    }
    assert(versions() == vAfterFirst, "a quiesced policy still committed")
    // fewer than minSmallFiles new files: still quiet
    Similarity.appendToPersistedIvf(vecs(100L to 102L), "embedding", cb,
      path)
    assert(policy.maybeCompact(spark, path).isEmpty,
      "fired below the new-file threshold")
    // ...but minSmallFiles NEW small files re-arm the trigger, and the
    // fold actually reduces (the new files merge into the residue)
    Similarity.appendToPersistedIvf(vecs(200L to 215L), "embedding", cb,
      path)
    val preFold = smallFiles()
    assert(preFold - afterFirst >= 4, s"setup: $afterFirst -> $preFold")
    assert(policy.maybeCompact(spark, path).isDefined,
      "did not re-arm after minSmallFiles new small files")
    assert(smallFiles() < preFold, "the re-armed fold reduced nothing")
    // the folded index still answers exactly: full probe == brute force
    // over everything appended
    val all = build.unionByName(vecs(100L to 102L))
      .unionByName(vecs(200L to 215L))
    val q = oneHot(7)
    val probed = Similarity.probePersistedIvf(spark, path, "embedding",
      "vec_id", q, nprobe = 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceTopK(all, "embedding", "vec_id",
      q, 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probed == brute, s"$probed vs $brute")
  }
}
