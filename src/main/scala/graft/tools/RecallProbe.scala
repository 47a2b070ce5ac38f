package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: measured recall@10 of the approximate ANN paths
  * against brute force, swept over their pruning knobs — the
  * quality-vs-cost curve an operator of the 100 TB deployment tunes.
  * Results are recorded in PERFORMANCE.md; re-run with
  * `sbt "runMain graft.tools.RecallProbe [sfDir]"`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables(spark, sfDir, "embeddings").cache()
    val queryIds = (0L until 20L)
    val corpus = emb.where(!col("vec_id").isin(queryIds: _*)).cache()
    corpus.count()

    def queryVec(id: Long): Array[Float] =
      emb.where(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).toArray

    def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet

    val brute = queryIds.map(q =>
      q -> topIds(Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
        queryVec(q), 10))).toMap

    println("IVF recall@10 vs nprobe (nlist=16, 2 Lloyd iters, 20 queries):")
    val codebook = Similarity.buildCodebook(corpus, "embedding", "vec_id",
      nlist = 16, refineIters = 2)
    val seedBook = Similarity.buildCodebook(corpus, "embedding", "vec_id",
      nlist = 16)
    val ivfRefined = Similarity.ivfAssign(corpus, "embedding", codebook).cache()
    val ivfSeed = Similarity.ivfAssign(corpus, "embedding", seedBook).cache()
    for (nprobe <- Seq(1, 2, 4, 8, 16)) {
      def recall(indexed: org.apache.spark.sql.DataFrame,
          book: Similarity.IvfCodebook): Double = {
        val hits = queryIds.map { q =>
          val approx = topIds(Similarity.ivfTopK(indexed, "embedding",
            "vec_id", queryVec(q), book, nprobe, 10))
          (approx & brute(q)).size
        }.sum
        hits / (10.0 * queryIds.size)
      }
      println(f"  nprobe=$nprobe%2d  refined=${recall(ivfRefined, codebook)}%.3f" +
        f"  seed=${recall(ivfSeed, seedBook)}%.3f")
    }

    println("LSH recall@10 vs probeHamming (6 planes, 20 queries):")
    val indexed = Similarity.index(corpus, "embedding", 6, 64).cache()
    for (h <- Seq(0, 1, 2, 3, 6)) {
      val hits = queryIds.map { q =>
        val approx = topIds(Similarity.lshTopK(indexed, "embedding",
          "vec_id", queryVec(q), 6, 10, probeHamming = h))
        (approx & brute(q)).size
      }.sum
      println(f"  hamming<=$h%d  recall=${hits / (10.0 * queryIds.size)}%.3f")
    }
    spark.stop()
  }
}
