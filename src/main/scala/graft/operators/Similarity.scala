package graft.operators

import graft.functions.{CosineSimilarity, VectorFunctions}
import graft.functions.VectorFunctions.{hyperplaneBucket, makePlanes}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ArrayType(Float)), [EXT] per the north star.
  *
  *  - `bruteForceTopK`: exact cosine top-k against a literal query
  *    vector — a single narrow pass + a k-row total sort (`orderBy` +
  *    `limit` compiles to TakeOrderedAndProject: each partition keeps
  *    only its local top-k, the driver merges k·p rows). Linear scan,
  *    but embarrassingly parallel — the right baseline at any scale.
  *  - `lshTopK`: random-hyperplane LSH variant — vectors are bucketed
  *    by sign pattern once (an indexing pass you'd persist,
  *    partitioned by bucket); queries probe only buckets within
  *    `probeHamming` of the query's bucket, pruning the scan to
  *    buckets/2^h of the corpus. This is the 100 TB path: the probe
  *    is a partition-pruned read, not a full scan.
  */
object Similarity {

  def bruteForceTopK(df: DataFrame, embedding: String, id: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = lit(query.map(_.toDouble))
    df.withColumn("score", CosineSimilarity(col(embedding), q))
      .select(col(id), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  /** Bucket every vector by `numPlanes` hyperplane signs (the index). */
  def index(df: DataFrame, embedding: String, numPlanes: Int, dim: Int): DataFrame =
    df.withColumn("bucket",
      hyperplaneBucket(col(embedding), makePlanes(numPlanes, dim)))

  def lshTopK(indexed: DataFrame, embedding: String, id: String,
      query: Array[Float], numPlanes: Int, k: Int,
      probeHamming: Int = 1): DataFrame = {
    val dim = query.length
    val planes = makePlanes(numPlanes, dim)
    // query bucket computed driver-side (same plane family)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (w, x) => w * x.toDouble }.sum
      if (d > 0) 1L << i else 0L
    }.sum
    val q = lit(query.map(_.toDouble))
    indexed
      .where(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .withColumn("score", CosineSimilarity(col(embedding), q))
      .select(col(id), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs are
    * generated only within a bucket (plus its full-signature match),
    * never corpus × corpus. */
  def nearDupPairs(df: DataFrame, embedding: String, id: String,
      numPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    val ix = index(df, embedding, numPlanes, dim)
    val l = ix.select(col("bucket"), col(id).as("id_a"),
      col(embedding).as("emb_a"))
    val r = ix.select(col("bucket"), col(id).as("id_b"),
      col(embedding).as("emb_b"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("score", CosineSimilarity(col("emb_a"), col("emb_b")))
      .where(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score"))
  }
}
