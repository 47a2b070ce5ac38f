package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication queries over `documents` ([EXT]). Exact dedup and the
  * shingle-count probe are oracle-checked; the MinHash/SimHash
  * signature paths hash with Spark's xxhash64 (no DuckDB equivalent)
  * and are declared rows-only with ScalaTest coverage on injected
  * near-duplicates.
  *
  * The synthetic corpus has no true near-duplicates, so the pair
  * queries return *top-k most similar* (deterministically tiebroken)
  * rather than thresholded sets — same plan shape, never-empty result.
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- DD1 exact-dup groups: count + survivor per identical text
    "dd1_exact_groups" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .groupBy($"text")
          .agg(count(lit(1)).as("copies"), min($"doc_id").as("keep_id"))
          .select($"keep_id", $"copies")
      },
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS copies
        FROM documents GROUP BY text""")),

    // ---- DD2 exact dedup survivors (hash-groupBy keep-first)
    "dd2_exact_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Dedup.exactDedup(t(s, dir, "documents"), $"text", $"doc_id")
          .select($"doc_id", $"n_chars")
      },
      Some("""SELECT doc_id, n_chars FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""")),

    // ---- DD3 MinHash+LSH dedup survivors (shingle→minhash→band→bucket;
    // rows-only: xxhash64 family). Greedy keep-lowest-id per bucket.
    "dd3_minhash_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Dedup.minhashDedup(t(s, dir, "documents"), $"text", "doc_id",
          shingleSize = 3, numHashes = 16, bands = 4)
          .select($"doc_id", $"lang")
      },
      None,
      doc = "rows-only: MinHash signatures use Spark xxhash64"),

    // ---- DD4 SimHash 64-bit signatures + per-doc hamming vs corpus seed
    "dd4_simhash" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val sig = Dedup.withSimhash(t(s, dir, "documents"), $"text", "doc_id")
        sig.select($"doc_id", $"simhash")
      },
      None,
      doc = "rows-only: SimHash via xxhash64 token hashes"),

    // ---- DD5 n-gram shingle-set size (the Jaccard denominator probe) —
    // oracle-checked: DuckDB mirrors the 3-gram construction
    "dd5_ngram_shingles" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            size(graft.functions.TextFunctions.shingles($"text", 3))
              .as("n_shingles"))
      },
      Some("""SELECT doc_id, CAST(len(list_distinct(list_transform(
          range(1, len(string_split_regex(lower(text), '\s+')) - 1),
          i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
               string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
               string_split_regex(lower(text), '\s+')[i+2]))) AS INT) AS n_shingles
        FROM documents""")),

    // ---- DD6 n-gram Jaccard near-dup: LSH candidates (2-gram, r=1 bands)
    // verified with exact array_intersect/array_union Jaccard; top-20.
    "dd6_ngram_jaccard" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        // r=4 rows/band: candidate probability (1-(1-J^4)^4) stays tiny
        // for the corpus's J~0.1 background similarity — r=1 would make
        // ~70% of ALL pairs candidates (an O(n^2) blowup measured at
        // 369s for sf0.1; this shape runs in ~2s)
        val banded = Dedup.withBands(
          Dedup.withMinhashSignature(docs, $"text", shingleSize = 2,
            numHashes = 16), bands = 4, rowsPerBand = 4)
        val cands = Dedup.lshCandidatePairs(banded, "doc_id")
        Dedup.jaccardVerify(docs, $"text", "doc_id", cands,
            shingleSize = 2, threshold = 0.0)
          .orderBy($"jaccard".desc, $"id_a".asc, $"id_b".asc)
          .limit(20)
      },
      None,
      doc = "rows-only: LSH candidate generation uses xxhash64"),

    // ---- DD7 embedding-cosine near-dup pairs, hyperplane-LSH bucketed
    "dd7_embed_neardup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Similarity.nearDupPairs(
            t(s, dir, "embeddings"), "embedding", "vec_id",
            numPlanes = 6, dim = 64, threshold = -1.0)
          .orderBy($"score".desc, $"id_a".asc, $"id_b".asc)
          .limit(20)
      },
      None,
      doc = "rows-only: bucket assignment via fixed-seed hyperplanes")
  )
}
