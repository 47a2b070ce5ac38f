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
  * The synthetic corpus has no exact-duplicate texts but DOES carry
  * ~25 true near-duplicate pairs (2-gram Jaccard ≥ 0.9 at sf0.01), so
  * the top-k pair queries are never empty and the dd6 ground-truth
  * self-check below exercises real recall, not just injected copies.
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
      doc = "rows-only: bucket assignment via fixed-seed hyperplanes"),

    // ======== semantic self-checks for the hash-family paths ========
    // The xxhash64/hyperplane internals have no DuckDB mirror, but their
    // GUARANTEED effects on injected exact duplicates do: an exact copy
    // has an identical signature in every band/bucket, so detection is
    // certain (not probabilistic) and the outcome is SQL-predictable.

    // ---- DD3 self-check: inject exact copies of docs 0..19 (new ids
    // +1_000_000); every copy MUST share all LSH buckets with its lower-
    // id source, so greedy keep-lowest removes all 20 — hash-checked.
    "dd3_injected_dups" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val injected = docs.where($"doc_id" < 20)
          .withColumn("doc_id", $"doc_id" + 1000000L)
        val survivors = Dedup.minhashDedup(docs.unionByName(injected),
          $"text", "doc_id", shingleSize = 3, numHashes = 16, bands = 4)
        injected.agg(count(lit(1)).as("injected_total")).crossJoin(
          survivors.agg(count(when($"doc_id" >= 1000000L, 1))
            .as("injected_survivors")))
      },
      Some("""SELECT count(*) AS injected_total,
        CAST(0 AS BIGINT) AS injected_survivors
        FROM documents WHERE doc_id < 20""")),

    // ---- DD4 self-check: SimHash of an exact copy is bit-identical, so
    // hamming(sig(doc), sig(copy)) = 0 for every injected pair.
    "dd4_hamming_zero" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val injected = docs.where($"doc_id" < 20)
          .withColumn("doc_id", $"doc_id" + 1000000L)
        val sigs = Dedup.withSimhash(docs.unionByName(injected),
          $"text", "doc_id")
        val a = sigs.where($"doc_id" < 20)
          .select($"doc_id", $"simhash".as("sig_a"))
        val b = sigs.where($"doc_id" >= 1000000L)
          .select(($"doc_id" - 1000000L).as("doc_id"), $"simhash".as("sig_b"))
        a.join(b, Seq("doc_id"))
          .select($"doc_id",
            Dedup.hamming($"sig_a", $"sig_b").cast("int").as("hamming"))
      },
      Some("""SELECT doc_id, CAST(0 AS INT) AS hamming
        FROM documents WHERE doc_id < 20""")),

    // ---- DD6 self-check against GROUND TRUTH: the oracle brute-forces
    // all-pairs 2-gram Jaccard in DuckDB (O(n²) is fine for an oracle;
    // the Spark side stays LSH-bucketed), so a hash match proves the
    // LSH path's recall is exactly 100% on this corpus at the chosen
    // threshold. 0.95 is the recall knee for b=4/r=4: P(miss J=0.95) ≈
    // 7e-4 vs ≈1e-2 at 0.90 — and indeed the corpus's one J=0.909 pair
    // is missed while every pair ≥0.956 is found. Exact copies of docs
    // 0..19 are injected (ids +1_000_000) so guaranteed-catch J=1.0
    // pairs are present in every corpus.
    "dd6_jaccard_exact" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val injected = docs.where($"doc_id" < 20)
          .withColumn("doc_id", $"doc_id" + 1000000L)
        val all = docs.unionByName(injected)
        val banded = Dedup.withBands(
          Dedup.withMinhashSignature(all, $"text", shingleSize = 2,
            numHashes = 16), bands = 4, rowsPerBand = 4)
        val cands = Dedup.lshCandidatePairs(banded, "doc_id")
        Dedup.jaccardVerify(all, $"text", "doc_id", cands,
          shingleSize = 2, threshold = 0.95)
      },
      Some("""WITH docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(string_split_regex(lower(text), '\s+'))),
            i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+1])) AS s
          FROM docs)
        SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            len(list_intersect(a.s, b.s))::DOUBLE /
              len(list_distinct(list_concat(a.s, b.s))) AS j
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        WHERE j >= 0.95""")),

    // ---- DD7 self-check: an exact vector copy lands in the same
    // hyperplane bucket by construction (identical signs), cosine
    // exactly 1.0; no original pair exceeds 0.52 (measured), so at
    // threshold 0.999 the output is exactly the injected pairs.
    "dd7_injected_pairs" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val vecs = t(s, dir, "embeddings")
        val injected = vecs.where($"vec_id" < 20)
          .withColumn("vec_id", $"vec_id" + 1000000L)
        graft.operators.Similarity.nearDupPairs(
            vecs.unionByName(injected), "embedding", "vec_id",
            numPlanes = 6, dim = 64, threshold = 0.999)
      },
      Some("""SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
        CAST(1.0 AS DOUBLE) AS score
        FROM embeddings WHERE vec_id < 20""")),

    // ---- DD8 connected components over near-dup edges (large-star /
    // small-star, O(log n) rounds). Pair generation (dd6/dd7) emits
    // near-dup PAIRS; survivor selection needs transitive CLUSTERS.
    // Edge set here is SQL-mirrorable by construction — consecutive
    // doc_ids sharing a lang — which makes the components maximal runs
    // of same-lang ids: chains, the adversarial case for naive
    // min-propagation (O(diameter) rounds; log here), and exactly
    // computable in DuckDB via gaps-and-islands window SQL.
    "dd8_components" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val x = docs.select($"doc_id", $"lang")
        val edges = x.as("a").join(x.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1 &&
              col("b.lang") === col("a.lang"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        graft.operators.Components
          .assign(docs.select($"doc_id"), "doc_id", edges, "id_a", "id_b")
          .select($"doc_id", $"component")
      },
      Some("""SELECT doc_id, min(doc_id) OVER (PARTITION BY lang, grp)
          AS component
        FROM (SELECT doc_id, lang,
                doc_id - ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id)
                  AS grp
              FROM documents)""")),

    // ---- DD8 cluster-survivor selection: one canonical doc per
    // component (the component minimum), the end-to-end dedup contract
    // the pair queries feed. Survivor count == number of islands.
    "dd8_cluster_survivors" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val x = docs.select($"doc_id", $"lang")
        val edges = x.as("a").join(x.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1 &&
              col("b.lang") === col("a.lang"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        graft.operators.Components
          .assign(docs, "doc_id", edges, "id_a", "id_b")
          .where($"doc_id" === $"component")
          .groupBy($"lang")
          .agg(count(lit(1)).as("survivors"))
      },
      Some("""SELECT lang, count(*) AS survivors
        FROM (SELECT lang, doc_id,
                min(doc_id) OVER (PARTITION BY lang, grp) AS component
              FROM (SELECT doc_id, lang,
                      doc_id - ROW_NUMBER() OVER
                        (PARTITION BY lang ORDER BY doc_id) AS grp
                    FROM documents))
        WHERE doc_id = component GROUP BY lang""")),

    // ---- DD10 incremental dedup against a PERSISTED corpus index —
    // the production shape at 100 TB: the corpus is MinHash-band-
    // indexed once (memoized per JVM/sf here); each arriving chunk
    // probes the index, so dedup cost tracks the chunk, and corpus
    // documents are never re-read. The chunk = unseen originals
    // (doc_id%10=0) + injected corpus copies (+10M) + an in-chunk
    // second copy of every 40th doc (+20M; offsets far beyond any
    // scale factor's id range, and disjoint so classes can't collide).
    // Exact copies share the
    // full signature so every band collides — the oracle asserts 100%
    // RECALL on both injected classes (the dd3 count device; per-doc
    // flags on ORIGINALS are legitimately non-closed-form because the
    // corpus carries true near-duplicates the LSH correctly catches —
    // per-doc behavior is spec-checked on pairwise-independent texts
    // in OperatorSpec instead).
    "dd10_incremental_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select($"doc_id", $"text")
        val corpus = docs.where($"doc_id" % 10 =!= 0)
        val indexPath = ddStages.computeIfAbsent(s"$dir|dd10", { _ =>
          val p = java.nio.file.Files
            .createTempDirectory("dd10").toString + "/index"
          Dedup.writeBandIndex(corpus, $"text", "doc_id", p)
          p
        })
        val originals = docs.where($"doc_id" % 10 === 0)
        val chunk = originals
          .unionByName(corpus.where($"doc_id" % 20 === 1)
            .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
          .unionByName(originals.where($"doc_id" % 40 === 0)
            .select(($"doc_id" + 20000000L).as("doc_id"), $"text"))
        Dedup.dedupChunkAgainstIndex(chunk, $"text", "doc_id", indexPath)
          .where($"doc_id" >= 10000000L)
          .select(
            when($"doc_id" >= 20000000L, "chunk_copy")
              .otherwise("corpus_copy").as("kind"),
            // the guaranteed flag per class: corpus copies collide with
            // the index, in-chunk copies are dominated by their original
            when($"doc_id" >= 20000000L, $"dup_in_chunk")
              .otherwise($"dup_of_corpus").cast("long").as("flagged"))
          .groupBy($"kind")
          .agg(count(lit(1)).as("n"), sum($"flagged").as("n_flagged"))
      },
      Some("""SELECT 'corpus_copy' AS kind, count(*) AS n,
            count(*) AS n_flagged
          FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 20 = 1
        UNION ALL
        SELECT 'chunk_copy', count(*), count(*)
          FROM documents WHERE doc_id % 10 = 0 AND doc_id % 40 = 0"""))
  )

  private val ddStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
}
