package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{ProductQuant, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN similarity search over `embeddings` ([EXT]). Brute-force cosine
  * top-k is the exact baseline (oracle-checked against a manual
  * double-precision DuckDB expression — DuckDB's builtin
  * list_cosine_similarity accumulates in float32 and diverges at 1e-7);
  * the LSH variant is the partition-pruned scale path.
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Query vector: embedding of vec_id 0 (single-row driver lookup). */
  private def queryVec(s: SparkSession, dir: String): Array[Float] =
    t(s, dir, "embeddings").where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- SIM1 brute-force cosine top-10 (TakeOrderedAndProject: each
    // partition keeps its local top-k — no global sort materialization)
    "sim1_brute_topk" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.bruteForceTopK(
          t(s, dir, "embeddings").where(col("vec_id") =!= 0),
          "embedding", "vec_id", q, k = 10)
      },
      Some(bruteForceSql)),

    // ---- SIM2 LSH-bucketed ANN top-10: probe only buckets within
    // hamming distance 2 of the query bucket (partition-pruned scan)
    "sim2_lsh_topk" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val indexed = Similarity.index(
          t(s, dir, "embeddings").where(col("vec_id") =!= 0),
          "embedding", numPlanes = 6, dim = 64)
        Similarity.lshTopK(indexed, "embedding", "vec_id", q,
          numPlanes = 6, k = 10, probeHamming = 2)
      },
      None,
      doc = "rows-only: approximate — bucket pruning changes the candidate set"),

    // ---- SIM3 IVF ANN top-10: data-adaptive inverted lists (2 Lloyd
    // refinement iterations), probe the 4 nearest of 16 cells
    // (partition-pruned scan at scale)
    "sim3_ivf_topk" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val corpus = t(s, dir, "embeddings").where(col("vec_id") =!= 0)
        val codebook = Similarity.buildCodebook(corpus, "embedding",
          "vec_id", nlist = 16, refineIters = 2)
        val indexed = Similarity.ivfAssign(corpus, "embedding", codebook)
        Similarity.ivfTopK(indexed, "embedding", "vec_id", q,
          codebook, nprobe = 4, k = 10)
      },
      None,
      doc = "rows-only: approximate — IVF cell pruning changes the candidate set"),

    // ---- SIM2 semantic self-check: probing the FULL Hamming radius
    // degrades LSH to exact search, so the whole index+probe machinery
    // must reproduce the brute-force top-10 bit-for-bit — hash-checked
    // against the same DuckDB brute-force oracle as sim1.
    "sim2_full_probe" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val indexed = Similarity.index(
          t(s, dir, "embeddings").where(col("vec_id") =!= 0),
          "embedding", numPlanes = 6, dim = 64)
        Similarity.lshTopK(indexed, "embedding", "vec_id", q,
          numPlanes = 6, k = 10, probeHamming = 6)
      },
      Some(bruteForceSql)),

    // ---- SIM3 semantic self-check: probing ALL nlist cells degrades
    // IVF to exact search — refined-codebook assignment + probe must
    // reproduce the brute-force top-10 exactly.
    "sim3_full_probe" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val corpus = t(s, dir, "embeddings").where(col("vec_id") =!= 0)
        val codebook = Similarity.buildCodebook(corpus, "embedding",
          "vec_id", nlist = 16, refineIters = 2)
        val indexed = Similarity.ivfAssign(corpus, "embedding", codebook)
        Similarity.ivfTopK(indexed, "embedding", "vec_id", q,
          codebook, nprobe = 16, k = 10)
      },
      Some(bruteForceSql)),

    // ---- SIM4 BATCH probe: ten query vectors against the corpus in
    // ONE join (per-query probe cells over the codebook literal →
    // explode → join on list_id → window top-k) — the shape a
    // training pipeline probes in, where a driver loop of single
    // probes would compile a plan per query. Declared at nprobe =
    // nlist, which degrades every query to exact search: the DuckDB
    // oracle is the per-query brute-force cross join.
    "sim4_batch_probe" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val corpus = emb.where(col("vec_id") >= 10)
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        Similarity.ivfTopKMany(
          Similarity.ivfAssign(corpus, "embedding", cb),
          "embedding", "vec_id", queries, "qid", "qemb", cb,
          nprobe = 16, k = 5)
      },
      Some("""SELECT qid, vec_id, score FROM (
          SELECT q.vec_id AS qid, c.vec_id AS vec_id,
            round(
              list_sum(list_transform(range(1, len(c.embedding) + 1),
                i -> c.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(c.embedding,
                 x -> x::DOUBLE * x::DOUBLE))) *
               sqrt(list_sum(list_transform(q.embedding,
                 x -> x::DOUBLE * x::DOUBLE)))), 4) AS score,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              round(
                list_sum(list_transform(range(1, len(c.embedding) + 1),
                  i -> c.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) /
                (sqrt(list_sum(list_transform(c.embedding,
                   x -> x::DOUBLE * x::DOUBLE))) *
                 sqrt(list_sum(list_transform(q.embedding,
                   x -> x::DOUBLE * x::DOUBLE)))), 4) DESC,
              c.vec_id ASC) AS rn
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 10 AND c.vec_id >= 10
        ) WHERE rn <= 5"""),
      doc = "batch ANN probe at nprobe = nlist: exact per query"),

    // ---- SIM5 PRUNED batch probe: sim4's shape at nprobe ≪ nlist —
    // the production form, where the static cell-set isin restores
    // plan-time bucket pruning and each query reads ~nprobe/nlist of
    // the index. Approximate by design (rows-only); the guaranteed
    // fraction of its recall is hash-checked by sim5_pruned_recall.
    "sim5_batch_probe_pruned" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val corpus = emb.where(col("vec_id") >= 10)
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        Similarity.ivfTopKMany(
          Similarity.ivfAssign(corpus, "embedding", cb),
          "embedding", "vec_id", queries, "qid", "qemb", cb,
          nprobe = 4, k = 5)
      },
      None,
      doc = "rows-only: cell pruning changes the candidate set"),

    // ---- SIM5 self-check: an exact COPY of each query vector injected
    // into the corpus is GUARANTEED retrievable by the pruned probe —
    // the copy's assignment cell is the query's own top-1 probe cell
    // (identical vector, identical argmax), so any nprobe ≥ 1 finds it
    // at cosine exactly 1.0. SQL-predictable (the dd3/dd6 self-check
    // pattern), hash-checked.
    "sim5_pruned_recall" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val corpus = emb.where(col("vec_id") >= 10).unionByName(
          emb.where(col("vec_id") < 10)
            .withColumn("vec_id", col("vec_id") + 1000000L))
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        Similarity.ivfTopKMany(
            Similarity.ivfAssign(corpus, "embedding", cb),
            "embedding", "vec_id", queries, "qid", "qemb", cb,
            nprobe = 4, k = 5)
          .where(col("vec_id") === col("qid") + 1000000L)
          .select(col("qid"), col("vec_id").as("hit_id"), col("score"))
      },
      Some("""SELECT vec_id AS qid, vec_id + 1000000 AS hit_id,
          CAST(1.0 AS DOUBLE) AS score
        FROM embeddings WHERE vec_id < 10""")),

    // ---- SIM6 LSH batch probe, pruned: every query's Hamming ball as
    // one query-independent XOR-mask explode, joined on the bucket —
    // the lshTopKMany ball path the spec pins against the single
    // probe. Approximate (rows-only), like sim2.
    "sim6_lsh_batch_probe" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val indexed = Similarity.index(emb.where(col("vec_id") >= 10),
          "embedding", numPlanes = 6, dim = 64)
        Similarity.lshTopKMany(indexed, "embedding", "vec_id", queries,
          "qid", "qemb", numPlanes = 6, dim = 64, probeHamming = 2,
          k = 5)
      },
      None,
      doc = "rows-only: bucket-ball pruning changes the candidate set"),

    // ---- SIM6 self-check: probeHamming = numPlanes makes every
    // bucket in-ball, degrading the batch to exact per-query brute
    // force (the cross-join path) — hash-checked against the same
    // per-query DuckDB brute force as sim4.
    "sim6_full_probe" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val indexed = Similarity.index(emb.where(col("vec_id") >= 10),
          "embedding", numPlanes = 6, dim = 64)
        Similarity.lshTopKMany(indexed, "embedding", "vec_id", queries,
          "qid", "qemb", numPlanes = 6, dim = 64, probeHamming = 6,
          k = 5)
      },
      Some("""SELECT qid, vec_id, score FROM (
          SELECT q.vec_id AS qid, c.vec_id AS vec_id,
            round(
              list_sum(list_transform(range(1, len(c.embedding) + 1),
                i -> c.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(c.embedding,
                 x -> x::DOUBLE * x::DOUBLE))) *
               sqrt(list_sum(list_transform(q.embedding,
                 x -> x::DOUBLE * x::DOUBLE)))), 4) AS score,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              round(
                list_sum(list_transform(range(1, len(c.embedding) + 1),
                  i -> c.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) /
                (sqrt(list_sum(list_transform(c.embedding,
                   x -> x::DOUBLE * x::DOUBLE))) *
                 sqrt(list_sum(list_transform(q.embedding,
                   x -> x::DOUBLE * x::DOUBLE)))), 4) DESC,
              c.vec_id ASC) AS rn
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 10 AND c.vec_id >= 10
        ) WHERE rn <= 5""")),

    // ---- SIM7 IVF-PQ: int8-quantized inverted lists (emb2's
    // symmetric scheme inside sim3's cells — the probe's scan reads
    // ~1/4 the bytes) + exact rescore of the approximate top-m via a
    // broadcast point-fetch of true embeddings. Approximate by design
    // (rows-only); the guaranteed fraction of its recall is
    // hash-checked by sim7_pq_recall.
    "sim7_ivfpq_topk" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val corpus = t(s, dir, "embeddings").where(col("vec_id") =!= 0)
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        Similarity.ivfPqTopK(
          Similarity.ivfPqIndex(corpus, "embedding", "vec_id", cb),
          corpus, "embedding", "vec_id", q, cb,
          nprobe = 4, m = 30, k = 10)
      },
      None,
      doc = "rows-only: int8 quantization + cell pruning change the candidate set"),

    // ---- SIM7 self-check: an exact COPY of the query injected into
    // the corpus is GUARANTEED retrieved — its true embedding assigns
    // it to the query's own top-1 probe cell (quantization happens
    // AFTER assignment), its approximate code-space cosine (~0.9999)
    // clears every natural candidate (measured max natural cosine to
    // a query on this corpus ≈ 0.49, far beyond int8's bounded
    // ranking error), and the exact rescore returns cosine exactly
    // 1.0. SQL-predictable, hash-checked.
    "sim7_pq_recall" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val emb = t(s, dir, "embeddings")
        val corpus = emb.where(col("vec_id") =!= 0).unionByName(
          emb.where(col("vec_id") === 0)
            .withColumn("vec_id", col("vec_id") + 1000000L))
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        Similarity.ivfPqTopK(
            Similarity.ivfPqIndex(corpus, "embedding", "vec_id", cb),
            corpus, "embedding", "vec_id", q, cb,
            nprobe = 4, m = 10, k = 1)
          .where(col("vec_id") === 1000000L)
      },
      Some("""SELECT CAST(1000000 AS BIGINT) AS vec_id,
          CAST(1.0 AS DOUBLE) AS score""")),

    // ---- SIM7 BATCH probe: ten queries against the quantized index
    // in ONE codes join + ONE exact rescore pass — the form a training
    // pipeline batch-scores in (the single probe's per-call shortlist
    // collect would be a plan + a driver round-trip per query).
    // Pruned (nprobe ≪ nlist) and approximate by design (rows-only);
    // the guaranteed fraction of its recall is hash-checked by
    // sim7_pq_batch_recall.
    "sim7_pq_batch" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val corpus = emb.where(col("vec_id") >= 10)
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        Similarity.ivfPqTopKMany(
          Similarity.ivfPqIndex(corpus, "embedding", "vec_id", cb),
          corpus, "embedding", "vec_id", queries, "qid", "qemb", cb,
          nprobe = 4, m = 30, k = 5)
      },
      None,
      doc = "rows-only: int8 quantization + cell pruning change the candidate set"),

    // ---- SIM7 batch self-check: an exact COPY of each query injected
    // into the corpus is GUARANTEED retrieved by the batch probe —
    // assignment happens on TRUE embeddings (the copy lands in the
    // query's own top-1 probe cell), its approximate code-space cosine
    // (~0.9999) clears every natural candidate (measured max natural
    // cosine ≈ 0.49 on this corpus, far beyond int8's bounded ranking
    // error) so it survives the top-m shortlist, and the exact rescore
    // returns cosine exactly 1.0. The sim5_pruned_recall pattern on
    // the quantized layout; SQL-predictable, hash-checked.
    "sim7_pq_batch_recall" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val corpus = emb.where(col("vec_id") >= 10).unionByName(
          emb.where(col("vec_id") < 10)
            .withColumn("vec_id", col("vec_id") + 1000000L))
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        Similarity.ivfPqTopKMany(
            Similarity.ivfPqIndex(corpus, "embedding", "vec_id", cb),
            corpus, "embedding", "vec_id", queries, "qid", "qemb", cb,
            nprobe = 4, m = 10, k = 5)
          .where(col("vec_id") === col("qid") + 1000000L)
          .select(col("qid"), col("vec_id").as("hit_id"), col("score"))
      },
      Some("""SELECT vec_id AS qid, vec_id + 1000000 AS hit_id,
          CAST(1.0 AS DOUBLE) AS score
        FROM embeddings WHERE vec_id < 10""")),

    // ---- SIM8 TRUE product quantization (Jégou et al., PAMI 2011):
    // per-subspace codebooks, ONE byte per 4-dim subvector — 16×
    // compression at dim 64 vs int8's fixed 4× — probed by ADC lookup
    // table (numSub table adds per candidate instead of a dim-D dot
    // product) + exact rescore of the approximate top-m. Approximate
    // by design (rows-only); the guaranteed fraction of its recall is
    // hash-checked by sim8_product_recall.
    "sim8_product_topk" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val corpus = t(s, dir, "embeddings").where(col("vec_id") =!= 0)
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        val books = ProductQuant.train(corpus, "embedding", "vec_id",
          numSub = 16, k = 256, iters = 1)
        Similarity.ivfProductTopK(
          Similarity.ivfProductIndex(corpus, "embedding", "vec_id",
            cb, books),
          corpus, "embedding", "vec_id", q, cb, books,
          nprobe = 4, m = 30, k = 10)
      },
      None,
      doc = "rows-only: product quantization + cell pruning change the candidate set"),

    // ---- SIM8 self-check: an exact COPY of the query injected into
    // the corpus is GUARANTEED retrieved — assignment happens on TRUE
    // embeddings (the copy lands in the query's own top-1 probe cell),
    // its approximate ADC cosine is cos(q, v̂_q) — the reconstruction
    // cosine of the query itself, ≈0.98 under 256-centroid 4-dim
    // subspace codebooks on this corpus — which clears every natural
    // candidate's approximate score (≤ natural cosine ≈0.49 plus the
    // same bounded reconstruction error), so it survives the top-m
    // shortlist, and the exact rescore returns cosine exactly 1.0.
    // The sim7_pq_recall pattern on the product layout;
    // SQL-predictable, hash-checked.
    "sim8_product_recall" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val emb = t(s, dir, "embeddings")
        val corpus = emb.where(col("vec_id") =!= 0).unionByName(
          emb.where(col("vec_id") === 0)
            .withColumn("vec_id", col("vec_id") + 1000000L))
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        val books = ProductQuant.train(corpus, "embedding", "vec_id",
          numSub = 16, k = 256, iters = 1)
        Similarity.ivfProductTopK(
            Similarity.ivfProductIndex(corpus, "embedding", "vec_id",
              cb, books),
            corpus, "embedding", "vec_id", q, cb, books,
            nprobe = 4, m = 10, k = 1)
          .where(col("vec_id") === 1000000L)
      },
      Some("""SELECT CAST(1000000 AS BIGINT) AS vec_id,
          CAST(1.0 AS DOUBLE) AS score""")),

    // ---- SIM8 BATCH probe: ten queries against the product-quantized
    // index in ONE codes join (per-row asymmetric centroid cosine —
    // the codegen'd PqApproxCosine, reconstruction never materialized)
    // + ONE exact rescore pass. Rows-only; recall guarantee
    // hash-checked by sim8_product_batch_recall.
    "sim8_product_batch" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val corpus = emb.where(col("vec_id") >= 10)
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        val books = ProductQuant.train(corpus, "embedding", "vec_id",
          numSub = 16, k = 256, iters = 1)
        Similarity.ivfProductTopKMany(
          Similarity.ivfProductIndex(corpus, "embedding", "vec_id",
            cb, books),
          corpus, "embedding", "vec_id", queries, "qid", "qemb", cb,
          books, nprobe = 4, m = 30, k = 5)
      },
      None,
      doc = "rows-only: product quantization + cell pruning change the candidate set"),

    // ---- SIM8 batch self-check: an exact COPY of each query injected
    // into the corpus is GUARANTEED retrieved by the batch probe —
    // the sim7_pq_batch_recall argument under the product scorer (the
    // copy's approximate score is its own reconstruction cosine,
    // clearing every natural candidate). SQL-predictable, hash-checked.
    "sim8_product_batch_recall" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val corpus = emb.where(col("vec_id") >= 10).unionByName(
          emb.where(col("vec_id") < 10)
            .withColumn("vec_id", col("vec_id") + 1000000L))
        val cb = Similarity.buildCodebook(corpus, "embedding", "vec_id",
          nlist = 16, refineIters = 2)
        val books = ProductQuant.train(corpus, "embedding", "vec_id",
          numSub = 16, k = 256, iters = 1)
        Similarity.ivfProductTopKMany(
            Similarity.ivfProductIndex(corpus, "embedding", "vec_id",
              cb, books),
            corpus, "embedding", "vec_id", queries, "qid", "qemb", cb,
            books, nprobe = 4, m = 10, k = 5)
          .where(col("vec_id") === col("qid") + 1000000L)
          .select(col("qid"), col("vec_id").as("hit_id"), col("score"))
      },
      Some("""SELECT vec_id AS qid, vec_id + 1000000 AS hit_id,
          CAST(1.0 AS DOUBLE) AS score
        FROM embeddings WHERE vec_id < 10""")),

    // ---- EMB1 per-label centroids (the k-means E-step / class-
    // prototype shape): posexplode each vector once, ONE hash shuffle
    // on (label, dim), elementwise mean. Never collects vectors — the
    // reduction is distributed over dims, so a 10^9-vector corpus
    // aggregates into label_count × dim cells regardless of row count.
    "emb1_label_centroids" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "embeddings")
          .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
          .groupBy($"label", $"dim")
          .agg(round(avg($"v".cast("double")), 6).as("centroid"))
      },
      Some("""SELECT label, CAST(i - 1 AS INT) AS dim,
          round(avg(embedding[i]::DOUBLE), 6) AS centroid
        FROM embeddings, range(1, 65) t(i)
        GROUP BY label, i""")),

    // ---- EMB2 int8 embedding quantization (the 4× memory/IO shrink an
    // ANN index at 100 TB runs on): symmetric per-vector scale
    // max|v|/127, q_i = round(v_i/scale) ∈ [-127,127] by construction.
    // The hash-compared outputs are chosen to be float-order-proof:
    // the quantized-code SUM is exact integer arithmetic, and the
    // reconstruction-error bound (max_i |q_i·scale − v_i| ≤ scale/2,
    // the defining property of round-to-nearest) is a boolean — both
    // engines do identical elementwise IEEE ops on identical doubles,
    // and neither output rounds a double near a tie (the q10 lesson).
    // Zero shuffle: a pure per-row projection at scan speed.
    "emb2_quantize" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val scale = array_max(transform($"embedding",
          x => abs(x.cast("double")))) / lit(127.0)
        val qs = transform($"embedding",
          x => round(x.cast("double") / scale).cast("long"))
        t(s, dir, "embeddings")
          .where(array_max(transform($"embedding",
            x => abs(x.cast("double")))) > 0)
          .select($"vec_id",
            size($"embedding").as("n_dims"),
            aggregate(qs, lit(0L), (acc, v) => acc + v).as("q_checksum"),
            (array_max(zip_with(qs, $"embedding",
              (q, v) => abs(q.cast("double") * scale - v.cast("double"))))
              <= scale * lit(0.5000001)).as("within_half_quantum"))
      },
      Some("""WITH base AS (SELECT vec_id,
          list_transform(embedding, x -> x::DOUBLE) AS v,
          list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
            AS scale
        FROM embeddings),
        q AS (SELECT vec_id, scale, v,
          list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) AS qs
        FROM base WHERE scale > 0)
        SELECT vec_id,
          CAST(len(qs) AS INT) AS n_dims,
          CAST(list_sum(qs) AS BIGINT) AS q_checksum,
          (list_max(list_transform(range(1, len(qs) + 1),
            i -> abs(qs[i]::DOUBLE * scale - v[i]))) <= scale * 0.5000001)
            AS within_half_quantum
        FROM q"""))
  )

  /** Exact cosine top-10 in DuckDB (double-precision arithmetic spelled
    * out — the builtin list_cosine_similarity accumulates in float32). */
  private[queries] val bruteForceSql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, round(
        list_sum(list_transform(range(1, len(embedding) + 1),
          i -> embedding[i]::DOUBLE * qv[i]::DOUBLE)) /
        (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) *
         sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))), 4)
        AS score
      FROM embeddings, q WHERE vec_id <> 0
      ORDER BY score DESC, vec_id ASC LIMIT 10"""
}
