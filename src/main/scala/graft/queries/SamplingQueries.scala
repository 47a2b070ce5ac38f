package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling / splitting / sketching queries ([EXT]) — the corpus-prep
  * operators a training-data pipeline runs after dedup and filtering:
  * seeded Bernoulli sampling, stratified sampling, train/test splits,
  * shard balancing, and HLL distinct sketches. The random outputs have
  * no DuckDB mirror, so each query emits its own SEMANTIC INVARIANTS
  * (subset-ness, statistical bounds, cover/disjoint, balance) as
  * columns whose expected values ARE SQL-expressible — the same
  * self-check pattern as the dedup/ANN companions.
  */
object SamplingQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- SP1 seeded Bernoulli sample: a subset, sized within ±5σ of
    // the binomial expectation (n·p ± 5·sqrt(n·p·(1−p))) — a bound the
    // oracle can state from the source table alone.
    "sp1_sample" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val sampled = docs.sample(withReplacement = false,
          fraction = 0.2, seed = 42)
        val stats = sampled.agg(
          count(lit(1)).as("n_sampled"),
          count(when(not($"doc_id".isNotNull), 1)).as("null_ids"))
        docs.agg(count(lit(1)).as("n_total")).crossJoin(stats)
          .select($"n_total",
            ($"n_sampled" >= $"n_total" * 0.2 -
              sqrt($"n_total" * 0.2 * 0.8) * 5 &&
             $"n_sampled" <= $"n_total" * 0.2 +
              sqrt($"n_total" * 0.2 * 0.8) * 5).as("size_in_bounds"),
            ($"null_ids" === 0).as("subset_wellformed"))
      },
      Some("""SELECT count(*) AS n_total,
        CAST(TRUE AS BOOLEAN) AS size_in_bounds,
        CAST(TRUE AS BOOLEAN) AS subset_wellformed
        FROM documents""")),

    // ---- SP2 stratified sample (sampleBy on the lang column): per
    // stratum, the sampled share stays within ±5σ of its fraction.
    "sp2_stratified" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val langs = docs.select($"lang").distinct()
          .collect().map(_.getString(0)) // bounded: language inventory
        val fractions = langs.map(_ -> 0.5).toMap
        val sampled = docs.stat.sampleBy("lang", fractions, seed = 7L)
          .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
        docs.groupBy($"lang").agg(count(lit(1)).as("n_stratum"))
          .join(sampled, Seq("lang"), "left")
          .select($"lang",
            (coalesce($"n_sampled", lit(0L)) >=
              $"n_stratum" * 0.5 - sqrt($"n_stratum" * 0.25) * 5 &&
             coalesce($"n_sampled", lit(0L)) <=
              $"n_stratum" * 0.5 + sqrt($"n_stratum" * 0.25) * 5)
              .as("share_in_bounds"))
      },
      Some("""SELECT lang, CAST(TRUE AS BOOLEAN) AS share_in_bounds
        FROM documents GROUP BY lang""")),

    // ---- SP3 train/test split: randomSplit partitions the corpus —
    // counts cover the total and the halves are disjoint (checked by
    // an inner join on the key, which must be empty).
    "sp3_train_test_split" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val Array(train, test) = docs.randomSplit(Array(0.8, 0.2), seed = 11L)
        val overlap = train.select($"doc_id")
          .join(test.select($"doc_id"), "doc_id")
        docs.agg(count(lit(1)).as("n_total")).crossJoin(
            train.agg(count(lit(1)).as("n_train"))).crossJoin(
            test.agg(count(lit(1)).as("n_test"))).crossJoin(
            overlap.agg(count(lit(1)).as("n_overlap")))
          .select($"n_total",
            ($"n_train" + $"n_test" === $"n_total").as("covers"),
            ($"n_overlap" === 0).as("disjoint"))
      },
      Some("""SELECT count(*) AS n_total,
        CAST(TRUE AS BOOLEAN) AS covers, CAST(TRUE AS BOOLEAN) AS disjoint
        FROM documents""")),

    // ---- SP4 shard balance: repartition(8) for training-shard writes —
    // every shard within 3x of the mean (round-robin repartition is
    // near-uniform by construction; the check guards regressions to a
    // skewed partitioner).
    "sp4_shard_balance" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val perShard = docs.repartition(8)
          .select(spark_partition_id().as("shard"))
          .groupBy($"shard").agg(count(lit(1)).as("n"))
        perShard.agg(
            count(lit(1)).as("n_shards"),
            (max($"n") <= (sum($"n") / count(lit(1))) * 3).as("balanced"))
      },
      Some("""SELECT CAST(8 AS BIGINT) AS n_shards,
        CAST(TRUE AS BOOLEAN) AS balanced
        FROM documents LIMIT 1""")),

    // ---- A16 HLL distinct sketch: approx_count_distinct within 5% of
    // exact (HLL++ at default rsd=0.05 — the 100 TB cardinality probe
    // that replaces exact count-distinct's full shuffle).
    "a16_approx_distinct" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").agg(
            countDistinct($"l_partkey").as("exact_distinct"),
            approx_count_distinct($"l_partkey").as("approx"))
          .select($"exact_distinct",
            (abs($"approx" - $"exact_distinct") <=
              $"exact_distinct" * 0.05).as("within_5pct"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS exact_distinct,
        CAST(TRUE AS BOOLEAN) AS within_5pct FROM lineitem""")),

    // ---- SP5 balanced domain mixture: downsample every lang to the
    // smallest lang's size (uniform mixing weights), deterministically —
    // keep the lowest-doc_id rows per lang. One window shuffle on lang
    // plus a broadcast scalar; at 100 TB the same shape holds (the
    // min-count is a control-plane scalar, the per-group rank rides a
    // single hash partitioning). Deterministic rank-based selection
    // replaces rand()-based sampleBy so the result is oracle-exact.
    "sp5_balanced_mix" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val minN = docs.groupBy($"lang").agg(count(lit(1)).as("__n"))
          .agg(min($"__n").as("__min_n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"doc_id".asc)
        docs.withColumn("__rn", row_number().over(w))
          .crossJoin(broadcast(minN))
          .where($"__rn" <= $"__min_n")
          .groupBy($"lang")
          .agg(count(lit(1)).as("kept"), max($"doc_id").as("max_kept_id"))
      },
      Some("""WITH ranked AS (SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
          FROM documents),
        m AS (SELECT min(n) AS min_n FROM
          (SELECT count(*) AS n FROM documents GROUP BY lang))
        SELECT lang, count(*) AS kept, max(doc_id) AS max_kept_id
        FROM ranked, m WHERE rn <= min_n GROUP BY lang""")),

    // ---- SP7 leakage-safe train/test split: a random per-DOC split
    // leaks when near-identical docs land on both sides (the classic
    // eval-contamination bug) — so the split unit is the DUPLICATE
    // GROUP, not the row. Deterministic duplicates are injected (every
    // 10th doc copied under doc_id+100000, the dd3/tx7 device), docs
    // are grouped by content fingerprint (min doc_id per md5(text)),
    // and the whole group goes to one side by a hash of its canonical
    // id: first hex digit of md5(group_key) ≤ 'b' → train (12/16 =
    // 75%). By construction no group spans sides — the oracle mirrors
    // every step, so the hash compare proves both engines agree on
    // every doc's side. Scale shape: ONE shuffle on the content
    // fingerprint (at 100 TB shuffle md5(text), never raw text); the
    // side decision is per-row arithmetic on an already-grouped frame —
    // no global coordination, no collect.
    "sp7_group_split" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select($"doc_id", $"text")
        val dups = docs.where($"doc_id" % 10 === 0)
          .select(($"doc_id" + 100000L).as("doc_id"), $"text")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5($"text"))
        docs.unionByName(dups)
          .withColumn("group_key", min($"doc_id").over(w))
          .select($"doc_id", $"group_key",
            when(substring(md5($"group_key".cast("string")), 1, 1) <= "b",
              "train").otherwise("test").as("side"))
      },
      Some("""WITH all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
        g AS (SELECT doc_id,
          min(doc_id) OVER (PARTITION BY md5(text)) AS group_key
          FROM all_docs)
        SELECT doc_id, group_key,
          CASE WHEN substr(md5(CAST(group_key AS VARCHAR)), 1, 1) <= 'b'
            THEN 'train' ELSE 'test' END AS side
        FROM g""")),

    // ---- SP8 deterministic corpus shuffle (training-order assignment):
    // position = rank of md5(seed ‖ doc_id) — a seeded, reproducible
    // global shuffle with no rand() (reruns at any parallelism give the
    // same order, and changing the seed re-shuffles). At 100 TB the
    // global row_number becomes a two-level form (range-partition by
    // the hash, per-range local rank + broadcast offsets — the Packing
    // operator's distributed prefix-sum shape); at bench scale the
    // single sort expresses the semantics.
    "sp8_deterministic_shuffle" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(md5(concat(lit("seed42_"), $"doc_id".cast("string"))))
        t(s, dir, "documents")
          .select($"doc_id",
            row_number().over(w).as("pos"))
          .where($"pos" <= 100)
      },
      Some("""SELECT doc_id, CAST(pos AS INT) AS pos FROM (
          SELECT doc_id, row_number() OVER (
            ORDER BY md5('seed42_' || CAST(doc_id AS VARCHAR))) AS pos
          FROM documents)
        WHERE pos <= 100"""))
  )
}
