package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.operators.{Components, Dedup, Packing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed end-to-end corpus pipeline ([EXT] capstone) — the user
  * story every individually-green curation operator exists for, run as
  * ONE declared artifact:
  *
  *   eval carve-out → quality/repetition gates → normalize → exact
  *   dedup → MinHash-LSH near-dedup (exact-Jaccard verified) →
  *   connected-components survivor pick → benchmark decontamination →
  *   sequence packing → leakage-safe split → balanced shards
  *
  * Integration is where operator-boundary bugs hide (carried columns,
  * NULL keys, cross-stage determinism), so the whole chain is
  * oracle-checked end to end: DuckDB mirrors every stage closed-form —
  * the near-dup stage by brute-force all-pairs Jaccard (O(n²) is fine
  * for an oracle; the Spark side stays LSH-bucketed and never compares
  * all pairs) and the transitive clusters by a recursive CTE. The LSH
  * threshold sits at 0.95, where `dd6_jaccard_exact` proved recall on
  * this corpus is exactly 100% (b=4/r=4: P(miss at J=0.95) ≈ 7e-4, and
  * the corpus has no pair in the risky (0.909, 0.956) band), so the
  * bucketed path and the brute-force oracle agree pair-for-pair.
  *
  * Scale shape (the 100 TB story): the gates are zero-shuffle
  * projections pushed to the scan; exact dedup is one hash shuffle on
  * the normalized text; LSH is shingle→minhash→band→bucket-join (cost
  * tracks duplicate groups, never n²); components run
  * large-star/small-star in O(log n) rounds; decontamination is a
  * BROADCAST semi-join of the (small) eval n-gram set; packing is a
  * distributed prefix sum (never a single-partition global window);
  * the split/shard decisions are per-row arithmetic. No driver
  * collect anywhere in the data path — `PipelineCapstoneSpec` pins
  * the shuffle count and the stage invariants.
  */
object CapstoneQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Stage tunables — shared by the query and its spec. */
  private[queries] val RepMax = 0.3
  private[queries] val StopMin = 0.01
  private[queries] val PackBudget = 2048L
  private[queries] val NumShards = 8

  /** Stages 1+2 on any documents-shaped frame (doc_id, text, n_chars
    * …): quality gates (tx2/tx6 shapes) + eval carve-out, then
    * normalize. Projections and one filter — zero shuffles, so the
    * SAME gate runs unchanged over the streaming change feed
    * (st16's incremental variant). Every term mirrors closed-form. */
  private[graft] def gate(docs: DataFrame): DataFrame = {
    // tokens are materialized ONCE as an attribute column: the gate
    // references them from FIVE expressions, and shinglesFromTokens'
    // lambda evaluates its argument per element — the expression-tree
    // form re-tokenized per shingle (measured 11 s for 5k docs at
    // sf0.1; this form is sub-second)
    val toked = docs.withColumn("__toks",
      TextFunctions.tokens(lower(col("text"))))
    val toks = col("__toks")
    val t3 = greatest(size(toks) - 2, lit(0))
    val d3 = size(TextFunctions.shinglesFromTokens(toks, 3))
    val rep = lit(1.0) - d3.cast("double") /
      greatest(t3, lit(1)).cast("double")
    toked
      .where(col("doc_id") % 97 =!= 0 && // eval set is held out up front
        col("n_chars").between(60, 520) &&
        size(toks) >= 5 && // shingle stages need real n-gram support
        rep <= RepMax &&
        TextFunctions.stopwordRatioFromTokens(toks) > StopMin)
      // normalize (case + whitespace) for the exact-dedup key;
      // ws_tokens = whitespace token count (case never changes \s+
      // splits, so size over the lowered tokens equals tx3's count)
      .select(col("doc_id"), col("text"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"),
        size(toks).cast("long").as("ws_tokens"))
  }

  /** Stages 0–4: gates → normalize → exact dedup → near-dedup
    * survivors. Shared by pipe1 (whole pipeline) and the spec's
    * stage-invariant probes. */
  private[queries] def survivorsOf(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val gated = gate(t(s, dir, "documents"))
    // ---- stage 3: exact dedup on the normalized text (dd2 shape).
    // The deduped frame feeds FOUR downstream consumers (signatures,
    // both Jaccard-verify sides, the components join) — materialize it
    // once (executor-local, survivor-sized) instead of re-running the
    // gate + window per consumer. At 100 TB the equivalent is a staged
    // intermediate table between pipeline phases.
    // the MinHash signature is computed INSIDE the same materialized
    // pass (it's a narrow projection, and storing 16 longs per row is
    // cheaper than re-tokenizing every survivor for the banding
    // stage); consumers that don't band drop the column below
    val exactSig = Dedup.withMinhashSignature(
        Dedup.exactDedup(gated, $"norm", $"doc_id"),
        $"text", shingleSize = 2, numHashes = 16)
      .localCheckpoint(true)
    val exact = exactSig.drop("minhash_sig")
    // ---- stage 4: near-dedup = LSH candidates → exact-Jaccard verify
    // → transitive clusters → keep the lowest id per cluster (dd3/dd6/
    // dd8 composed). The verify step makes the outcome exact, so the
    // oracle's brute-force pairs match the bucketed path one-for-one.
    //
    // Cost shape (the ≤4 s trim, r11/r12 ask): the banded frame is
    // checkpointed so the signature pass (tokenize + shingle + minhash
    // over every survivor) runs ONCE — the candidate self-join's two
    // branches and the bucket-size window would otherwise each re-run
    // it; candidates are checkpointed (they are tiny — duplicate
    // groups, never n²) so they can be probed for emptiness and fed to
    // the verify join without recomputation; and the exact-Jaccard
    // verify computes shingle sets only for docs that APPEAR in a
    // candidate pair (semi-join first) instead of shingling the whole
    // corpus into both sides of the pair join. At 100 TB the same
    // shape holds: signatures once, verification proportional to the
    // candidate set.
    val banded = Dedup.withBands(exactSig, bands = 4, rowsPerBand = 4)
      .select($"band_id", $"band_hash", $"doc_id")
      // lazy: the candidate checkpoint's job is the first (and only)
      // full-scan consumer — it materializes these blocks in the same
      // action instead of paying a separate eager job
      .localCheckpoint(false)
    val cand = Dedup.lshCandidatePairs(banded, "doc_id")
      .localCheckpoint(true)
    if (cand.isEmpty)
      // no colliding bucket anywhere: every exact survivor is its own
      // component — skip the verify join AND the components loop
      exact.withColumn("component", $"doc_id")
    else {
      val members = exact.join(
        cand.select($"id_a".as("doc_id"))
          .union(cand.select($"id_b".as("doc_id"))).distinct(),
        Seq("doc_id"), "left_semi")
      val edges = Dedup.jaccardVerify(members, $"text", "doc_id", cand,
          shingleSize = 2, threshold = 0.95)
        .select($"id_a", $"id_b")
      // labels cover only edge-set members (tiny); checkpoint them so
      // the two downstream consumers of the survivor frame (the
      // decontamination explode and its anti-join) re-run a broadcast
      // label join, not the whole verify + components pipeline
      val labels = Components.connectedComponents(edges, "id_a", "id_b")
        .localCheckpoint(false) // lazy: first consumer joins ALL partitions
      Components.assignLabels(exact, "doc_id", labels)
        .where($"doc_id" === $"component")
    }
  }

  /** Stage 5: drop survivors sharing any 5-gram with the eval set
    * (dc1 shape — broadcast semi-join against the small eval grams). */
  private[queries] def decontaminatedOf(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val survivors = survivorsOf(s, dir)
    val evalGrams = t(s, dir, "documents")
      .where($"doc_id" % 97 === 0 &&
        size(TextFunctions.tokens(lower($"text"))) >= 5)
      .select(explode(TextFunctions.shingles($"text", 5)).as("g"))
      .distinct()
    val contaminated = survivors
      .select($"doc_id", explode(TextFunctions.shingles($"text", 5)).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select($"doc_id").distinct()
    survivors.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Stages 6–8 on the clean corpus: pack → split → shard → ledger. */
  private[queries] def ledgerOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clean = decontaminatedOf(s, dir)
    // ---- stage 6: sequence packing (pk1 — distributed prefix sum)
    val packed = Packing.assignPacks(
      clean.select($"doc_id", $"ws_tokens"), "ws_tokens", "doc_id",
      budget = PackBudget, numRanges = 8)
    // ---- stage 7: leakage-safe split. Near-dedup already collapsed
    // every duplicate cluster to ONE survivor, so a per-doc hash split
    // cannot put two near-copies on opposite sides — the sp7 property
    // by construction. ---- stage 8: balanced shards by pack.
    packed.select($"doc_id", $"ws_tokens", $"pack_id",
        when(substring(md5($"doc_id".cast("string")), 1, 1) <= "b",
          "train").otherwise("test").as("side"),
        ($"pack_id" % NumShards).as("shard"))
      .groupBy($"side", $"shard")
      .agg(count(lit(1)).as("docs"),
        sum($"ws_tokens").as("tokens"),
        countDistinct($"pack_id").as("packs"),
        sum($"doc_id").as("id_checksum"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
  }

  def defs: Seq[(String, QueryDef)] = Seq(
    "pipe1_corpus_pipeline" -> QueryDef(
      (s, dir) => ledgerOf(s, dir),
      Some("""WITH RECURSIVE
        base AS (
          SELECT doc_id, text, n_chars,
            trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
            CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
              AS ws_tokens,
            string_split_regex(lower(text), '\s+') AS toks
          FROM documents),
        gated AS (
          SELECT doc_id, text, norm, ws_tokens, toks FROM base
          WHERE doc_id % 97 <> 0
            AND n_chars BETWEEN 60 AND 520
            AND len(toks) >= 5
            AND 1.0 - len(list_distinct(list_transform(
                  range(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                )))::DOUBLE / greatest(len(toks) - 2, 1) <= 0.3
            AND round(len(list_filter(toks,
                  tk -> tk IN ('the','a','and','of','to','in','is')
                ))::DOUBLE / len(toks), 6) > 0.01),
        exact AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY norm ORDER BY doc_id)
              AS rn FROM gated) WHERE rn = 1),
        sh2 AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1])) AS s
          FROM exact),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s))::DOUBLE /
            len(list_distinct(list_concat(a.s, b.s))) >= 0.95),
        sym AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
        root AS (SELECT a AS id, min(b) AS mn FROM reach GROUP BY a),
        survivors AS (
          SELECT e.* FROM exact e LEFT JOIN root r ON e.doc_id = r.id
          WHERE r.id IS NULL OR e.doc_id <= r.mn),
        eval_grams AS (
          SELECT DISTINCT unnest(list_distinct(list_transform(
            range(1, len(string_split_regex(lower(text), '\s+')) - 3),
            i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+2] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+3] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+4]))) AS g
          FROM documents WHERE doc_id % 97 = 0
            AND len(string_split_regex(lower(text), '\s+')) >= 5),
        cont AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest(list_distinct(list_transform(
              range(1, len(toks) - 3),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] ||
                   ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
            FROM survivors)
          WHERE g IN (SELECT g FROM eval_grams)),
        clean AS (
          SELECT * FROM survivors
          WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
        off AS (
          SELECT doc_id, ws_tokens,
            CAST(COALESCE(sum(ws_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
          FROM clean),
        packed AS (
          SELECT doc_id, ws_tokens,
            CAST(tok_offset // 2048 AS BIGINT) AS pack_id
          FROM off),
        final AS (
          SELECT doc_id, ws_tokens, pack_id,
            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
              THEN 'train' ELSE 'test' END AS side,
            CAST(pack_id % 8 AS BIGINT) AS shard
          FROM packed)
        SELECT side, shard, count(*) AS docs,
          CAST(sum(ws_tokens) AS BIGINT) AS tokens,
          CAST(count(DISTINCT pack_id) AS BIGINT) AS packs,
          CAST(sum(doc_id) AS BIGINT) AS id_checksum,
          min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM final GROUP BY side, shard"""))
  )
}
