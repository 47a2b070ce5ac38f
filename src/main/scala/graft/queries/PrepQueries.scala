package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-example preparation ([EXT]): sequence packing (concat-then-
  * chunk under a fixed token budget, built on a distributed prefix sum —
  * [[graft.operators.Packing]]) and benchmark decontamination (drop
  * corpus documents sharing any 5-gram with a held-out eval set). Both
  * fully oracle-checked: the prefix sum and pack assignment are integer-
  * exact, and the decontamination semi-join mirrors n-gram construction
  * in DuckDB.
  */
object PrepQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** documents with the tx3 whitespace token count, the packing size. */
  private def docTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", TextFunctions.tokenCount($"text").as("ws_tokens"))
  }

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- PK1 per-document pack assignment at budget 2048: exclusive
    // global token offset (distributed prefix sum — NOT a single-
    // partition global window), starting pack, packs crossed.
    "pk1_sequence_packing" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Packing
          .assignPacks(docTokens(s, dir), "ws_tokens", "doc_id",
            budget = 2048L, numRanges = 8)
          .select($"doc_id", $"tok_offset", $"pack_id", $"packs_spanned")
      },
      // every windowed/derived integer is CAST AS BIGINT: DuckDB's
      // integer window-sum widens to HUGEINT (int128), whose client
      // rendering is version-dependent — never leave one in a compared
      // output column (the round-3 pk1/pk2 hash failures)
      Some("""WITH tok AS (SELECT doc_id,
          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
          FROM documents),
        off AS (SELECT doc_id, n,
          CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_offset FROM tok)
        SELECT doc_id, tok_offset,
          CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
          CAST((tok_offset + n - 1) // 2048 - tok_offset // 2048 + 1
            AS INT) AS packs_spanned
        FROM off""")),

    // ---- PK2 pack manifest: per-pack document/token ledger (the
    // shard-map a training loader reads)
    "pk2_pack_manifest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Packing
          .assignPacks(docTokens(s, dir), "ws_tokens", "doc_id",
            budget = 2048L, numRanges = 8)
          .groupBy($"pack_id")
          .agg(count(lit(1)).as("docs_started"),
            sum($"ws_tokens".cast("long")).as("tokens_started"),
            min($"doc_id").as("first_doc"))
      },
      Some("""WITH tok AS (SELECT doc_id,
          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
          FROM documents),
        off AS (SELECT doc_id, n,
          CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_offset FROM tok)
        SELECT CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
          count(*) AS docs_started,
          CAST(sum(n) AS BIGINT) AS tokens_started,
          min(doc_id) AS first_doc
        FROM off GROUP BY 1""")),

    // ---- PK3 SUBWORD sequence packing: pk1's distributed-prefix-sum
    // pack assignment driven by the byte-level BPE token count
    // (tx13's codegen'd expression) instead of whitespace words — the
    // production-true budget a training pipeline actually packs by.
    // The oracle reuses tx13's closed form (disjoint single-level
    // merges → count = non-ws bytes − pair occurrences) inside pk1's
    // windowed-offset SQL; every derived integer CAST AS BIGINT (the
    // HUGEINT lesson).
    "pk3_bpe_packing" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"doc_id",
            size(graft.functions.BpeTokens($"text",
              TextQueries.bpeOracleMerges)).cast("long").as("bpe_tokens"))
        graft.operators.Packing
          .assignPacks(toks, "bpe_tokens", "doc_id",
            budget = 2048L, numRanges = 8)
          .select($"doc_id", $"tok_offset", $"pack_id", $"packs_spanned")
      },
      Some("""WITH tok AS (SELECT doc_id,
          CAST(strlen(regexp_replace(text, '[ \t\n\v\f\r]+', '', 'g'))
            - (strlen(text) - strlen(replace(text, 'th', ''))) // 2
            - (strlen(text) - strlen(replace(text, 'an', ''))) // 2
            - (strlen(text) - strlen(replace(text, 'qu', ''))) // 2
            AS BIGINT) AS n
          FROM documents),
        off AS (SELECT doc_id, n,
          CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_offset FROM tok)
        SELECT doc_id, tok_offset,
          CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
          CAST(CASE WHEN n = 0 THEN 1 ELSE
            (tok_offset + n - 1) // 2048 - tok_offset // 2048 + 1 END
            AS INT) AS packs_spanned
        FROM off""")),

    // ---- DC1 benchmark decontamination: eval set = doc_id % 97 == 0;
    // a corpus doc is contaminated iff it shares ANY 5-gram with any
    // eval doc. Shape: eval 5-grams exploded + distinct (small by
    // construction — eval sets are thousands of docs, not billions) →
    // BROADCAST semi-join against the corpus's exploded 5-grams. The
    // corpus side stays one narrow explode + one aggregate; no
    // corpus×eval join ever materializes.
    "dc1_decontaminate" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val isEval = $"doc_id" % 97 === 0
        val evalGrams = docs.where(isEval)
          .select(explode(TextFunctions.shingles($"text", 5)).as("g"))
          .distinct()
        val corpusGrams = docs.where(!isEval)
          .select($"doc_id", explode(TextFunctions.shingles($"text", 5)).as("g"))
        val contaminated = corpusGrams
          .join(broadcast(evalGrams), Seq("g"), "left_semi")
          .select($"doc_id").distinct()
          .withColumn("__cont", lit(true))
        docs.where(!isEval)
          .join(contaminated, Seq("doc_id"), "left")
          .select($"doc_id", coalesce($"__cont", lit(false)).as("contaminated"))
      },
      Some("""WITH sh AS (SELECT doc_id, list_distinct(list_transform(
            range(1, len(string_split_regex(lower(text), '\s+')) - 3),
            i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+2] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+3] || ' ' ||
                 string_split_regex(lower(text), '\s+')[i+4])) AS s
          FROM documents),
        eval_grams AS (SELECT DISTINCT unnest(s) AS g FROM sh
          WHERE doc_id % 97 = 0),
        cont AS (SELECT DISTINCT doc_id FROM
          (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
          WHERE g IN (SELECT g FROM eval_grams))
        SELECT doc_id, doc_id IN (SELECT doc_id FROM cont) AS contaminated
        FROM documents WHERE doc_id % 97 <> 0"""))
  )
}
