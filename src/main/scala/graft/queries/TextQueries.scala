package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over `documents` ([EXT]: language-ID heuristic,
  * quality scoring, token counting, fingerprinting — the
  * pretraining-filter quartet). All column-function compositions
  * (graft.functions.TextFunctions), no UDFs; each oracle mirrors the
  * exact arithmetic in DuckDB.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- TX1 language-ID by distinctive-stopword heuristic
    "tx1_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", $"lang", langGuess($"text").as("lang_guess"))
      },
      Some("""SELECT doc_id, lang,
        CASE
          WHEN strpos(' ' || lower(text) || ' ', ' the ') > 0
            OR strpos(' ' || lower(text) || ' ', ' and ') > 0 THEN 'en'
          WHEN strpos(' ' || lower(text) || ' ', ' der ') > 0
            OR strpos(' ' || lower(text) || ' ', ' und ') > 0 THEN 'de'
          WHEN strpos(' ' || lower(text) || ' ', ' le ') > 0
            OR strpos(' ' || lower(text) || ' ', ' et ') > 0 THEN 'fr'
          WHEN strpos(' ' || lower(text) || ' ', ' el ') > 0
            OR strpos(' ' || lower(text) || ' ', ' y ') > 0 THEN 'es'
          ELSE 'unknown'
        END AS lang_guess
        FROM documents""")),

    // ---- TX2 quality scoring: punct / stopword ratios + composite
    "tx2_quality" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            punctRatio($"text").as("punct_ratio"),
            stopwordRatio($"text").as("stopword_ratio"),
            qualityScore($"text").as("quality"))
      },
      Some("""SELECT doc_id,
        round(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
          / length(text), 6) AS punct_ratio,
        round(len(list_filter(string_split_regex(lower(text), '\s+'),
            tk -> tk IN ('the','a','and','of','to','in','is')))::DOUBLE
          / len(string_split_regex(lower(text), '\s+')), 6) AS stopword_ratio,
        round((
          (CASE WHEN length(text) >= 50 AND length(text) <= 20000 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN round(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
                / length(text), 6) < 0.1 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN round(len(list_filter(string_split_regex(lower(text), '\s+'),
                tk -> tk IN ('the','a','and','of','to','in','is')))::DOUBLE
                / len(string_split_regex(lower(text), '\s+')), 6) > 0.01
             THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality
        FROM documents""")),

    // ---- TX3 token counting: whitespace + BPE-ish regex pre-tokenizer
    "tx3_tokens" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            tokenCount($"text").as("ws_tokens"),
            bpeishTokenCount($"text").cast("int").as("bpeish_tokens"))
      },
      Some("""SELECT doc_id,
        CAST(len(string_split_regex(text, '\s+')) AS INT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)
          AS bpeish_tokens
        FROM documents""")),

    // ---- TX4 document fingerprint: rolling hash over the token stream
    // (list_reduce seeds with the first element; Spark side mirrors that
    // fold shape exactly — see TextFunctions.fingerprintPortable)
    "tx4_fingerprint" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", fingerprintPortable($"text").as("fp"))
      },
      Some("""SELECT doc_id, list_reduce(
          list_transform(string_split_regex(text, '\s+'),
            w -> (ascii(w) * 31 + length(w)) % 1000000007),
          (acc, x) -> (acc * 131 + x) % 1000000007) AS fp
        FROM documents""")),

    // ---- TX5 the composed training-data prep pipeline — the end-to-end
    // shape this engine exists for: admission filter (length band +
    // language allowlist) → exact dedup (keep lowest doc_id per text) →
    // per-language corpus stats. Everything stays in one declarative
    // plan: the filters reach the scan, the dedup is the one hash
    // shuffle, the stats ride the same partitioning.
    "tx5_prep_pipeline" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val admitted = t(s, dir, "documents")
          .where($"n_chars".between(60, 520) &&
            $"lang".isin("en", "de", "fr", "es"))
        graft.operators.Dedup.exactDedup(admitted, $"text", $"doc_id")
          .groupBy($"lang")
          .agg(count(lit(1)).as("docs"),
            sum($"n_chars").as("total_chars"),
            round(avg($"n_chars"), 2).as("avg_chars"))
      },
      Some("""WITH admitted AS (
          SELECT * FROM documents
          WHERE n_chars BETWEEN 60 AND 520
            AND lang IN ('en', 'de', 'fr', 'es')),
        deduped AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id)
              AS rn FROM admitted) WHERE rn = 1)
        SELECT lang, count(*) AS docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars,
          round(avg(n_chars), 2) AS avg_chars
        FROM deduped GROUP BY lang""")),

    // ---- TX6 within-document repetition ratio (Gopher-style quality
    // gate): 1 - distinct/total 3-grams. High ratio = boilerplate /
    // looped text. Narrow per-row arithmetic, no shuffle at all.
    "tx6_repetition" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val toks = graft.functions.TextFunctions.tokens(lower($"text"))
        val total = greatest(size(toks) - 2, lit(0))
        val distinct3 =
          size(graft.functions.TextFunctions.shinglesFromTokens(toks, 3))
        t(s, dir, "documents")
          .select($"doc_id", total.as("total_3grams"),
            round(lit(1.0) - distinct3.cast("double") /
              greatest(total, lit(1)).cast("double"), 6).as("rep_ratio"))
      },
      Some("""SELECT doc_id,
          CAST(greatest(len(string_split_regex(lower(text), '\s+')) - 2, 0)
            AS INT) AS total_3grams,
          round(1.0 - len(list_distinct(list_transform(
              range(1, len(string_split_regex(lower(text), '\s+')) - 1),
              i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                   string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                   string_split_regex(lower(text), '\s+')[i+2])))::DOUBLE /
            greatest(len(string_split_regex(lower(text), '\s+')) - 2, 1),
            6) AS rep_ratio
        FROM documents""")),

    // ---- TX9 vocabulary build (the tokenizer-training precursor):
    // corpus-wide token frequencies, top-100 with a deterministic
    // count-then-token tiebreak. ONE shuffle on token with map-side
    // partial counts, then TakeOrderedAndProject (per-partition top-k,
    // k·p driver merge) — at 100 TB the plan never globally sorts the
    // full vocabulary.
    "tx9_vocab" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(explode(split(lower($"text"), "\\s+")).as("token"))
          .where(length($"token") > 0)
          .groupBy($"token").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"token".asc)
          .limit(100)
      },
      Some("""SELECT token, count(*) AS n FROM (
          SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
          FROM documents)
        WHERE length(token) > 0
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 100""")),

    // ---- TX10 percentile admission gate: keep docs whose stopword
    // ratio clears the corpus's exact 25th percentile — the
    // quality-threshold filter a curation pipeline applies before
    // training. The threshold is ONE broadcast scalar (exact
    // percentile, the w6 parity device) against per-row arithmetic
    // already proven engine-identical by tx2; at 100 TB the exact
    // percentile becomes approx_percentile and the same broadcast-
    // compare plan holds.
    "tx10_quality_gate" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val scored = t(s, dir, "documents")
          .select($"doc_id", stopwordRatio($"text").as("r"))
        val thr = scored.agg(expr("percentile(r, 0.25)").as("thr"))
        scored.crossJoin(broadcast(thr))
          .where($"r" >= $"thr")
          .select($"doc_id", $"r")
      },
      Some("""WITH s AS (SELECT doc_id,
          round(len(list_filter(string_split_regex(lower(text), '\s+'),
              tk -> tk IN ('the','a','and','of','to','in','is')))::DOUBLE
            / len(string_split_regex(lower(text), '\s+')), 6) AS r
          FROM documents),
        t AS (SELECT quantile_cont(r, 0.25) AS thr FROM s)
        SELECT doc_id, r FROM s, t WHERE r >= thr""")),

    // ---- TX11 unigram log-prob scoring (the perplexity-filter proxy a
    // curation pipeline runs where a real LM is too expensive): a
    // unigram model is fit on the corpus ITSELF (token relative
    // frequencies), then each doc scores mean log10 p(token) — docs of
    // improbable tokens score low. Two shuffles total: the model build
    // (token counts) and the per-doc aggregate after the freq join; the
    // model is corpus-vocabulary-sized, joined by token hash at 100 TB.
    // Mean-of-logs is order-dependent in the last ulps, so the score
    // rounds at 6 dp (the emb1 device — per-doc token counts are small).
    "tx11_unigram_logprob" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"doc_id", explode(split(lower($"text"), "\\s+"))
            .as("token"))
          .where(length($"token") > 0)
        val total = toks.agg(count(lit(1)).cast("double").as("__total"))
        val model = toks.groupBy($"token")
          .agg(count(lit(1)).cast("double").as("__n"))
        toks.join(model, "token")
          .crossJoin(broadcast(total))
          .groupBy($"doc_id")
          .agg(round(avg(log10($"__n" / $"__total")), 6).as("logprob"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+'))
            AS token FROM documents),
        toks2 AS (SELECT * FROM toks WHERE length(token) > 0),
        total AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM toks2),
        model AS (SELECT token, CAST(count(*) AS DOUBLE) AS n
          FROM toks2 GROUP BY token)
        SELECT doc_id, round(avg(log10(n / total)), 6) AS logprob
        FROM toks2 JOIN model USING (token), total
        GROUP BY doc_id""")),

    // ---- TX12 HTML main-text extraction (the curation pipeline's
    // raw-markup front door — jusText/trafilatura-family link-density
    // boilerplate dropping): each document is wrapped in a
    // deterministic page template (head with script+style, a nav and
    // a footer of pure links, the text entity-escaped inside <p>),
    // every 7th doc additionally carries the MALFORMED class (stray
    // close tag, unterminated trailing tag and comment) — and the
    // extractor must return exactly the original text with whitespace
    // collapsed: scripts/styles/comments dropped, nav+footer dropped
    // as majority-link boilerplate, entities decoded back, malformed
    // tails contained. Closed-form oracle; zero shuffle.
    "tx12_html_extract" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val escaped = regexp_replace(regexp_replace(regexp_replace(
          $"text", "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
        val page = concat(
          when($"doc_id" % 7 === 0, lit("</div>")).otherwise(lit("")),
          lit("<html><head><script>var x='<p>ghost</p>';</script>" +
            "<style>p{color:red}</style></head><body>" +
            "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
            "<p>"),
          escaped,
          lit("</p><footer><a href='/c'>Contact</a></footer></body>" +
            "</html>"),
          when($"doc_id" % 7 === 0, lit("<!-- unterminated <b"))
            .otherwise(lit("")))
        t(s, dir, "documents")
          .select($"doc_id",
            graft.functions.HtmlExtract(page).as("main_text"))
      },
      Some("""SELECT doc_id,
          trim(regexp_replace(text, '[ \t\n\v\f\r]+', ' ', 'g'))
            AS main_text
        FROM documents""")),

    // ---- TX13 subword (byte-level BPE) token counts — the count a
    // real training pipeline packs/chunks by, where ws_tokens counts
    // words. The oracle is CLOSED-FORM because the declared merges
    // table is single-level over pairwise-DISJOINT letter pairs with
    // distinct sides: occurrences of each pair never overlap, merging
    // one can neither create nor destroy another (the merged symbol
    // is not a table side), and the pairs never span whitespace — so
    // the BPE count is exactly (non-whitespace BYTES) − Σ
    // non-overlapping pair occurrences, which DuckDB computes by
    // replace(). The full greedy semantics (rank priority, merge-all,
    // multi-level chains) are hash-pinned by tx14 and the ScalaCheck
    // spec; zero shuffle — a pure per-row codegen'd projection.
    "tx13_bpe_tokens" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            size(graft.functions.BpeTokens($"text", bpeOracleMerges))
              .cast("long").as("n_bpe"))
      },
      Some("""SELECT doc_id,
          CAST(strlen(regexp_replace(text, '[ \t\n\v\f\r]+', '', 'g'))
            - (strlen(text) - strlen(replace(text, 'th', ''))) // 2
            - (strlen(text) - strlen(replace(text, 'an', ''))) // 2
            - (strlen(text) - strlen(replace(text, 'qu', ''))) // 2
            AS BIGINT) AS n_bpe
        FROM documents""")),

    // ---- TX14 BPE merge-semantics pin: the canonical adversarial
    // cases (multi-level merge chains, rank priority over a shared
    // symbol, merge-all-occurrences without overlap reuse, whitespace
    // boundaries) on literal inputs with literal expected outputs —
    // the driver-visible form of BpeTokensSpec's reference parity.
    "tx14_bpe_semantics" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        def cased(id: Long, text: String,
            merges: Seq[(String, String)]) =
          Seq((id, text)).toDF("case_id", "t")
            .select($"case_id", concat_ws("|",
              graft.functions.BpeTokens($"t", merges)).as("toks"))
        cased(1L, "low lower lowest",
            Seq(("l", "o"), ("lo", "w")))
          .unionByName(cased(2L, "abc", Seq(("a", "b"), ("b", "c"))))
          .unionByName(cased(3L, "abc", Seq(("b", "c"), ("a", "b"))))
          .unionByName(cased(4L, "aaa aaaa", Seq(("a", "a"))))
          .unionByName(cased(5L, " the\ttheory ",
            Seq(("t", "h"), ("th", "e"))))
      },
      Some("""SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), 'low|low|e|r|low|e|s|t'),
          (CAST(2 AS BIGINT), 'ab|c'),
          (CAST(3 AS BIGINT), 'a|bc'),
          (CAST(4 AS BIGINT), 'aa|a|aa|aa'),
          (CAST(5 AS BIGINT), 'the|the|o|r|y'))
        AS v(case_id, toks)"""))
  ) ++ learnQueries

  /** The tx13/pk3 oracle merges table: single-level, pairwise-disjoint
    * letter pairs with distinct sides — the construction whose BPE
    * count has the closed form the DuckDB oracle computes. */
  private[queries] val bpeOracleMerges: Seq[(String, String)] =
    Seq(("t", "h"), ("a", "n"), ("q", "u"))

  /** tx15/tx16: BPE merge LEARNING. tx15 pins the learner's exact
    * output on the classic worked corpus (hand-derivable: the
    * frequency-weighted pair census with deterministic lexicographic
    * ties learns (e,s)(es,t)(l,o)(lo,w)); tx16 runs the whole
    * train-then-tokenize loop on the real corpus (rows-only — an
    * iterative greedy learner is not SQL-expressible; tx15 is its
    * hash-green semantic companion, BpeTrainSpec its reference
    * parity). */
  private def learnQueries: Seq[(String, QueryDef)] = Seq(
    "tx15_bpe_learn" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
          Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
        val merges = graft.operators.BpeTrain.learnMerges(
          Seq(text).toDF("text"), "text", 4)
        merges.zipWithIndex
          .map { case ((l, r), i) => (i.toLong, l, r) }
          .toDF("rank", "left_sym", "right_sym")
      },
      Some("""SELECT * FROM (VALUES
          (CAST(0 AS BIGINT), 'e', 's'),
          (CAST(1 AS BIGINT), 'es', 't'),
          (CAST(2 AS BIGINT), 'l', 'o'),
          (CAST(3 AS BIGINT), 'lo', 'w'))
        AS v(rank, left_sym, right_sym)""")),

    "tx16_learned_subword_tokens" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val merges = graft.operators.BpeTrain.learnMerges(
          docs, "text", numMerges = 32)
        docs.select($"doc_id",
          size(graft.functions.BpeTokens($"text", merges))
            .cast("long").as("n_subword"))
      },
      None,
      doc = "rows-only: iterative greedy merge learning is not " +
        "SQL-expressible; tx15 hash-pins the learner, tx13 the " +
        "tokenizer's closed form"))
}
