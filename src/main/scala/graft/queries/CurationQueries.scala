package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators ([EXT]) a production pretraining pipeline
  * runs between raw ingest and tokenization: PII redaction, boilerplate
  * paragraph removal (the CCNet line-dedup shape), context-window
  * chunking, BM25 keyword ranking, and temperature-scaled language
  * mixing. All pure column compositions / windowed plans — no UDFs —
  * and every query is hash-checked against a DuckDB oracle mirroring
  * the exact arithmetic.
  *
  * The synthetic `documents` text carries no real PII or boilerplate,
  * so tx7/dd9 INJECT deterministic patterns (derived from doc_id, so
  * both engines construct identical inputs) before running the
  * operator — same device as dd7_injected_pairs: the check exercises
  * the full masking/dedup arithmetic, not a no-op pass-through.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // Shared PII patterns — Java regex (Spark) and RE2 (DuckDB) read
  // these identically: character classes, bounded repeats, \b only.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  private val IpRe = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  private val Boiler1 =
    "subscribe now for updates follow us on social media"
  private val Boiler2 =
    "all rights reserved terms of service privacy policy"

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- TX7 PII redaction: inject a deterministic email / phone /
    // IPv4 per doc, then mask all three classes with sequential
    // regexp_replace. Zero shuffle; the whole scrub is one codegen'd
    // projection — at 100 TB this runs at scan speed.
    "tx7_pii_scrub" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val aug = concat($"text",
          lit(" contact doc"), $"doc_id".cast("string"),
          lit("@mail.example.com or +1-555-"),
          lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"),
          lit(" ip 10.0."), pmod($"doc_id", lit(256)).cast("string"),
          lit(".1"))
        val scrubbed = regexp_replace(
          regexp_replace(
            regexp_replace(aug, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          IpRe, "<IP>")
        t(s, dir, "documents").select($"doc_id",
          regexp_count(aug, lit(EmailRe)).cast("int").as("n_emails"),
          regexp_count(aug, lit(PhoneRe)).cast("int").as("n_phones"),
          regexp_count(aug, lit(IpRe)).cast("int").as("n_ips"),
          length(scrubbed).as("clean_len"),
          md5(scrubbed).as("clean_md5"))
      },
      Some(s"""WITH aug AS (SELECT doc_id,
          text || ' contact doc' || CAST(doc_id AS VARCHAR)
            || '@mail.example.com or +1-555-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '$EmailRe')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(t, '$PhoneRe')) AS INT) AS n_phones,
          CAST(len(regexp_extract_all(t, '$IpRe')) AS INT) AS n_ips,
          CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
            '$EmailRe', '<EMAIL>', 'g'),
            '$PhoneRe', '<PHONE>', 'g'),
            '$IpRe', '<IP>', 'g')) AS INT) AS clean_len,
          md5(regexp_replace(regexp_replace(regexp_replace(t,
            '$EmailRe', '<EMAIL>', 'g'),
            '$PhoneRe', '<PHONE>', 'g'),
            '$IpRe', '<IP>', 'g')) AS clean_md5
        FROM aug""")),

    // ---- DD9 paragraph-level boilerplate dedup (CCNet line dedup):
    // every doc gets one of two injected boilerplate paragraphs; across
    // the corpus each paragraph text keeps only its FIRST occurrence
    // (by doc_id, then position). Skew-safe shape (r3 verdict): the
    // first occurrence comes from groupBy(para).agg(min(struct(..)))
    // — partial aggregation collapses a boilerplate paragraph repeated
    // billions of times MAP-SIDE, and the join-back is AQE-skew-
    // splittable. A window over para would pin that hot key to one
    // irreducible task (hashing the key doesn't help: same key, same
    // partition).
    "dd9_paragraph_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val bp = when(pmod($"doc_id", lit(2)) === 0, lit(Boiler1))
          .otherwise(lit(Boiler2))
        val paras = t(s, dir, "documents")
          .select($"doc_id",
            posexplode(split(concat($"text", lit(" | "), bp), " \\| "))
              .as(Seq("para_idx", "para")))
        val firsts = paras.groupBy($"para")
          .agg(min(struct($"doc_id", $"para_idx")).as("first"))
        paras.join(firsts, "para")
          .withColumn("kept", $"first.doc_id" === $"doc_id" &&
            $"first.para_idx" === $"para_idx")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_paras"),
            sum($"kept".cast("long")).as("n_kept"),
            array_join(
              transform(
                array_sort(collect_list(
                  when($"kept", struct($"para_idx", $"para")))),
                p => p.getField("para")),
              " | ").as("clean_text"))
      },
      Some(s"""WITH aug AS (SELECT doc_id,
          text || ' | ' || CASE WHEN doc_id % 2 = 0
            THEN '$Boiler1' ELSE '$Boiler2' END AS t
          FROM documents),
        paras AS (SELECT doc_id, i - 1 AS para_idx,
            string_split(t, ' | ')[i] AS para
          FROM aug, LATERAL (SELECT unnest(range(1,
            len(string_split(t, ' | ')) + 1)) AS i) u),
        marked AS (SELECT *, row_number() OVER (PARTITION BY para
            ORDER BY doc_id, para_idx) AS rn FROM paras)
        SELECT doc_id, count(*) AS n_paras,
          CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' | '
            ORDER BY para_idx), '') AS clean_text
        FROM marked GROUP BY doc_id""")),

    // ---- CH1 context-window chunking: overlapping 64-token windows at
    // stride 48 (16-token overlap), full coverage guaranteed by the
    // chunk-count formula. Pure generator — posexplode of a computed
    // sequence, zero shuffle; tokens are materialized ONCE per row
    // before the lambda (see TextFunctions.shinglesFromTokens scaladoc).
    "ch1_token_chunks" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val chunks = t(s, dir, "documents")
          .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
          .select($"doc_id", $"toks", size($"toks").as("n"))
          .select($"doc_id",
            posexplode(transform(
              sequence(lit(0),
                greatest(lit(1),
                  floor(($"n" + lit(31)) / lit(48.0)).cast("int")) - 1),
              i => struct((i * 48).as("start_tok"),
                slice($"toks", i * 48 + 1, lit(64)).as("ctoks"))))
              .as(Seq("chunk_idx", "c")))
        chunks.select($"doc_id", $"chunk_idx",
          $"c.start_tok".as("start_tok"),
          size($"c.ctoks").as("chunk_tokens"),
          element_at($"c.ctoks", 1).as("head_tok"),
          element_at($"c.ctoks", -1).as("tail_tok"))
      },
      Some("""WITH tok AS (SELECT doc_id,
          string_split_regex(text, '\s+') AS toks FROM documents),
        sized AS (SELECT doc_id, toks, len(toks) AS n FROM tok),
        chunks AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
            CAST(i * 48 AS INT) AS start_tok,
            toks[(i * 48 + 1):(i * 48 + 64)] AS ctoks
          FROM sized, LATERAL (SELECT unnest(range(0,
            CAST(greatest(1, floor((n + 31) / 48.0)) AS BIGINT))) AS i) u)
        SELECT doc_id, chunk_idx, start_tok,
          CAST(len(ctoks) AS INT) AS chunk_tokens,
          ctoks[1] AS head_tok, ctoks[len(ctoks)] AS tail_tok
        FROM chunks""")),

    // ---- CH2 SUBWORD chunking: ch1's sliding windows (64-token
    // window, 48 stride) over the byte-level BPE token stream instead
    // of whitespace words — the chunk geometry a real training
    // pipeline cuts by. The oracle is exact because, for the tx13
    // merges table (single-level, pairwise-disjoint, distinct-sided
    // pairs that can never overlap), the BPE token STREAM equals
    // leftmost-first regex alternation 'th|an|qu|.' per word —
    // non-overlapping left-to-right matches are precisely what the
    // merge-all pass produces when no two matches can contend. Both
    // sides restrict to all-ASCII documents (strlen = length): on
    // non-ASCII text the byte-level tokenizer emits per-BYTE tokens
    // where regex '.' matches a codepoint, so the equivalence — and
    // therefore the oracle — is ASCII-only by construction (today's
    // corpus is 100% ASCII; the filter makes the oracle drift-proof,
    // and the non-ASCII semantics are hash-pinned by tx14 + spec).
    "ch2_bpe_chunks" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val chunks = t(s, dir, "documents")
          .where(length($"text") === octet_length($"text"))
          .select($"doc_id",
            graft.functions.BpeTokens($"text",
              TextQueries.bpeOracleMerges).as("toks"))
          .select($"doc_id", $"toks", size($"toks").as("n"))
          .select($"doc_id",
            posexplode(transform(
              sequence(lit(0),
                greatest(lit(1),
                  floor(($"n" + lit(31)) / lit(48.0)).cast("int")) - 1),
              i => struct((i * 48).as("start_tok"),
                slice($"toks", i * 48 + 1, lit(64)).as("ctoks"))))
              .as(Seq("chunk_idx", "c")))
        chunks.select($"doc_id", $"chunk_idx",
          $"c.start_tok".as("start_tok"),
          size($"c.ctoks").as("chunk_tokens"),
          element_at($"c.ctoks", 1).as("head_tok"),
          element_at($"c.ctoks", -1).as("tail_tok"))
      },
      Some("""WITH tok AS (SELECT doc_id,
          flatten(list_transform(string_split_regex(text, '\s+'),
            w -> regexp_extract_all(w, 'th|an|qu|.'))) AS toks
          FROM documents WHERE strlen(text) = length(text)),
        sized AS (SELECT doc_id, toks, len(toks) AS n FROM tok),
        chunks AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
            CAST(i * 48 AS INT) AS start_tok,
            toks[(i * 48 + 1):(i * 48 + 64)] AS ctoks
          FROM sized, LATERAL (SELECT unnest(range(0,
            CAST(greatest(1, floor((n + 31) / 48.0)) AS BIGINT))) AS i) u)
        SELECT doc_id, chunk_idx, start_tok,
          CAST(len(ctoks) AS INT) AS chunk_tokens,
          ctoks[1] AS head_tok, ctoks[len(ctoks)] AS tail_tok
        FROM chunks""")),

    // ---- IR1 BM25 keyword ranking (k1=1.2, b=0.75) for a fixed
    // 3-term query: per-term tf is a per-row array filter (no explode,
    // no per-term shuffle); corpus stats (N, avgdl, per-term df) are
    // ONE tiny aggregate broadcast to the scoring pass. Fixed-order
    // per-term sum + identical associativity on both engines keeps the
    // double arithmetic bit-reproducible; round once at the end.
    "ir1_bm25" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val terms = Seq("spark", "merge", "vector")
        val docs = t(s, dir, "documents")
          .select($"doc_id", TextFunctions.tokens(lower($"text")).as("toks"))
          .select(Seq($"doc_id", size($"toks").cast("double").as("dl")) ++
            terms.zipWithIndex.map { case (tm, i) =>
              size(filter($"toks", x => x === tm))
                .cast("double").as(s"tf$i")
            }: _*)
        val stats = docs.agg(
          count(lit(1)).cast("double").as("n_docs"),
          Seq(avg($"dl").as("avgdl")) ++
            terms.indices.map(i =>
              sum((col(s"tf$i") > 0).cast("long")).cast("double")
                .as(s"df$i")): _*)
        def part(i: Int): Column = {
          val tf = col(s"tf$i"); val df = col(s"df$i")
          log(($"n_docs" - df + 0.5) / (df + 0.5) + 1.0) *
            ((tf * 2.2) / (tf + ($"dl" / $"avgdl" * 0.75 + 0.25) * 1.2))
        }
        docs.crossJoin(broadcast(stats))
          .select($"doc_id",
            round(part(0) + part(1) + part(2), 6).as("bm25"))
          .orderBy($"bm25".desc, $"doc_id".asc)
          .limit(20)
      },
      Some("""WITH docs AS (SELECT doc_id,
          CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) AS dl,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x = 'spark')) AS DOUBLE) AS tf0,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x = 'merge')) AS DOUBLE) AS tf1,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x = 'vector')) AS DOUBLE) AS tf2
          FROM documents),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
          avg(dl) AS avgdl,
          CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
          CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
          CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
          FROM docs)
        SELECT doc_id, round(
          ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) *
            ((tf0 * 2.2) / (tf0 + (dl / avgdl * 0.75 + 0.25) * 1.2))
          + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) *
            ((tf1 * 2.2) / (tf1 + (dl / avgdl * 0.75 + 0.25) * 1.2))
          + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) *
            ((tf2 * 2.2) / (tf2 + (dl / avgdl * 0.75 + 0.25) * 1.2)),
          6) AS bm25
        FROM docs, stats
        ORDER BY bm25 DESC, doc_id ASC LIMIT 20""")),

    // ---- SP6 temperature-scaled language mixture (alpha=0.5, the
    // standard multilingual rebalance): per-lang target counts are
    // count^alpha normalized to a 200-doc budget, selection is
    // deterministic rank-by-doc_id (not rand-based — reruns at any
    // parallelism pick the same docs). The normalizer is a FRAMED
    // window sum ordered by lang so both engines accumulate the
    // doubles in the same order (an unordered sum's float order is
    // engine-dependent and can flip a floor() at the boundary).
    "sp6_temperature_mix" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val full = Window.orderBy($"lang")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        // lang cardinality rows only (5): single-partition window is fine
        val targets = t(s, dir, "documents")
          .groupBy($"lang").agg(count(lit(1)).as("c"))
          .withColumn("wt", sqrt($"c".cast("double")))
          .withColumn("target",
            floor(lit(200.0) * $"wt" / sum($"wt").over(full)).cast("long"))
          .select($"lang", $"target")
        val ranked = t(s, dir, "documents")
          .select($"doc_id", $"lang")
          .withColumn("rn", row_number().over(
            Window.partitionBy($"lang").orderBy($"doc_id")))
        ranked.join(broadcast(targets), "lang")
          .where($"rn" <= $"target")
          .select($"doc_id", $"lang")
      },
      Some("""WITH counts AS (SELECT lang, count(*) AS c
          FROM documents GROUP BY lang),
        tgt AS (SELECT lang,
          CAST(floor(200.0 * sqrt(CAST(c AS DOUBLE)) /
            sum(sqrt(CAST(c AS DOUBLE))) OVER (ORDER BY lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
            AS BIGINT) AS target
          FROM counts),
        ranked AS (SELECT doc_id, lang, row_number() OVER
            (PARTITION BY lang ORDER BY doc_id) AS rn FROM documents)
        SELECT doc_id, r.lang FROM ranked r JOIN tgt USING (lang)
        WHERE rn <= target""")),

    // ---- TX8 Unicode normalization (native `NormalizeText` expression:
    // NFKC + accent strip — see functions/NormalizeExpression.scala).
    // The ASCII corpus is first given deterministic accents
    // (translate a→á … c→ç, identical char-map semantics in both
    // engines), then normalized back; the oracle mirrors with DuckDB's
    // strip_accents. Normalization must be an exact inverse of the
    // accenting, so `restored` is proven row-wise, not assumed. The
    // NFKC compatibility-fold half (ﬁ→fi, fullwidth→ASCII) has no
    // DuckDB mirror (nfc_normalize is NFC only) and is spec-checked in
    // NormalizeTextSpec instead. Zero shuffle — a pure codegen'd
    // projection that runs at scan speed at 100 TB.
    "tx8_normalize" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val accented = translate($"text", "aeiouc", "áéíóúç")
        val norm = graft.functions.NormalizeText(accented)
        t(s, dir, "documents").select($"doc_id",
          length(accented).cast("int").as("n_chars_accented"),
          (norm === $"text").as("restored"),
          md5(norm).as("norm_md5"))
      },
      Some("""SELECT doc_id,
          CAST(length(translate(text, 'aeiouc', 'áéíóúç')) AS INT)
            AS n_chars_accented,
          (strip_accents(translate(text, 'aeiouc', 'áéíóúç')) = text)
            AS restored,
          md5(strip_accents(translate(text, 'aeiouc', 'áéíóúç')))
            AS norm_md5
        FROM documents"""))
  )
}
