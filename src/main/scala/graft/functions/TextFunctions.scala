package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines
  * ([EXT], north star in BASELINE.json). All pure `functions._`
  * compositions — codegen'd, no UDFs, so they run inside whole-stage
  * codegen over 100 TB of documents without serialization overhead.
  */
object TextFunctions {

  /** Whitespace tokenization (SURVEY §2.7 F8 split applied to
    * columns). Native byte-scan expression, bit-identical to
    * `split(text, "\\s+")` — see [[WhitespaceTokens]] for why the
    * built-in (per-row regex + String round-trip) is ~100× slower on
    * this, the hottest path in the text pipeline. */
  def tokens(text: Column): Column = WhitespaceTokens(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alnum marks — the pre-tokenizer shape BPE vocabularies use. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio of non [a-zA-Z0-9 ] characters (punctuation-ish) to length. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[A-Za-z0-9 ]", ""))
      .cast("double") / length(text), 6)

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column =
    stopwordRatioFromTokens(tokens(lower(text)))

  /** [[stopwordRatio]] over an already-materialized token column —
    * the attribute form for hot paths that also feed the tokens to
    * other per-token expressions (see [[shinglesFromTokens]]'s
    * scaladoc for why the attribute form matters). */
  def stopwordRatioFromTokens(toks: Column): Column = {
    val hits = size(filter(toks,
      t => Stopwords.map(s => t === s).reduce(_ || _)))
    round(hits.cast("double") / size(toks), 6)
  }

  /** Composite quality score in [0,1]: length band + low punct +
    * nonzero stopword share (the usual pretraining-filter trio). */
  def qualityScore(text: Column): Column = {
    val lenOk = (length(text) >= 50 && length(text) <= 20000).cast("double")
    val punctOk = (punctRatio(text) < 0.1).cast("double")
    val stopOk = (stopwordRatio(text) > 0.01).cast("double")
    round((lenOk + punctOk + stopOk) / 3.0, 6)
  }

  /** Language-ID by distinctive-stopword hits (n-gram/stopword heuristic;
    * deterministic, oracle-expressible as the same CASE chain). */
  def langGuess(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    when(t.contains(" the ") || t.contains(" and "), "en")
      .when(t.contains(" der ") || t.contains(" und "), "de")
      .when(t.contains(" le ") || t.contains(" et "), "fr")
      .when(t.contains(" el ") || t.contains(" y "), "es")
      .otherwise("unknown")
  }

  /** Deterministic document fingerprint: polynomial rolling hash of the
    * token stream mod 1e9+7, computed with the higher-order `aggregate`
    * built-in (no UDF). Overflow-free: acc < 1e9+7 so acc*131 + hash
    * stays far below 2^63. */
  def fingerprint(text: Column): Column = {
    val M = 1000000007L
    aggregate(
      tokens(text),
      lit(0L),
      (acc, tok) => (acc * lit(131L) + pmod(crc32(tok), lit(M))) % lit(M))
  }

  /** Oracle-portable fingerprint: same rolling-hash shape but with a
    * per-token code DuckDB can mirror exactly (ascii of first char and
    * token length), folded list_reduce-style (first element is the
    * seed). */
  def fingerprintPortable(text: Column): Column = {
    val M = lit(1000000007L)
    val codes = transform(tokens(text),
      w => (ascii(w).cast("long") * lit(31L) + length(w)) % M)
    when(size(codes) === 0, lit(0L)).otherwise(
      aggregate(
        slice(codes, lit(2), greatest(size(codes) - 1, lit(0))),
        element_at(codes, 1),
        (acc, x) => (acc * lit(131L) + x) % M))
  }

  /** Distinct word n-gram shingles from a token array column, built
    * from n SLICED copies zipped positionally — `toks` is referenced
    * O(n) times PER ROW, never per element. The earlier form indexed
    * `element_at(toks, i+j+1)` inside a `transform` lambda, where a
    * non-attribute `toks` (e.g. `split(...)` inlined by
    * CollapseProject) re-ran tokenization for EVERY shingle element:
    * measured 8–9 s for 5k docs at sf0.1 versus ~0.3 s for this form,
    * and the trap was invisible to `.count()`-shaped benchmarks
    * because column pruning dropped the shingle expression entirely.
    * Short inputs (< n tokens) now yield the EMPTY array on both
    * engines (the old `sequence(0,-1)` descended and produced bogus
    * partial shingles for them). */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val count = greatest(size(toks) - (n - 1), lit(0))
    val joined = (1 until n).foldLeft(slice(toks, lit(1), count)) {
      (acc, j) =>
        zip_with(acc, slice(toks, lit(j + 1), count),
          (a, b) => concat_ws(" ", a, b))
    }
    array_distinct(joined)
  }

  /** Word n-gram shingles of size n (for Jaccard / MinHash dedup).
    * Convenience single-expression form — fine for one-shot projections
    * (oracle queries); hot paths should materialize tokens and use
    * `shinglesFromTokens` (see its scaladoc). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(lower(text)), n)
}
