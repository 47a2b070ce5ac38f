package graft

import graft.functions.{CosineSimilarity, HtmlExtract, MinHashes, NormalizeText}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration (builder preference (c) wiring):
  * exposes the engine's native expressions to SQL users —
  *
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  *   spark.sql("SELECT minhashes(hash_array, 16) ...")
  *
  * and ANSI `MERGE INTO` over parquet catalog tables (the reference's
  * Delta-MERGE surface) via an injected resolution rule —
  *
  *   spark.sql("MERGE INTO t USING s ON t.k = s.k " +
  *     "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
  *
  * Activate via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * No custom optimizer rules are injected: SURVEY §4 establishes that
  * Catalyst already covers the reference's optimization surface; the
  * engine's value-add is expressions and the MERGE lowering, not
  * optimizer rewrites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, usage, b) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), b))
    }
    e.injectResolutionRule(graft.plans.ResolveParquetMerge.apply)
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  private val builders: Seq[(String, String, Seq[Expression] => Expression)] =
    Seq(
      ("cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float/double arrays",
        args => CosineSimilarity(args(0), args(1))),
      ("minhashes",
        "minhashes(hashes, k) - k MinHash minima of an array<long>",
        args => args(1) match {
          case Literal(k: Int, _) => MinHashes(args(0), k)
          case other => throw new IllegalArgumentException(
            s"minhashes(hashes, k): k must be an integer literal, got $other")
        }),
      ("normalize_text",
        "normalize_text(s) - NFKC-normalize and strip accents/combining marks",
        args => NormalizeText(args(0))),
      ("html_extract",
        "html_extract(s) - main-text extraction from HTML/markup " +
          "(tags/scripts/comments stripped, entities decoded, " +
          "majority-link blocks dropped as boilerplate)",
        args => HtmlExtract(args(0))))

  /** Register on an already-built session (the extensions config only
    * applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
