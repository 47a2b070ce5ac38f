package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode text normalization for corpus
  * curation — NFKC compatibility normalization (fullwidth forms,
  * ligatures, compatibility variants collapse to canonical chars)
  * followed by accent stripping (NFD decomposition, combining marks
  * dropped). The standard first pass of a multilingual training-data
  * pipeline before tokenization/dedup: "café", "café" (decomposed) and
  * "ｃａｆé" all normalize to "cafe", so fingerprints and shingles unify
  * across encoding variants of the same text.
  *
  * Why a custom Expression (SURVEY §2.10, preference (b)): Spark has no
  * built-in accent-strip/Unicode-normalize scalar, and a Scala UDF
  * would box every row AND break the whole-stage-codegen span of the
  * curation scan. Like CosineSimilarity, doGenCode keeps the operator
  * inside WholeStageCodegen; the generated code calls the static
  * [[NormalizeText.strip]] helper (a JVM static call from generated
  * Java, NOT CodegenFallback — the row stays unboxed in the generated
  * pipeline). ASCII fast path: the common case returns the input
  * UTF8String without copying.
  *
  * Oracle parity: DuckDB `strip_accents(nfc_normalize(x))` agrees on
  * Latin-script accents (both reduce to base letters); verified
  * hash-exact by tx8_normalize.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** NFKC → NFD → drop combining marks. Static so generated code can
    * call it without holding an object reference. */
  def strip(s: UTF8String): UTF8String = {
    // ASCII fast path: NFKC/NFD are the identity and no combining marks
    // exist — return the same UTF8String, zero allocation.
    if (isAscii(s)) return s
    val nfkc = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKC)
    val nfd = java.text.Normalizer.normalize(
      nfkc, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    // iterate CODE POINTS, not chars: a supplementary-plane combining
    // mark (e.g. Grantha U+11301) is two surrogate chars, each of
    // char-type SURROGATE — a char loop would let it survive
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // recompose to NFC: scripts whose NFD form is not just base+Mn
    // (Hangul syllables decompose to conjoining Jamo) must come back
    // out codepoint-equal to visually identical NFC text, or
    // fingerprints/shingles won't unify across sources
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb, java.text.Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Column-level entry point (Spark 4: Column <-> Expression bridged
    * via GraftShims). */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(NormalizeText(GraftShims.toExpression(c)))
  }
}
