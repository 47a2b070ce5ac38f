package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: byte-scan split on runs of ASCII
  * whitespace, bit-identical to `split(text, "\\s+")` (Java regex
  * `\s` = `[ \t\n\x0B\f\r]`, limit −1 — leading empty token when the
  * text starts with whitespace, trailing empty token when it ends
  * with one, `[""]` for the empty string).
  *
  * Why it exists (builder preference (b) — a native Expression over
  * a built-in that can't keep up): `StringSplit` routes every row
  * through `UTF8String.toString` → `Pattern.split` → re-encode, and
  * tokenization is the FLOOR of every text-pipeline query — the gate,
  * MinHash signatures, st16's stream, tx1–tx11. Profiled at sf0.1
  * (r13): a bare `split('\s+')`-and-count pass over 5k documents cost
  * ~1.2 s — ~100× the byte-scan cost of the same pass. This scanner
  * slices UTF8String views out of one byte array (UTF-8 multibyte
  * sequences never contain ASCII bytes, so the byte scan is exact)
  * with no regex, no String round-trip, and no per-row compile.
  * Parity with the built-in is pinned by a ScalaCheck spec
  * (WhitespaceTokensSpec) over adversarial inputs.
  *
  * INTENDED divergence on invalid UTF-8: parquet stores string bytes
  * verbatim, and a dirty 100-TB corpus can carry malformed sequences.
  * The built-in round-trips through `java.lang.String`, so malformed
  * bytes become U+FFFD in every output token; this scanner slices the
  * RAW bytes through unchanged (whitespace is ASCII either way, so
  * token BOUNDARIES agree — only the malformed token content
  * differs). Raw-byte is the behavior we want — tokens/shingles/
  * MinHash stay a function of the stored bytes instead of collapsing
  * all malformed sequences onto one replacement char (which would
  * make distinct dirty docs spuriously identical). Pinned by the
  * "invalid UTF-8" WhitespaceTokensSpec case.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.catalogString}")
    }
  }

  def split(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    var start = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      // ASCII whitespace, exactly Java regex \s: \t \n \x0B \f \r ' '
      if ((b >= 0x09 && b <= 0x0d) || b == 0x20) {
        out += UTF8String.fromBytes(bytes, start, i - start)
        i += 1
        while (i < n && {
          val c = bytes(i); (c >= 0x09 && c <= 0x0d) || c == 0x20
        }) i += 1
        start = i
      } else i += 1
    }
    // the final (possibly empty) token — Pattern.split with limit −1
    // keeps a trailing empty, and returns [""] for the empty string
    out += UTF8String.fromBytes(bytes, start, n - start)
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // one virtual call per row into the scanner above — stays inside
    // whole-stage codegen (no CodegenFallback), and the scan cost
    // dwarfs the call
    val ref = ctx.addReferenceObj("wsTokens", this,
      classOf[WhitespaceTokens].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.split($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WhitespaceTokens {
  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(WhitespaceTokens(GraftShims.toExpression(text)))
  }
}
