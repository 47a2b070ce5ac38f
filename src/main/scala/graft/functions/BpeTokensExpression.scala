package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BYTE-LEVEL BPE tokenizer (public algorithm — Sennrich,
  * Haddow, Birch, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016; byte-level variant as in GPT-2's public
  * tokenizer): pre-tokenize on ASCII whitespace (the
  * [[WhitespaceTokens]] byte scan — token BOUNDARIES are shared with
  * every ws_tokens-based query), start each word as one symbol per
  * BYTE, then repeatedly merge the adjacent symbol pair with the
  * LOWEST rank in the merges table (all occurrences of that pair,
  * left to right, then re-scan) until no adjacent pair has a rank.
  * Output is the concatenation of each word's final symbols, in
  * order — whitespace itself emits no tokens, so `size(bpe_tokens)`
  * is the SUBWORD token count a training pipeline packs/chunks by
  * (where `ws_tokens` counts words).
  *
  * Why byte-level: parquet stores string bytes verbatim and a dirty
  * 100-TB corpus carries malformed UTF-8; byte symbols make the
  * tokenization a total function of the stored bytes (the ws_tokens
  * raw-byte discipline — no U+FFFD collapse), and merges can span
  * multibyte sequences only when the merges table says so, exactly
  * like the public byte-level vocabularies. Output tokens are the
  * RAW byte slices (an un-merged multibyte character contributes one
  * token per byte).
  *
  * Why a native Expression (builder preference (b), the ws_tokens
  * rationale): the merge loop runs per row in the packing/chunking
  * hot path; a Scala UDF would pay serialization per row and any
  * higher-order-function composition would be CodegenFallback. The
  * merges table rides the expression as a reference object
  * (driver-sized: a real vocabulary is ≤ ~50k pairs), hashed ONCE
  * into a rank map at construction.
  *
  * The merge loop is the textbook greedy algorithm: O(w) rank
  * lookups per pass, one pass per applied merge — worst case
  * O(w²) per word on pathological single-char runs, linear on
  * prose (words are short; merges per word ≤ word bytes).
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  // validate the merges table at CONSTRUCTION (driver), not first
  // eval (executor) — a bad table must fail the plan, not the job
  merges.foreach { case (a, b) =>
    require(a.nonEmpty && b.nonEmpty &&
      a.forall(_ <= 0xFF) && b.forall(_ <= 0xFF),
      s"BPE merge sides are byte sequences as latin1 strings — " +
        s"('$a', '$b') has an empty side or a char above U+00FF")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.catalogString}")
    }
  }

  /** Rank map keyed on the (left, right) symbol pair. Symbols are
    * byte sequences represented as ISO-8859-1 strings (bijective
    * byte↔char, so distinct byte sequences never collide), and the
    * merge sides use the SAME representation: each char of a merge
    * side IS one byte (chars > U+00FF refuse — they name no byte).
    * ASCII merge tables read naturally; a byte-level vocabulary that
    * merges raw high bytes (e.g. the two bytes of an accented UTF-8
    * char) spells them as latin1 chars. Keying the sides separately
    * keeps (ab, c) distinct from (a, bc). First occurrence of a pair
    * wins — duplicate later entries are dead, as in the public
    * vocabularies. */
  @transient private lazy val rank
      : java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val key = (a, b)
      if (!m.containsKey(key)) m.put(key, i)
    }
    m
  }

  /** BPE over one word's bytes → symbols as latin1 strings. */
  private def encodeWord(bytes: Array[Byte], start: Int, end: Int,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val n = end - start
    if (n == 0) return
    var syms = new Array[String](n)
    var i = 0
    while (i < n) {
      syms(i) = String.valueOf((bytes(start + i) & 0xFF).toChar)
      i += 1
    }
    var len = n
    var done = false
    while (!done && len > 1) {
      // find the lowest-rank adjacent pair
      var best = Int.MaxValue
      var i = 0
      while (i < len - 1) {
        val r = rank.get((syms(i), syms(i + 1)))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of the best pair, left to right
        val next = new Array[String](len)
        var w = 0
        var j = 0
        while (j < len) {
          if (j < len - 1) {
            val r = rank.get((syms(j), syms(j + 1)))
            if (r != null && r.intValue() == best) {
              next(w) = syms(j) + syms(j + 1)
              w += 1
              j += 2
            } else { next(w) = syms(j); w += 1; j += 1 }
          } else { next(w) = syms(j); w += 1; j += 1 }
        }
        syms = next
        len = w
      }
    }
    i = 0
    while (i < len) {
      val s = syms(i)
      val b = new Array[Byte](s.length)
      var j = 0
      while (j < s.length) { b(j) = s.charAt(j).toByte; j += 1 }
      out += UTF8String.fromBytes(b)
      i += 1
    }
  }

  /** Whitespace pre-tokenization (the ws_tokens byte scan — ASCII
    * \s exactly; multibyte UTF-8 never contains ASCII bytes) with
    * BPE applied per word. */
  def encode(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](32)
    var start = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 0x09 && b <= 0x0d) || b == 0x20) {
        encodeWord(bytes, start, i, out)
        i += 1
        while (i < n && {
          val c = bytes(i); (c >= 0x09 && c <= 0x0d) || c == 0x20
        }) i += 1
        start = i
      } else i += 1
    }
    encodeWord(bytes, start, n, out)
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // one virtual call per row into the encoder above — stays inside
    // whole-stage codegen (no CodegenFallback), the ws_tokens shape
    val ref = ctx.addReferenceObj("bpeTokens", this,
      classOf[BpeTokens].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BpeTokens {
  def apply(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(
      BpeTokens(GraftShims.toExpression(text), merges))
  }
}
