package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-level BPE (BpeTokens): the codegen'd expression must agree
  * with an independent Scala reference implementation on arbitrary
  * text and merge tables, obey the canonical merge semantics (rank
  * priority, merge-all-occurrences, multi-level merges, word
  * boundaries), and follow the family's null/raw-byte conventions. */
class BpeTokensSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: regex whitespace split, per-word
    * min-rank merge loop over byte symbols (as latin1 strings). */
  private def ref(text: String, merges: Seq[(String, String)])
      : Seq[String] = {
    val rank = merges.zipWithIndex.reverse.toMap // first occurrence wins
    def word(bytes: Array[Byte]): Seq[String] = {
      var syms = bytes.map(b =>
        String.valueOf((b & 0xFF).toChar)).toVector
      var changed = true
      while (changed && syms.length > 1) {
        val pairs = syms.zip(syms.tail)
        val ranked = pairs.flatMap(p => rank.get(p).map(r => (r, p)))
        if (ranked.isEmpty) changed = false
        else {
          val (_, best) = ranked.minBy(_._1)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && (syms(i), syms(i + 1)) == best) {
              out += (syms(i) + syms(i + 1)); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }
    // ASCII \s split; empty words tokenize to nothing
    text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val words = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var start = 0
    for (i <- bytes.indices) {
      val b = bytes(i)
      if ((b >= 0x09 && b <= 0x0d) || b == 0x20) {
        if (i > start) words += bytes.slice(start, i)
        start = i + 1
      }
    }
    if (bytes.length > start) words += bytes.slice(start, bytes.length)
    words.toSeq.flatMap(word)
  }

  private def run(texts: Seq[String],
      merges: Seq[(String, String)]): Seq[Seq[String]] =
    texts.toDF("t")
      .select(BpeTokens($"t", merges).as("toks"))
      .collect().map(_.getSeq[String](0)).toSeq

  test("canonical semantics: multi-level merges, rank priority, " +
    "merge-all-occurrences, and word boundaries") {
    // Sennrich's worked example shape: l+o -> lo, lo+w -> low
    val m1 = Seq(("l", "o"), ("lo", "w"))
    assert(run(Seq("low lower lowest"), m1) ==
      Seq(Seq("low", "low", "e", "r", "low", "e", "s", "t")))
    // rank priority: (a,b) before (b,c) consumes the shared b...
    assert(run(Seq("abc"), Seq(("a", "b"), ("b", "c"))) ==
      Seq(Seq("ab", "c")))
    // ...and the reversed table yields the other parse
    assert(run(Seq("abc"), Seq(("b", "c"), ("a", "b"))) ==
      Seq(Seq("a", "bc")))
    // merge-all-occurrences, left to right, no overlap re-use
    assert(run(Seq("aaa aaaa"), Seq(("a", "a"))) ==
      Seq(Seq("aa", "a", "aa", "aa")))
    // merges never span whitespace; runs/leading/trailing ws drop out
    assert(run(Seq("  q u\tqu\n"), Seq(("q", "u"))) ==
      Seq(Seq("q", "u", "qu")))
    // empty text -> zero tokens (ws_tokens' [""] would be one word of
    // zero bytes — BPE of nothing is nothing)
    assert(run(Seq(""), m1) == Seq(Seq()))
    // no merges: one token per byte, multibyte chars split raw
    assert(run(Seq("é"), Seq.empty).head.length == 2)
  }

  test("high-byte merges via latin1 sides: the two UTF-8 bytes of é " +
    "merge into one token when the table says so") {
    // é = 0xC3 0xA9; latin1 chars Ã © name those bytes
    val toks = run(Seq("é"), Seq(("Ã", "©"))).head
    assert(toks == Seq("é"), toks.toString)
    // invalid merge sides refuse at construction
    intercept[IllegalArgumentException] {
      BpeTokens(lit("x"), Seq(("", "a")))
    }
    intercept[IllegalArgumentException] {
      BpeTokens(lit("x"), Seq(("→", "a"))) // U+2192 names no byte
    }
  }

  test("codegen equals the independent reference on random text and " +
    "merge tables (ScalaCheck), including merged-symbol chains") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val alpha = Gen.oneOf("abcde \t".toSeq).map(_.toString)
    val textGen = Gen.listOf(alpha).map(_.mkString)
    val sideGen = Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcde".toSeq)).map(_.mkString))
    val mergesGen = Gen.listOf(Gen.zip(sideGen, sideGen))
    val prop = Prop.forAll(textGen, mergesGen) { (t, m) =>
      run(Seq(t), m).head == ref(t, m)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("interpreted path equals codegen; null in null out; " +
    "size(bpe_tokens) is the packing count") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val m = Seq(("t", "h"), ("th", "e"))
    val interp = BpeTokens(Literal("the theory"), m).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val got = (0 until interp.numElements())
      .map(i => interp.getUTF8String(i).toString)
    assert(got == Seq("the", "the", "o", "r", "y"))
    val rows = Seq(Some("the theory"), None).toDF("t")
      .select(BpeTokens($"t", m).as("toks"))
      .select(size($"toks").as("n")).collect()
    assert(rows(0).getInt(0) == 5 && rows(1).isNullAt(0))
  }
}
