package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** WhitespaceTokens must be BIT-IDENTICAL to `split(text, "\\s+")`:
  * every text query's oracle was validated against the built-in, so
  * the native scanner may only change the cost, never a token. */
class WhitespaceTokensSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]): Unit = {
    val rows = texts.toDF("t")
      .select(
        WhitespaceTokens(col("t")).as("fast"),
        split(col("t"), "\\s+").as("ref"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch for ${t.map(c => f"\\u$c%04x").mkString}: " +
          s"fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
    }
  }

  test("edge semantics match the built-in exactly: empties, leading/" +
    "trailing/repeated whitespace, every \\s char, non-\\s unicode " +
    "spaces, multibyte text") {
    both(Seq(
      "", " ", "  ", "a", " a", "a ", " a ", "a b", "a  b",
      "\t", "a\tb", "a\nb", "ab", "a\fb", "a\rb",
      "\t\n\f\r ", "a\t \n b",
      // U+00A0 NBSP and U+2009 thin space are NOT Java \s: must stay
      // inside tokens, exactly as the regex leaves them
      "a b", "a b c",
      "héllo wörld", "日本 語 テスト",
      "🙂 emoji\ttest",
      "multi  \t\r\n  run", "ends with nl\n", "\nstarts"))
  }

  test("property: random strings over a whitespace-heavy alphabet " +
    "agree with the built-in (ScalaCheck)") {
    val ch = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '', '\f', '\r'),
      1 -> Gen.oneOf('é', '日', ' ', ' ', 'ß'))
    val frag = Gen.frequency(
      9 -> ch.map(_.toString),
      // 4-byte UTF-8 (surrogate pairs in the Java string): the byte
      // scanner must slice through them exactly like the regex
      1 -> Gen.oneOf("🙂", "𝕏", "👍\t👍"))
    val strGen = Gen.listOf(frag).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(50, strGen)) { texts =>
      val rows = texts.toDF("t")
        .select(WhitespaceTokens(col("t")), split(col("t"), "\\s+"))
        .collect()
      rows.forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("invalid UTF-8: raw bytes pass through unchanged (INTENDED " +
    "divergence from the built-in, which replaces them with U+FFFD)") {
    import org.apache.spark.unsafe.types.UTF8String
    // "a<0xFF> b<0xC3>" — 0xFF can start no UTF-8 sequence; the
    // trailing 0xC3 is a truncated 2-byte lead. Parquet would store
    // these bytes verbatim; the scanner must slice, not transcode.
    val dirty = Array[Byte](0x61, 0xFF.toByte, 0x20, 0x62, 0xC3.toByte)
    val e = WhitespaceTokens(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromBytes(dirty),
        org.apache.spark.sql.types.StringType))
    val v = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val toks = (0 until v.numElements()).map(v.getUTF8String(_).getBytes.toSeq)
    // boundaries on the ASCII space; malformed bytes preserved raw
    assert(toks == Seq(Seq[Byte](0x61, 0xFF.toByte),
      Seq[Byte](0x62, 0xC3.toByte)))
    // and the built-in really does diverge here (documents WHY the
    // ScalaCheck parity property cannot cover invalid UTF-8): a
    // String round-trip mangles the malformed bytes to U+FFFD
    val mangled = UTF8String.fromString(UTF8String.fromBytes(dirty).toString)
    assert(!java.util.Arrays.equals(mangled.getBytes, dirty))
  }

  test("null containment and codegen/interpreted parity") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "a b"))
      .toDF("id", "t")
    val got = df.select(WhitespaceTokens(col("t"))).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getSeq[String](0) == Seq("a", "b"))
    // interpreted path (eval) must agree with the codegen'd path
    val e = WhitespaceTokens(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("x  y\tz "),
        org.apache.spark.sql.types.StringType))
    val v = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until v.numElements()).map(v.getUTF8String(_).toString)
      == Seq("x", "y", "z", ""))
  }
}
