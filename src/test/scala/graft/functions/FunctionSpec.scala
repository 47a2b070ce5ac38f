package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("native CosineSimilarity matches the higher-order composition") {
    val emb = graft.Tables(spark, sfDir, "embeddings").limit(50).cache()
    val q = emb.where($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val viaExpr = emb.select($"vec_id",
        CosineSimilarity($"embedding", lit(q.map(_.toDouble))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaHof = emb.select($"vec_id",
        VectorFunctions.cosine($"embedding", lit(q.map(_.toDouble))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    viaExpr.foreach { case (id, s) =>
      assert(math.abs(s - viaHof(id)) < 1e-12, s"vec $id: $s vs ${viaHof(id)}")
    }
  }

  test("float x float path matches double-literal path") {
    val emb = graft.Tables(spark, sfDir, "embeddings").limit(5)
    val rows = emb.select(
      CosineSimilarity($"embedding", $"embedding").as("self")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("wrong-typed inputs fail at ANALYSIS, not as silent garbage: " +
    "an array<int> embedding would read misaligned bytes") {
    val df = Seq((Array(1, 2, 3), "x y z")).toDF("iv", "txt")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(CosineSimilarity($"iv", $"iv")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.ShingleMinHashes($"iv", 3, 4)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.MinHashes($"iv", 4)).collect()
    }
  }

  test("zero vector yields null, not NaN") {
    val df = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
    val r = df.select(CosineSimilarity($"a", $"b")).head()
    assert(r.isNullAt(0))
  }
}

class HyperplaneExprSpec extends SparkSpec {
  import spark.implicits._

  test("native HyperplaneBucket matches the higher-order composition " +
    "on real embeddings") {
    val planes = VectorFunctions.makePlanes(6, 64)
    val emb = graft.Tables(spark, sfDir, "embeddings").limit(100).cache()
    val native = emb.select($"vec_id",
        VectorFunctions.hyperplaneBucket($"embedding", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = emb.select($"vec_id",
        VectorFunctions.hyperplaneBucketHof($"embedding", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof)
    assert(native.values.toSet.size > 1, "buckets should spread")
  }

  test("bucket is stable across evaluation paths and null-safe") {
    val planes = VectorFunctions.makePlanes(4, 2)
    val df = Seq(Some(Array(1f, 2f)), Some(Array(-1f, -2f)), None)
      .toDF("v")
    val rows = df.select(
      VectorFunctions.hyperplaneBucket($"v", planes).as("b")).collect()
    assert(rows(0).getLong(0) != rows(1).getLong(0))
    assert(rows(2).isNullAt(0))
    // identical vector -> identical bucket (dd7's guaranteed-catch base)
    val again = df.select(
      VectorFunctions.hyperplaneBucket($"v", planes).as("b")).collect()
    assert(rows(0).getLong(0) == again(0).getLong(0))
  }
}

class ShingleMinHashSpec extends SparkSpec {
  import spark.implicits._

  test("fused signature is bit-identical to the staged " +
    "shingle->xxhash64->MinHashes pipeline on real documents") {
    val docs = graft.Tables(spark, sfDir, "documents").limit(200).cache()
    val fused = graft.operators.Dedup
      .withMinhashSignature(docs, $"text", 3, 16)
      .select($"doc_id", $"minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val staged = graft.operators.Dedup
      .withMinhashSignatureStaged(docs, $"text", 3, 16)
      .select($"doc_id", $"minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.size == staged.size)
    fused.foreach { case (id, sig) =>
      assert(sig == staged(id), s"signature mismatch for doc $id")
    }
  }

  test("short/empty token arrays yield the all-MaxValue signature") {
    val df = Seq("one two", "").toDF("text") // < 3 tokens each
    val sigs = df.select(graft.functions.ShingleMinHashes(
        TextFunctions.tokens(lower($"text")), 3, 4).as("sig"))
      .collect().map(_.getSeq[Long](0))
    sigs.foreach(s => assert(s.forall(_ == Long.MaxValue)))
  }
}

class TextFunctionSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: n tokens yield n-2 trigram shingles (distinct)") {
    val df = Seq("a b c d e").toDF("text")
    val sh = df.select(TextFunctions.shingles($"text", 3).as("sh"))
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("token counts and ratios on a known string") {
    val df = Seq("The cat, and a dog!").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.bpeishTokenCount($"text").as("bp"),
      TextFunctions.punctRatio($"text").as("pr"),
      TextFunctions.stopwordRatio($"text").as("sr")).head()
    assert(r.getInt(0) == 5)
    // The|cat|,|and|a|dog|! = 7
    assert(r.getInt(1) == 7)
    assert(r.getDouble(2) == math.rint(2.0 / 19 * 1e6) / 1e6 ||
      math.abs(r.getDouble(2) - 2.0 / 19) < 1e-5)
    assert(math.abs(r.getDouble(3) - 3.0 / 5) < 1e-9) // "the", "and", "a"
  }

  test("langGuess picks distinctive stopwords") {
    val df = Seq("der hund und die katze", "le chat et le chien",
      "x y z the q").toDF("text")
    val got = df.select(TextFunctions.langGuess($"text")).as[String].collect()
    assert(got.toSeq == Seq("de", "fr", "en"))
  }

  test("fingerprintPortable: empty and single-token edge cases") {
    val df = Seq("", "word").toDF("text")
    val fps = df.select(TextFunctions.fingerprintPortable($"text"))
      .as[Long].collect()
    // single token: fp == its own code; "word": ascii('w')=119
    assert(fps(1) == (119L * 31 + 4) % 1000000007L)
  }
}

class CodecSpec extends SparkSpec {
  import spark.implicits._

  test("aes round-trip (F7 decrypt-equivalent surface)") {
    val key = "0123456789abcdef" // 16-byte AES key
    val df = Seq("secret config value").toDF("v")
    val back = df.select(
      aes_decrypt(
        unbase64(base64(aes_encrypt($"v".cast("binary"), lit(key)))),
        lit(key)).cast("string").as("back"))
      .head().getString(0)
    assert(back == "secret config value")
  }
}

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  test("accents strip to base letters; ASCII passes through unchanged") {
    val df = Seq("café au lait", "plain ascii", "naïve façade — Ångström")
      .toDF("t")
    val out = df.select(NormalizeText($"t")).as[String].collect()
    assert(out(0) == "cafe au lait")
    assert(out(1) == "plain ascii")
    assert(out(2) == "naive facade — Angstrom")
  }

  test("NFKC compatibility folding: ligatures, fullwidth, precomposed " +
    "vs decomposed unify (the half DuckDB can't mirror)") {
    val composed = "café"                  // U+00E9 precomposed
    val decomposed = "café"          // e + combining acute
    val weird = "ﬁle ｔｏｋｅｎ"            // fi-ligature + fullwidth
    val out = Seq(composed, decomposed, weird).toDF("t")
      .select(NormalizeText($"t")).as[String].collect()
    assert(out(0) == "cafe" && out(1) == "cafe")
    assert(out(2) == "file token")
  }

  test("supplementary-plane combining marks strip too (code-point " +
    "iteration, not UTF-16 chars)") {
    // U+11301 GRANTHA SIGN CANDRABINDU: category Mn, outside the BMP —
    // as two surrogate chars each reads as type SURROGATE, so a char
    // loop would let it survive
    val withMark = "ka" + new String(Character.toChars(0x11301)) + " end"
    val out = Seq(withMark).toDF("t")
      .select(NormalizeText($"t")).as[String].head()
    assert(out == "ka end", out.codePoints().toArray.toSeq.toString)
  }

  test("output recomposes to NFC: Hangul (NFD = conjoining Jamo, not " +
    "base+Mn) comes out codepoint-equal to composed source text") {
    import org.apache.spark.unsafe.types.UTF8String
    val hangul = "한국어"  // composed syllables (NFC)
    val out = NormalizeText.strip(UTF8String.fromString(hangul)).toString
    // without the final NFC pass this is 7 conjoining Jamo codepoints —
    // visually identical, fingerprint-different
    assert(out == hangul,
      out.codePoints().toArray.map(Integer.toHexString).toSeq.toString)
    assert(out.codePointCount(0, out.length) == 3)
    // and the decomposed spelling of the same text unifies with it
    val decomposed = java.text.Normalizer.normalize(
      hangul, java.text.Normalizer.Form.NFD)
    assert(NormalizeText.strip(
      UTF8String.fromString(decomposed)).toString == hangul)
  }

  test("null in, null out; codegen and interpreted paths agree") {
    val df = Seq(Some("über"), None).toDF("t")
    val viaCodegen = df.select(NormalizeText($"t")).collect()
    assert(viaCodegen(0).getString(0) == "uber" && viaCodegen(1).isNullAt(0))
    // interpreted path (nullSafeEval) — exercised directly
    import org.apache.spark.unsafe.types.UTF8String
    assert(NormalizeText.strip(UTF8String.fromString("über")).toString == "uber")
    assert(NormalizeText.strip(UTF8String.fromString("ascii")).toString == "ascii")
  }

  test("SQL registration: normalize_text callable from spark.sql") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT normalize_text('séance ﬁrst') AS n")
      .as[String].head()
    assert(r == "seance first")
  }
}
