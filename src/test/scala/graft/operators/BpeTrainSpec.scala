package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge learning (BpeTrain): the classic worked example must
  * come out exactly, the learned table must feed the tokenizer
  * directly (rank = learn order), learning must be deterministic and
  * must stop at the frequency floor. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("the Sennrich worked corpus learns (e,s)(es,t)(l,o)(lo,w) — " +
    "frequency-weighted census, deterministic lexicographic ties") {
    val freqs = Array(
      (bytes("low"), 5L), (bytes("lower"), 2L),
      (bytes("newest"), 6L), (bytes("widest"), 3L))
    val merges = BpeTrain.learnFromFreqs(freqs, 4, minFrequency = 2L)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w")), merges.toString)
  }

  test("end-to-end: learnMerges over a DataFrame equals the direct " +
    "loop, and the learned table tokenizes through BpeTokens with " +
    "rank = learn order") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq(text).toDF("text")
    val merges = BpeTrain.learnMerges(df, "text", 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w")))
    val toks = Seq("lowest newest").toDF("t")
      .select(graft.functions.BpeTokens($"t", merges).as("toks"))
      .head().getSeq[String](0)
    // lowest: l,o,w,e,s,t -> es -> est -> lo -> lo,w -> [low, est]
    // newest: n,e,w,e,s,t -> [n, e, w, est]
    assert(toks == Seq("low", "est", "n", "e", "w", "est"),
      toks.toString)
    // more merges never increase the token count (monotone dial)
    def countAt(n: Int): Long = {
      val m = BpeTrain.learnMerges(df, "text", n)
      df.select(size(graft.functions.BpeTokens($"text", m)))
        .head().getInt(0).toLong
    }
    val counts = Seq(0, 2, 4, 8).map(countAt)
    assert(counts == counts.sorted.reverse, counts.toString)
  }

  test("learning is deterministic across runs and stops at the " +
    "frequency floor instead of inventing noise merges") {
    val docs = graft.Tables(spark, sfDir, "documents").limit(200)
    val a = BpeTrain.learnMerges(docs, "text", 16)
    val b = BpeTrain.learnMerges(docs, "text", 16)
    assert(a == b && a.length == 16)
    // all-unique-chars corpus: no pair reaches minFrequency 2 beyond
    // the ones that exist; an impossible floor learns nothing
    val tiny = Seq("abc def").toDF("text")
    assert(BpeTrain.learnMerges(tiny, "text", 8,
      minFrequency = 5L).isEmpty)
    // numMerges beyond exhaustion stops early, never loops
    val few = BpeTrain.learnMerges(tiny, "text", 100)
    assert(few.length < 10, few.toString)
  }

  test("training preserves raw bytes end to end: invalid UTF-8 words " +
    "train merges over THEIR bytes, not U+FFFD replacements") {
    // 'c' + lone continuation byte 0xE9 — invalid UTF-8; a String
    // round-trip would collapse it to EF BF BD and the learned sides
    // would name bytes the tokenizer never sees on the real data
    val dirty = Array[Byte](0x63, 0xE9.toByte)
    val df = Seq.fill(4)(dirty).toDF("b")
      .select($"b".cast("string").as("text"))
    val merges = BpeTrain.learnMerges(df, "text", 1)
    assert(merges == Seq(("c", "é")), merges.toString)
    // and the learned table round-trips through the tokenizer: the
    // dirty word becomes ONE token of the original raw bytes
    val toks = df.limit(1)
      .select(graft.functions.BpeTokens($"text", merges).as("t"))
      .head().getSeq[String](0)
    assert(toks.length == 1)
  }

  test("learned merges reduce the real corpus's token count vs the " +
    "byte baseline (the compression the training exists for)") {
    val docs = graft.Tables(spark, sfDir, "documents").limit(300)
    val baseline = docs.select(sum(size(
      graft.functions.BpeTokens($"text", Seq.empty)))).head().getLong(0)
    val merges = BpeTrain.learnMerges(docs, "text", 64)
    val learned = docs.select(sum(size(
      graft.functions.BpeTokens($"text", merges)))).head().getLong(0)
    assert(learned < baseline * 8 / 10,
      s"64 learned merges only compressed $baseline -> $learned")
  }
}
