package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-table LEARNING (public algorithm — Sennrich, Haddow,
  * Birch, ACL 2016; the word-frequency formulation every public
  * tokenizer trainer uses): tokenizer training is a corpus-level
  * aggregation plus a vocabulary-sized greedy loop, NOT a per-row
  * transform — so the distributed part is exactly ONE word-count
  * aggregation (whitespace words via the ws_tokens byte scan, top
  * `maxVocabWords` by frequency — the bounded collect that makes the
  * driver loop corpus-size-independent), and the merge loop runs
  * driver-side over that frequency dict:
  *
  *   repeat numMerges times:
  *     count adjacent symbol pairs across all words, weighted by
  *       word frequency (every adjacent position counts — the
  *       standard formulation, overlaps included);
  *     adopt the most frequent pair (ties break on count desc, then
  *       lexicographic pair asc — DETERMINISTIC, so two trainers on
  *       the same corpus learn identical tables);
  *     apply it to every word non-overlapping left-to-right — the
  *       SAME application rule as [[graft.functions.BpeTokens]], so
  *       rank order == learn order and the learned table feeds the
  *       tokenizer directly.
  *
  * Byte-level like the tokenizer: symbols start as single bytes
  * (latin1-string representation — [[graft.functions.BpeTokens]]'s
  * convention), so the learned sides are directly valid merge-table
  * entries and dirty bytes train like any other.
  *
  * Scale shape: the aggregation is one shuffle on the word hash with
  * map-side combine (vocabulary-sized output, not corpus-sized); the
  * collect is capped at `maxVocabWords` rows; the loop is
  * O(numMerges × vocab × avgWordLen) driver arithmetic — all three
  * terms independent of corpus row count, which is what lets the
  * same call train on 100 TB.
  */
object BpeTrain {

  /** Learn up to `numMerges` merges from `df`'s text column. Stops
    * early when no adjacent pair reaches `minFrequency` (learning
    * noise merges from singleton words helps nothing). Returns the
    * table in learned order — [[graft.functions.BpeTokens]]'s rank
    * order. */
  def learnMerges(df: DataFrame, text: String, numMerges: Int,
      maxVocabWords: Int = 65536, minFrequency: Long = 2L)
      : Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxVocabWords > 0, s"maxVocabWords must be positive")
    // ONE distributed aggregation: whitespace word frequencies, top
    // maxVocabWords by (count desc, word asc) — deterministic and
    // driver-bounded. The tail beyond the cap is rare words whose
    // pair mass is dominated by the head anyway (the public trainers
    // cap identically).
    // the word column crosses to the driver as BINARY: a String
    // round-trip would collapse malformed UTF-8 to U+FFFD, training
    // merges over replacement bytes the tokenizer never sees on the
    // real data (and spuriously merging distinct dirty words' counts)
    // — the raw-byte discipline must hold end to end
    val freqs: Array[(Array[Byte], Long)] = df
      .select(explode(graft.functions.WhitespaceTokens(col(text)))
        .as("__w"))
      .where(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w").asc)
      .limit(maxVocabWords)
      .select(col("__w").cast("binary"), col("__n"))
      .collect()
      .map(r => (r.getAs[Array[Byte]](0), r.getLong(1)))
    learnFromFreqs(freqs, numMerges, minFrequency)
  }

  /** The driver-side loop, factored for direct spec coverage. */
  private[graft] def learnFromFreqs(freqs: Array[(Array[Byte], Long)],
      numMerges: Int, minFrequency: Long): Seq[(String, String)] = {
    // words as mutable symbol vectors (latin1 chars = bytes)
    val words: Array[Array[String]] = freqs.map { case (bytes, _) =>
      bytes.map(b => String.valueOf((b & 0xFF).toChar))
    }
    val counts = freqs.map(_._2)
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      // pair census, frequency-weighted, every adjacent position
      val pairCount =
        new java.util.HashMap[(String, String), java.lang.Long]()
      var w = 0
      while (w < words.length) {
        val syms = words(w)
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          val prev = pairCount.get(key)
          pairCount.put(key,
            (if (prev == null) 0L else prev.longValue()) + counts(w))
          i += 1
        }
        w += 1
      }
      // deterministic argmax: count desc, then (left, right) asc
      var best: (String, String) = null
      var bestN = minFrequency - 1
      val it = pairCount.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val n = e.getValue.longValue()
        val k = e.getKey
        if (n > bestN || (n == bestN && best != null &&
            (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
          best = k
          bestN = n
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        // apply non-overlapping left-to-right — BpeTokens' rule
        var w = 0
        while (w < words.length) {
          val syms = words(w)
          if (syms.length > 1) {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) {
                out += (syms(i) + syms(i + 1)); i += 2
              } else { out += syms(i); i += 1 }
            }
            words(w) = out.result()
          }
          w += 1
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Convenience: learn merges and return the tokenizing column in
    * one call — `bpeColumn(docs, "text", 1000)` is the end-to-end
    * "train a tokenizer on this corpus and use it" surface. */
  def bpeColumn(df: DataFrame, text: String, numMerges: Int,
      maxVocabWords: Int = 65536): Column =
    graft.functions.BpeTokens(col(text),
      learnMerges(df, text, numMerges, maxVocabWords))
}
