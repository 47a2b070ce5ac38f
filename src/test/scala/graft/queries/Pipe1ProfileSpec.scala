package graft.queries
import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
class Pipe1ProfileSpec extends SparkSpec {
  test("profile gate variants at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables(spark, dir, "documents")
    docs.count()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"STAGE $tag%-22s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    time("scan-count")(docs.count())
    time("tokens-once")(docs.where(
      size(TextFunctions.tokens(lower(col("text")))) >= 5).count())
    time("tokens+stop")(docs.where(
      { val tk = TextFunctions.tokens(lower(col("text")))
        size(tk) >= 5 && TextFunctions.stopwordRatioFromTokens(tk) > 0.01
      }).count())
    time("tokens+shingle")(docs.where(
      { val tk = TextFunctions.tokens(lower(col("text")))
        size(TextFunctions.shinglesFromTokens(tk, 3)) >= 1
      }).count())
    time("gate-now")(CapstoneQueries.gate(docs).count())
    // barrier variant: nondeterministic col blocks predicate pushdown
    val toked = docs.withColumn("__toks",
        TextFunctions.tokens(lower(col("text"))))
      .withColumn("__nd", rand())
    val toks = col("__toks")
    val t3 = greatest(size(toks) - 2, lit(0))
    val d3 = size(TextFunctions.shinglesFromTokens(toks, 3))
    val rep = lit(1.0) - d3.cast("double") /
      greatest(t3, lit(1)).cast("double")
    val gated = toked.where(col("doc_id") % 97 =!= 0 &&
      col("n_chars").between(60, 520) && size(toks) >= 5 &&
      rep <= 0.3 && TextFunctions.stopwordRatioFromTokens(toks) > 0.01)
    time("gate-barrier")(gated.count())
    time("gate-barrier2")(gated.count())
  }
}
