package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The correctness-dump harness must REPORT failures, not eat them:
  * in round 5 three streaming queries threw at analysis time and
  * silently vanished from the driver's correctness report (a red query
  * indistinguishable from an undeclared one). */
class VerifySpec extends SparkSpec {

  test("a deliberately-broken query surfaces in errors.json, " +
    "healthy siblings still dump") {
    val out = tmpDir("verify_err")
    val good: (SparkSession, String) => DataFrame =
      (s, dir) => Tables(s, dir, "region")
    val bad: (SparkSession, String) => DataFrame =
      (s, _) => s.sql("SELECT unix_micros(CAST('x' AS INT))") // analysis error
    val errors = Verify.runAll(spark, sfDir, out, Seq(
      "ok_query" -> good, "broken_query" -> bad))
    assert(errors.keySet == Set("broken_query"))
    assert(errors("broken_query").nonEmpty)
    // the healthy query's parquet landed
    assert(spark.read.parquet(s"$out/ok_query").count() > 0)
    // and the dumped errors.json round-trips as JSON with the key
    Verify.writeJson(s"$out/errors.json", errors.toSeq)
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json"))
    assert(txt.contains("\"broken_query\""))
  }
}
