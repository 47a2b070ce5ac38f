package graft

/** The registered functions are callable from plain SQL. (The
  * spark.sql.extensions config path only applies at session
  * construction — in the shared test JVM we register on the live
  * session via GraftExtensions.register, which exercises the same
  * builders the extension injects.) */
class GraftExtensionsSpec extends SparkSpec {

  test("cosine_similarity callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS s")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("minhashes callable from SQL, k minima, deterministic") {
    GraftExtensions.register(spark)
    val q = "SELECT minhashes(array(1L, 2L, 3L), 8) AS mh"
    val r = spark.sql(q).head().getSeq[Long](0)
    val r2 = spark.sql(q).head().getSeq[Long](0)
    assert(r.size == 8)
    assert(r == r2)
  }
}
