package graft.plans

import graft.SparkSpec
import graft.operators.Versioned
import org.apache.spark.sql.functions._

/** Catalog-table UPDATE/DELETE on snapshot tables (`UPDATE graft.ns.t
  * SET …`, `DELETE FROM graft.ns.t WHERE <any condition>`): lowered at
  * analysis onto the shared SnapshotDml core — stats-scoped
  * copy-on-write, DV routing under the confs, arbitrary (non-pushable)
  * conditions included. */
class SnapshotDmlV2Spec extends SparkSpec {
  import spark.implicits._

  private def mkCatalog(): (String, String) = {
    val base = tmpDir("dmlv2")
    val cat = "dml" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    (cat, s"$base/lake/t")
  }

  test("UPDATE on a catalog snapshot table: simultaneous SET, scoped " +
    "rewrite carries untouched segments, history preserved") {
    val (cat, t) = mkCatalog()
    // two segments with disjoint k ranges -> stats-scopable
    Versioned.commit((1L to 10L).map(i => (i, i * 1.0)).toDF("k", "v"), t)
    Versioned.commit((100L to 110L).map(i => (i, i * 1.0)).toDF("k", "v"),
      t, "append")
    val before = Versioned.versionFiles(spark, t).toSet
    val n = spark.sql(s"UPDATE $cat.lake.t SET v = v + k WHERE k >= 100")
      .as[Long].head()
    assert(n == 11L)
    // the low-range segment is carried verbatim (stats-scoped COW)
    val after = Versioned.versionFiles(spark, t).toSet
    assert((before intersect after).nonEmpty,
      "segments provably free of matches must be carried")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.lake.t WHERE k >= 100")
      .as[Double].head() == (100L to 110L).map(i => i * 2.0).sum)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.lake.t WHERE k < 100")
      .as[Double].head() == (1L to 10L).map(_.toDouble).sum)
    // pre-update state time-travelable
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.lake.t VERSION AS OF 1 WHERE k >= 100")
      .as[Double].head() == (100L to 110L).map(_.toDouble).sum)
  }

  test("DELETE on a catalog snapshot table with a NON-pushable " +
    "condition (modulo) — beyond the SupportsDelete filter surface") {
    val (cat, t) = mkCatalog()
    Versioned.commit((1L to 10L).map(i => (i, s"r$i")).toDF("k", "v"), t)
    val n = spark.sql(s"DELETE FROM $cat.lake.t WHERE k % 2 = 0")
      .as[Long].head()
    assert(n == 5L)
    assert(spark.sql(s"SELECT k FROM $cat.lake.t").as[Long]
      .collect().toSet == Set(1L, 3L, 5L, 7L, 9L))
  }

  test("catalog DML routes through deletion vectors under the confs") {
    val (cat, t) = mkCatalog()
    Versioned.commit((1L to 10L).map(i => (i, i * 1.0)).toDF("k", "v")
      .coalesce(1), t)
    val files = Versioned.versionFiles(spark, t).toSet
    spark.conf.set("spark.graft.delete.mode", "dv")
    spark.conf.set("spark.graft.update.mode", "dv")
    try {
      assert(spark.sql(s"DELETE FROM $cat.lake.t WHERE k = 3")
        .as[Long].head() == 1L)
      assert(Versioned.versionFiles(spark, t).toSet == files,
        "dv delete must not rewrite segments")
      assert(spark.sql(s"UPDATE $cat.lake.t SET v = 0.0 WHERE k = 5")
        .as[Long].head() == 1L)
      assert(files.subsetOf(Versioned.versionFiles(spark, t).toSet),
        "dv update appends post-images without rewriting")
    } finally {
      spark.conf.unset("spark.graft.delete.mode")
      spark.conf.unset("spark.graft.update.mode")
    }
    assert(spark.sql(s"SELECT k, v FROM $cat.lake.t")
      .as[(Long, Double)].collect().toSet ==
      ((1L to 10L).toSet - 3L - 5L).map(i => (i, i * 1.0)) + ((5L, 0.0)))
  }
}
