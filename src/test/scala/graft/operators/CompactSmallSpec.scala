package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Size-thresholded partial compaction: OPTIMIZE under
  * `spark.graft.optimize.minFileBytes` folds only the small files —
  * large segments are carried on their manifest lines without being
  * opened, so the cost tracks the small-file bytes, never the
  * table. */
class CompactSmallSpec extends SparkSpec {
  import spark.implicits._

  test("COMPACT under the threshold conf bin-packs small files and " +
    "carries large ones verbatim (stats and dv refs included)") {
    val t = tmpDir("csm") + "/t"
    // one large segment (~hundreds of KB) + three tiny ones
    Versioned.commit((1L to 50000L).map(i => (i, s"payload-$i"))
      .toDF("k", "v").coalesce(1), t)
    (1 to 3).foreach { i =>
      Versioned.commit(Seq((1000000L + i, s"small-$i")).toDF("k", "v"),
        t, "append")
    }
    val before = Versioned.versionFiles(spark, t)
    assert(before.size == 4)
    val large = before.head // v0's single segment file
    // DV-delete one row inside a SMALL file: compaction must fold it
    assert(Versioned.deleteWithDv(spark, t, _ => true,
      col("k") === 1000001L) == 1L)
    spark.conf.set("spark.graft.optimize.minFileBytes", "100000")
    try {
      val r = spark.sql(s"OPTIMIZE '$t' COMPACT").collect().head
      assert(r.getLong(1) == 4L && r.getLong(2) == 2L,
        s"expected 4 -> 2 files, got $r")
    } finally spark.conf.unset("spark.graft.optimize.minFileBytes")
    val after = Versioned.versionFiles(spark, t)
    assert(after.contains(large), "the large segment must be carried")
    assert(after.size == 2)
    assert(Versioned.dvDeletedCounts(spark, t).isEmpty,
      "compacting a DV-bearing small file must fold its vector")
    assert(Versioned.read(spark, t).count() == 50000L + 2)
    // carried line keeps its stats: metadata row count stays exact
    val detail = spark.sql(s"DESCRIBE DETAIL '$t'").collect().head
    assert(detail.getAs[Long]("n_rows") == 50000L + 2)
    assert(Versioned.readMeta(spark, t,
      Versioned.versions(spark, t).last)("operation") == "optimize")
  }

  test("nothing under the threshold is a metadata no-op; without the " +
    "conf COMPACT keeps whole-rewrite semantics") {
    val t = tmpDir("csm") + "/t"
    Versioned.commit((1L to 50000L).map(i => (i, s"p$i")).toDF("k", "v")
      .coalesce(1), t)
    Versioned.commit((100001L to 150000L).map(i => (i, s"p$i"))
      .toDF("k", "v").coalesce(1), t, "append")
    val vs = Versioned.versions(spark, t)
    spark.conf.set("spark.graft.optimize.minFileBytes", "10000")
    try {
      val r = spark.sql(s"OPTIMIZE '$t' COMPACT").collect().head
      assert(r.getLong(1) == r.getLong(2), "no files under threshold")
      assert(Versioned.versions(spark, t) == vs, "no new version")
    } finally spark.conf.unset("spark.graft.optimize.minFileBytes")
    // conf unset: classic whole-table compaction to one file
    spark.sql(s"OPTIMIZE '$t' COMPACT")
    assert(Versioned.versionFiles(spark, t).size == 1)
    assert(Versioned.read(spark, t).count() == 100000L)
  }
}
