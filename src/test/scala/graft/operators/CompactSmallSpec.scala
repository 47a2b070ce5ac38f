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

  test("bucketed table: threshold COMPACT folds small per-bucket files " +
    "into the declared layout, carrying the large segment's files") {
    val t = tmpDir("csmb") + "/t"
    // one large bucketed segment + three tiny bucketed appends (the
    // streaming-sink shape: one small file per bucket per batch)
    Versioned.commitBucketed((1L to 50000L).map(i => (i, s"payload-$i"))
      .toDF("k", "v"), t, "k", 2)
    (1 to 3).foreach { i =>
      Versioned.commitBucketed(
        Seq((1000000L + i, s"small-$i")).toDF("k", "v"), t, "k", 2,
        "append")
    }
    val before = Versioned.versionFiles(spark, t)
    val large = before.take(2).toSet // v0's two bucket files
    spark.conf.set("spark.graft.optimize.minFileBytes", "100000")
    try spark.sql(s"OPTIMIZE '$t' COMPACT")
    finally spark.conf.unset("spark.graft.optimize.minFileBytes")
    val after = Versioned.versionFiles(spark, t).toSet
    assert(large.subsetOf(after), "large bucket files must be carried")
    assert(after.size <= large.size + 2,
      s"small files must fold to <=1 per bucket, got ${after.size}")
    // the layout contract survives: declaration + per-file placement
    assert(Versioned.bucketSpec(spark, t).contains(("k", 2)))
    val expected = Versioned.read(spark, t)
      .withColumn("b", pmod(hash($"k"), lit(2)))
      .select($"k", $"b").as[(Long, Int)].collect().toMap
    (after -- large).foreach { f =>
      val id = Versioned.bucketIdOf(f).get
      spark.read.parquet(f).select($"k").as[Long].collect()
        .foreach(k => assert(expected(k) == id))
    }
    assert(Versioned.read(spark, t).count() == 50003L)
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
