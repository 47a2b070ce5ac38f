package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Deletion-vector (merge-on-read) DELETE: a delete commits a row-index
  * sidecar + manifest refs instead of rewriting segments — the
  * write-amplification fix that makes a one-row delete on a 100 TB
  * table cheap. Reads skip DV rows; OPTIMIZE folds vectors into
  * physical files; COW DML and the row-level change feed stay exact
  * on DV-bearing versions. */
class DvSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkTable(prefix: String): String = {
    val t = tmpDir(prefix) + "/t"
    Versioned.commit((1 to 10).map(i => (i, s"r$i")).toDF("k", "v")
      .coalesce(1), t) // ONE segment: any COW delete would rewrite it all
    t
  }

  private def dataFiles(t: String) =
    Versioned.versionFiles(spark, t).toSet

  test("a one-row DELETE commits WITHOUT rewriting its segment: same " +
    "data files, a dv= manifest ref, the row gone from reads") {
    val t = mkTable("dv")
    val before = dataFiles(t)
    val n = Versioned.deleteWithDv(spark, t, _ => true, col("k") === 3)
    assert(n == 1L)
    assert(dataFiles(t) == before, "data files must be untouched")
    assert(Versioned.dvDeletedCounts(spark, t).values.sum == 1L)
    assert(Versioned.read(spark, t).select($"k").as[Int].collect().toSet ==
      (1 to 10).toSet - 3)
    // time travel: the pre-delete version still has the row
    assert(Versioned.read(spark, t, Some(0)).count() == 10)
    // zero matches commits nothing
    val vs = Versioned.versions(spark, t)
    assert(Versioned.deleteWithDv(spark, t, _ => true, col("k") === 999) == 0L)
    assert(Versioned.versions(spark, t) == vs)
  }

  test("stacked deletes append refs; already-deleted rows never " +
    "re-match") {
    val t = mkTable("dv")
    assert(Versioned.deleteWithDv(spark, t, _ => true, col("k") <= 3) == 3L)
    // overlaps the first delete: only k=4,5 are NEW matches
    assert(Versioned.deleteWithDv(spark, t, _ => true, col("k") <= 5) == 2L)
    assert(Versioned.dvDeletedCounts(spark, t).values.sum == 5L)
    assert(Versioned.read(spark, t).select($"k").as[Int].collect().toSet ==
      (6 to 10).toSet)
  }

  test("COW UPDATE on a DV-bearing table: deleted rows are invisible " +
    "to the transform and the rewritten file drops its refs") {
    val t = mkTable("dv")
    Versioned.deleteWithDv(spark, t, _ => true, col("k") === 1)
    // an unconditioned UPDATE must not resurrect k=1
    spark.sql(s"UPDATE '$t' SET v = concat(v, '!')")
    assert(Versioned.read(spark, t).select($"k", $"v")
      .as[(Int, String)].collect().toSet ==
      (2 to 10).map(i => (i, s"r$i!")).toSet)
    // the rewrite replaced the segment: refs gone
    assert(Versioned.dvDeletedCounts(spark, t).isEmpty)
  }

  test("OPTIMIZE folds the vectors away: physical files exclude the " +
    "rows, no dv refs remain, bucket layout survives") {
    val t = mkTable("dv")
    Versioned.deleteWithDv(spark, t, _ => true, col("k") % 2 === 0)
    spark.sql(s"OPTIMIZE '$t' COMPACT")
    assert(Versioned.dvDeletedCounts(spark, t).isEmpty)
    assert(Versioned.read(spark, t).select($"k").as[Int].collect().toSet ==
      Set(1, 3, 5, 7, 9))
    // raw file content (no DV overlay) proves the PHYSICAL fold
    val raw = spark.read.parquet(Versioned.versionFiles(spark, t): _*)
    assert(raw.count() == 5)
    // bucketed table: DV delete + OPTIMIZE keep the declared layout
    val tb = tmpDir("dvb") + "/t"
    Versioned.commitBucketed((1L to 20L).map(k => (k, s"x$k"))
      .toDF("k", "v"), tb, "k", 4)
    assert(Versioned.deleteWithDv(spark, tb, _ => true, col("k") === 7L) == 1L)
    assert(Versioned.bucketSpec(spark, tb).contains(("k", 4)),
      "the DV commit must carry the bucket declaration")
    spark.sql(s"OPTIMIZE '$tb' COMPACT")
    assert(Versioned.bucketSpec(spark, tb).contains(("k", 4)))
    assert(Versioned.read(spark, tb).count() == 19)
  }

  test("SQL DELETE routes through deletion vectors under " +
    "spark.graft.delete.mode=dv") {
    val t = mkTable("dv")
    val before = dataFiles(t)
    spark.conf.set("spark.graft.delete.mode", "dv")
    try {
      val n = spark.sql(s"DELETE FROM '$t' WHERE k = 4")
        .collect().head.getLong(0)
      assert(n == 1L)
      assert(dataFiles(t) == before, "dv mode must not rewrite segments")
      assert(Versioned.read(spark, t).count() == 9)
    } finally spark.conf.unset("spark.graft.delete.mode")
    // default mode still copy-on-write: files change
    spark.sql(s"DELETE FROM '$t' WHERE k = 5")
    assert(dataFiles(t) != before)
    assert(Versioned.read(spark, t).count() == 8)
  }

  test("rowChanges surfaces DV deletes as delete rows; earlier DV " +
    "deletions never resurface in later commits' images") {
    val t = mkTable("dv")
    Versioned.deleteWithDv(spark, t, _ => true, col("k") === 2) // v1
    // v2: COW update of k=5 — preimage must NOT include the k=2 row
    spark.sql(s"UPDATE '$t' SET v = 'V' WHERE k = 5")
    val changed = Versioned.rowChanges(spark, t, 0, 2)
      .select($"k", $"v", $"_change_type", $"_commit_version")
      .as[(Int, String, String, Long)].collect().toSet
    assert(changed == Set(
      (2, "r2", "delete", 1L),
      (5, "r5", "update_preimage", 2L),
      (5, "V", "update_postimage", 2L)))
  }

  test("catalog reads of a DV-bearing version fall back to the DV-aware " +
    "relation; DESCRIBE DETAIL keeps an exact metadata row count") {
    val base = tmpDir("dvcat")
    val cat = "dvcat" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    val t = s"$base/lake/t"
    Versioned.commit((1 to 10).map(i => (i, s"r$i")).toDF("k", "v")
      .coalesce(1), t)
    Versioned.deleteWithDv(spark, t, _ => true, col("k") <= 4)
    assert(spark.sql(s"SELECT k FROM $cat.lake.t WHERE k < 8")
      .as[Int].collect().toSet == Set(5, 6, 7))
    // time travel to the pre-delete version keeps the fast path + rows
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.lake.t VERSION AS OF 0")
      .as[Long].head() == 10L)
    val detail = spark.sql(s"DESCRIBE DETAIL '$t'").collect().head
    assert(detail.getAs[Long]("n_rows") == 6L)
  }

  test("merge-on-read UPDATE: matched rows DV-deleted + post-images " +
    "appended in one commit — no segment rewrite, exact reads") {
    val t = mkTable("dvu")
    val before = dataFiles(t)
    val n = Versioned.updateWithDv(spark, t, _ => true, col("k") <= 2,
      m => m.withColumn("v", concat(col("v"), lit("!"))))
    assert(n == 2L)
    // old segment untouched, ONE appended post-image segment
    val after = dataFiles(t)
    assert(before.subsetOf(after), "old files must survive")
    assert((after -- before).nonEmpty, "post-images must be appended")
    assert(Versioned.read(spark, t).select($"k", $"v")
      .as[(Int, String)].collect().toSet ==
      ((1 to 2).map(i => (i, s"r$i!")) ++
        (3 to 10).map(i => (i, s"r$i"))).toSet)
    // CDF classifies it as an update, not delete+insert
    val changed = Versioned.rowChanges(spark, t, 0, 1)
      .select($"k", $"v", $"_change_type")
      .as[(Int, String, String)].collect().toSet
    assert(changed == Set(
      (1, "r1", "update_preimage"), (2, "r2", "update_preimage"),
      (1, "r1!", "update_postimage"), (2, "r2!", "update_postimage")))
    // fold restores physical files
    spark.sql(s"OPTIMIZE '$t' COMPACT")
    assert(Versioned.dvDeletedCounts(spark, t).isEmpty)
    assert(Versioned.read(spark, t).count() == 10)
  }

  test("SQL UPDATE routes through DVs under spark.graft.update.mode=dv; " +
    "a bucket-column DV update re-routes post-images to their bucket") {
    val t = mkTable("dvu")
    val before = dataFiles(t)
    spark.conf.set("spark.graft.update.mode", "dv")
    try {
      val n = spark.sql(s"UPDATE '$t' SET v = upper(v) WHERE k = 9")
        .collect().head.getLong(0)
      assert(n == 1L)
      assert(before.subsetOf(dataFiles(t)))
      assert(Versioned.read(spark, t).where($"k" === 9)
        .select($"v").as[String].head() == "R9")
    } finally spark.conf.unset("spark.graft.update.mode")
    // bucketed: updating the BUCKET COLUMN must land the post-image
    // in its new correct bucket, keeping the layout contract
    val tb = tmpDir("dvub") + "/t"
    Versioned.commitBucketed((1L to 20L).map(k => (k, s"x$k"))
      .toDF("k", "v"), tb, "k", 4)
    val n2 = Versioned.updateWithDv(spark, tb, _ => true, col("k") === 3L,
      m => m.withColumn("k", lit(103L)))
    assert(n2 == 1L)
    assert(Versioned.bucketSpec(spark, tb).contains(("k", 4)),
      "layout must survive a DV update")
    assert(Versioned.read(spark, tb).select($"k").as[Long]
      .collect().toSet == ((1L to 20L).toSet - 3L) + 103L)
    // placement: every file's rows hash to its declared bucket id
    val expected = Versioned.read(spark, tb)
      .withColumn("b", pmod(hash($"k"), lit(4)))
      .select($"k", $"b").as[(Long, Int)].collect().toMap
    Versioned.versionFiles(spark, tb).foreach { f =>
      val id = Versioned.bucketIdOf(f).get
      spark.read.parquet(f).select($"k").as[Long].collect()
        .foreach(k => if (expected.contains(k)) assert(expected(k) == id))
    }
  }

  test("a commit landing mid-DV-delete REBASES when the tagged file is " +
    "untouched (append), recomputes when the same file was rewritten") {
    // append-only interleave: the sidecar's row indexes still describe
    // the exact bytes on disk -> rebase, one sidecar compute
    val t = mkTable("dvrace")
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Versioned.dvTestHook = () => {
      computes.incrementAndGet()
      if (fired.compareAndSet(false, true))
        Versioned.commit(Seq((777, "x")).toDF("k", "v"), t, "append")
    }
    try {
      assert(Versioned.deleteWithDv(spark, t, _ => true, col("k") === 3) == 1L)
      assert(computes.get() == 1,
        "an append-only conflict must rebase, not recompute the sidecar")
      assert(Versioned.read(spark, t).select($"k").as[Int]
        .collect().toSet == (1 to 10).toSet - 3 + 777,
        "neither the delete nor the interleaved append may be lost")
    } finally Versioned.dvTestHook = () => ()
    // conflicting interleave: a COW rewrite of the SAME file changes
    // its line -> the stale row indexes must NOT be committed
    val t2 = mkTable("dvrace")
    val computes2 = new java.util.concurrent.atomic.AtomicInteger(0)
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    Versioned.dvTestHook = () => {
      computes2.incrementAndGet()
      if (fired2.compareAndSet(false, true))
        Versioned.rewrite(spark, t2, _ => true, col("k") === 9,
          df => df.where(col("k") =!= 9), Map("operation" -> "delete"))
    }
    try {
      assert(Versioned.deleteWithDv(spark, t2, _ => true, col("k") === 4) == 1L)
      assert(computes2.get() == 2,
        "a tagged-file conflict must recompute the sidecar")
      assert(Versioned.read(spark, t2).select($"k").as[Int]
        .collect().toSet == (1 to 10).toSet - 4 - 9,
        "both deletes must land exactly")
    } finally Versioned.dvTestHook = () => ()
  }

  test("write-skew guard: an interleaved append whose rows MATCH the " +
    "DML predicate forces a recompute — appended matches cannot escape") {
    val t = mkTable("dvskew")
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Versioned.dvTestHook = () => {
      computes.incrementAndGet()
      if (fired.compareAndSet(false, true))
        Versioned.commit(Seq((3, "late")).toDF("k", "v"), t, "append")
    }
    try {
      // the recompute must see BOTH the original k=3 and the late copy
      assert(Versioned.deleteWithDv(spark, t, _ => true, col("k") === 3) == 2L)
      assert(computes.get() == 2,
        "a predicate-matching append must force a sidecar recompute — " +
          "a rebase would carry the late row past the delete")
      assert(Versioned.read(spark, t).select($"k").as[Int]
        .collect().toSet == (1 to 10).toSet - 3)
    } finally Versioned.dvTestHook = () => ()
  }

  test("relative table path: the DV overlay still matches executor " +
    "file paths (driver-side join keys are qualified)") {
    val rel = s"target/dvrel-${java.util.UUID.randomUUID()}/t"
    try {
      Versioned.commit((1 to 10).map(i => (i, s"r$i")).toDF("k", "v")
        .coalesce(1), rel)
      assert(Versioned.deleteWithDv(spark, rel, _ => true,
        col("k") === 3) == 1L, "a relative root must still match rows")
      assert(Versioned.read(spark, rel).select($"k").as[Int]
        .collect().toSet == (1 to 10).toSet - 3,
        "the overlay must actually filter the deleted row")
    } finally fsOf(rel).delete(new Path(rel).getParent, true)
  }

  test("vacuum sweeps dv sidecars no surviving manifest references; " +
    "maxCandidateFiles refuses to trust bounds under DVs") {
    val t = mkTable("dv")
    Versioned.deleteWithDv(spark, t, _ => true, col("k") === 10)
    assert(Versioned.maxCandidateFiles(spark, t, "k").isEmpty,
      "the file max may be a deleted row — stats must not claim it")
    // fold, then vacuum history: the sidecar becomes unreachable
    spark.sql(s"OPTIMIZE '$t' COMPACT")
    val fs = fsOf(t)
    assert(fs.listStatus(new Path(s"$t/dv")).nonEmpty)
    Versioned.vacuum(spark, t, keepLast = 1)
    assert(!fs.exists(new Path(s"$t/dv")) ||
      fs.listStatus(new Path(s"$t/dv")).isEmpty,
      "orphaned dv dirs must be swept")
    assert(Versioned.read(spark, t).count() == 9)
  }
}
