package graft.sources

import graft.SparkSpec
import graft.operators.{BloomIndex, Versioned}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** Bloom-filter point-lookup skipping: per-file bloom sidecars prune
  * equality/IN scans on high-cardinality UNORDERED keys — exactly
  * where manifest min/max buys nothing because every segment's range
  * spans the whole key space. Semantics are false-positive-only: a
  * bloom miss proves absence (file skipped), everything else keeps
  * the file, so results are always exact. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec =>
        (b.scan match {
          case r: RuntimeSkippingScan => r.delegateScan
          case s => s
        }).asInstanceOf[ParquetScan].fileIndex.inputFiles.length
    }.getOrElse(fail("no BatchScanExec in plan"))

  // keys interleave across segments on purpose: every segment's
  // [min, max] covers every probe, so min/max pruning keeps ALL files
  private def seg(i: Int) = (0 until 100).map { k =>
    (f"u$k%03d-$i", (k.toLong * 10) + i, k) }.toDF("u", "id", "x")
    .coalesce(1)

  test("uuid-style equality opens 1 of N segments where min/max keeps " +
    "all N; IN-lists and integral keys prune too; absent keys read " +
    "zero rows without a full scan") {
    val rootDir = tmpDir("bloom")
    val t = s"$rootDir/lake/bt"
    Versioned.commit(seg(0), t)
    (1 to 3).foreach(i => Versioned.commit(seg(i), t, "append"))
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gb", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gb.root", rootDir)
    // BEFORE the index: min/max is powerless on interleaved keys
    val pre = c.sql("SELECT id FROM gb.lake.bt WHERE u = 'u050-2'")
    assert(pre.collect().map(_.getLong(0)).toList == List(502L))
    assert(scannedFiles(pre) == 4,
      "without blooms every overlapping segment must be kept")

    Versioned.declareBloomIndex(spark, t, Seq("u", "id"))
    val post = c.sql("SELECT id FROM gb.lake.bt WHERE u = 'u050-2'")
    assert(post.collect().map(_.getLong(0)).toList == List(502L))
    assert(scannedFiles(post) <= 1 + 1, // 1 true + fpp-bounded slack
      "the backfilled bloom must skip the segments that cannot hold u050-2")

    // integral key equality
    val byId = c.sql("SELECT u FROM gb.lake.bt WHERE id = 173")
    assert(byId.collect().map(_.getString(0)).toList == List("u017-3"))
    assert(scannedFiles(byId) <= 2)

    // IN-list keeps exactly the union of hit files
    val byIn = c.sql(
      "SELECT id FROM gb.lake.bt WHERE u IN ('u001-0', 'u099-3')")
    assert(byIn.collect().map(_.getLong(0)).toSet == Set(10L, 993L))
    assert(scannedFiles(byIn) <= 3)

    // absent key: every file provably misses -> near-empty scan
    val miss = c.sql("SELECT * FROM gb.lake.bt WHERE u = 'nope'")
    assert(miss.count() == 0 && scannedFiles(miss) <= 1)

    // conjunction with a range: bloom and min/max prune independently
    val mixed = c.sql(
      "SELECT id FROM gb.lake.bt WHERE u = 'u050-2' AND x >= 0")
    assert(mixed.collect().map(_.getLong(0)).toList == List(502L))
  }

  test("appends after the declaration harvest their own blooms; the " +
    "lifecycle keeps refs through OPTIMIZE and vacuum sweeps " +
    "unreferenced sidecars") {
    val rootDir = tmpDir("bloomlife")
    val t = s"$rootDir/lake/bt"
    Versioned.commit(seg(0), t)
    Versioned.commit(seg(1), t, "append")
    Versioned.declareBloomIndex(spark, t, Seq("u"))
    // a fresh append must index itself (declaration inherited)
    Versioned.commit(seg(2), t, "append")
    val refs = Versioned.bloomRefs(spark, t)
    assert(refs.size == 3, s"all three files must carry refs: $refs")
    assert(refs.values.map(_._2).toSet.size == 2,
      "backfill sidecar + the append's own sidecar")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gl", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gl.root", rootDir)
    val q = c.sql("SELECT id FROM gl.lake.bt WHERE u = 'u007-2'")
    assert(q.collect().map(_.getLong(0)).toList == List(72L))
    assert(scannedFiles(q) <= 2)
    // OPTIMIZE rewrites small files into one — the fresh output gets
    // its own bloom (declaration rides the optimize commit)
    Versioned.compactSmall(spark, t, 1L << 20)
    val refsAfter = Versioned.bloomRefs(spark, t)
    assert(refsAfter.nonEmpty,
      "compacted output must be bloom-indexed via the inherited declaration")
    val q2 = c.sql("SELECT id FROM gl.lake.bt WHERE u = 'u007-1'")
    assert(q2.collect().map(_.getLong(0)).toList == List(71L))
    // vacuum: pre-compaction sidecars are unreferenced -> swept;
    // the live one survives and still answers
    Versioned.vacuum(spark, t, keepLast = 1)
    val bloomDirs = new java.io.File(s"$t/bloom").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val live = Versioned.bloomRefs(spark, t).values
      .map(_._2.stripPrefix("bloom/")).toSet
    assert(bloomDirs == live,
      s"vacuum must sweep exactly the unreferenced sidecars: " +
        s"disk=$bloomDirs live=$live")
    BloomIndex.invalidateCache()
    val q3 = c.sql("SELECT id FROM gl.lake.bt WHERE u = 'u007-0'")
    assert(q3.collect().map(_.getLong(0)).toList == List(70L))
  }

  test("DML stats-scoping consults blooms: an equality DELETE rewrites " +
    "only the file that may hold the key (min/max alone keeps all), " +
    "and a DV delete sidecars only that file") {
    val t = tmpDir("bloomdml") + "/t"
    Versioned.commit(seg(0), t)
    (1 to 3).foreach(i => Versioned.commit(seg(i), t, "append"))
    Versioned.declareBloomIndex(spark, t, Seq("u"))
    val v0 = Versioned.versions(spark, t).last
    spark.sql(s"DELETE FROM '$t' WHERE u = 'u010-1'")
    val v1 = Versioned.versions(spark, t).last
    val (_, removed) = Versioned.changedFiles(spark, t, v0, v1)
    assert(removed.size <= 2, // 1 true hit + fpp-bounded slack
      s"a bloom-scoped COW delete must rewrite ~1 of 4 files: $removed")
    assert(Versioned.read(spark, t).count() == 399)
    // DV route: the sidecar must tag only the bloom-hit file(s)
    spark.conf.set("spark.graft.delete.mode", "dv")
    try spark.sql(s"DELETE FROM '$t' WHERE u = 'u011-2'")
    finally spark.conf.unset("spark.graft.delete.mode")
    assert(Versioned.read(spark, t).count() == 398)
    assert(Versioned.dvDeletedCounts(spark, t).size <= 2,
      "the DV sidecar must be scoped to the bloom-hit files")
  }

  test("chunked backfill: a declaration over many files lands one " +
    "sidecar PER CHUNK, every file carries a ref, and consult prunes " +
    "across sidecars exactly as with one") {
    val rootDir = tmpDir("bloomchunk")
    val t = s"$rootDir/lake/bt"
    Versioned.commit(seg(0), t)
    (1 to 3).foreach(i => Versioned.commit(seg(i), t, "append"))
    // chunk size 2 over 4 files -> exactly two backfill sidecars
    Versioned.declareBloomIndex(spark, t, Seq("u"),
      backfillChunkFiles = 2)
    val refs = Versioned.bloomRefs(spark, t)
    assert(refs.size == 4, s"every file must carry a ref: $refs")
    assert(refs.values.map(_._2).toSet.size == 2,
      s"2-file chunks over 4 files must land 2 sidecars: $refs")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gc", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gc.root", rootDir)
    val q = c.sql("SELECT id FROM gc.lake.bt WHERE u = 'u050-2'")
    assert(q.collect().map(_.getLong(0)).toList == List(502L))
    assert(scannedFiles(q) <= 2,
      "pruning must work across chunked sidecars")
    val miss = c.sql("SELECT * FROM gc.lake.bt WHERE u = 'nope'")
    assert(miss.count() == 0 && scannedFiles(miss) <= 1)
  }

  test("declaration guards: unknown column, un-indexable type, mapped " +
    "table; and meta round-trips") {
    val t = tmpDir("bloomguard") + "/t"
    Versioned.commit((1 to 5).map(i => (i.toLong, i * 1.0, s"s$i"))
      .toDF("k", "d", "s").coalesce(1), t)
    intercept[IllegalArgumentException] {
      Versioned.declareBloomIndex(spark, t, Seq("ghost")) }
    intercept[IllegalArgumentException] {
      Versioned.declareBloomIndex(spark, t, Seq("d")) } // double
    Versioned.renameColumn(spark, t, "s", "label")
    intercept[IllegalArgumentException] {
      Versioned.declareBloomIndex(spark, t, Seq("k")) } // mapped
    assert(BloomIndex.declared(Map("bloomcols" -> "0.03:a,b"))
      .contains((Seq("a", "b"), 0.03)))
    assert(BloomIndex.declared(Map("bloomcols" -> "garbage")).isEmpty)
    assert(BloomIndex.declared(Map.empty).isEmpty)
  }
}
