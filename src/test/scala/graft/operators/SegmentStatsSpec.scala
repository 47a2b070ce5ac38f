package graft.operators

import graft.SparkSpec
import graft.operators.SegmentStats.{ColStats, FileStats}

class SegmentStatsSpec extends SparkSpec {
  import spark.implicits._

  test("commit harvests footer min/max/nulls per file; fileStats " +
    "round-trips through the manifest") {
    val t = tmpDir("segstats") + "/t"
    Seq(
      (1L, "apple", java.sql.Date.valueOf("2024-01-05"), Some(1.5), true),
      (7L, "pear", java.sql.Date.valueOf("2024-03-01"), None, false))
      .toDF("k", "name", "d", "score", "flag")
      .coalesce(1)
      .createOrReplaceTempView("seg_src")
    Versioned.commit(spark.table("seg_src").coalesce(1), t)
    val stats = Versioned.fileStats(spark, t)
    assert(stats.size == 1)
    val fs = stats.values.head
    assert(fs.rows == 2)
    assert(fs.cols("k") == ColStats('l', Some("1"), Some("7"), Some(0)))
    assert(fs.cols("name") ==
      ColStats('s', Some("apple"), Some("pear"), Some(0)))
    // DATE is int days since epoch — catalyst's internal form
    val d0 = java.time.LocalDate.of(2024, 1, 5).toEpochDay.toString
    val d1 = java.time.LocalDate.of(2024, 3, 1).toEpochDay.toString
    assert(fs.cols("d") == ColStats('l', Some(d0), Some(d1), Some(0)))
    // doubles: bounds recorded but class 'd' (range-pruning excluded)
    assert(fs.cols("score").tag == 'd' && fs.cols("score").nulls == Some(1L))
    assert(fs.cols("flag") == ColStats('b', Some("0"), Some("1"), Some(0)))
  }

  test("append carries prior stats forward; restore re-references them; " +
    "timestamps land in catalyst micros") {
    val t = tmpDir("segstats") + "/t"
    def seg(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i, java.sql.Timestamp.valueOf(f"2024-06-0$i%d 00:00:00")))
      .toDF("k", "ts").coalesce(1)
    Versioned.commit(seg(1, 3), t)                    // v0
    Versioned.commit(seg(4, 6), t, "append")          // v1
    val stats = Versioned.fileStats(spark, t, Some(1L))
    assert(stats.size == 2)
    val ks = stats.values.map(f => (f.cols("k").min.get, f.cols("k").max.get))
    assert(ks.toSet == Set(("1", "3"), ("4", "6")))
    // micros since epoch, UTC session: 2024-06-01T00:00:00Z
    val micros0 = java.time.Instant.parse("2024-06-01T00:00:00Z")
      .getEpochSecond * 1000000L
    assert(stats.values.map(_.cols("ts").min.get).min == micros0.toString)
    Versioned.commit(seg(7, 9), t)                    // v2 overwrite
    Versioned.restore(spark, t, 1L)                   // v3 = v1's lines
    assert(Versioned.fileStats(spark, t, Some(3L)).size == 2)
  }

  test("nested columns record as unprunable 'x'; a column absent from " +
    "a file's schema is absent from its stats (schema evolution)") {
    val t = tmpDir("segstats") + "/t"
    Versioned.commit(
      Seq((1, Seq(0.1f, 0.2f))).toDF("k", "emb").coalesce(1), t)
    Versioned.commit(
      Seq((2, Seq(0.3f), "added")).toDF("k", "emb", "extra").coalesce(1),
      t, "append")
    val stats = Versioned.fileStats(spark, t)
    val (old, neu) = stats.values.partition(!_.cols.contains("extra"))
    assert(old.size == 1 && neu.size == 1)
    assert(old.head.cols("emb").tag == 'x')
    assert(neu.head.cols("extra") ==
      ColStats('s', Some("added"), Some("added"), Some(0)))
  }

  test("maxCandidateFiles restricts a max(col) read to the arg-max " +
    "file, keeps stats-less files, excludes provably-irrelevant ones") {
    val t = tmpDir("maxcand") + "/t"
    def seg(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i.toLong, java.sql.Timestamp.valueOf(f"2024-06-$i%02d 00:00:00")))
      .toDF("k", "ts").coalesce(1)
    Versioned.commit(seg(1, 3), t)
    Versioned.commit(seg(7, 9), t, "append") // holds the max
    Versioned.commit(seg(4, 6), t, "append")
    val cand = Versioned.maxCandidateFiles(spark, t, "ts")
    assert(cand.isDefined && cand.get.size == 1)
    // the candidate really contains the global max
    val m = spark.read.parquet(cand.get.head)
      .agg(org.apache.spark.sql.functions.max($"ts")).head.getTimestamp(0)
    assert(m == java.sql.Timestamp.valueOf("2024-06-09 00:00:00"))
    // a column absent everywhere -> no candidates -> None (fallback)
    assert(Versioned.maxCandidateFiles(spark, t, "nope").isEmpty)
    // strip the 1-3 segment's stats suffix: that file becomes
    // unprunable and joins the candidate set alongside the arg-max
    val root = new org.apache.hadoop.fs.Path(t)
    val conf = spark.sparkContext.hadoopConfiguration
    val hfs = root.getFileSystem(conf)
    // the 1-3 segment's line lives in the CHECKPOINT manifest (0);
    // the append manifests are deltas carrying only their own adds
    val mf = new org.apache.hadoop.fs.Path(root, "_graft_log/0.manifest")
    val in = hfs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val doctored = lines.map { l =>
      if (!l.startsWith("#") && l.contains("k:l:v1:v3:"))
        l.split('\t').head // the 1-3 segment loses its stats
      else l
    }
    assert(doctored != lines, "expected to find the 1-3 segment line")
    val out = hfs.create(mf, true)
    try out.write(doctored.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    Versioned.clearManifestCache() // out-of-band manifest edit
    val cand2 = Versioned.maxCandidateFiles(spark, t, "ts")
    assert(cand2.isDefined && cand2.get.size == 2)
    val m2 = spark.read.parquet(cand2.get: _*)
      .agg(org.apache.spark.sql.functions.max($"ts")).head.getTimestamp(0)
    assert(m2 == java.sql.Timestamp.valueOf("2024-06-09 00:00:00"))
  }

  test("many-file commit: executor-side harvest matches the serial " +
    "path exactly and wall-time stays sublinear in file count") {
    val dir = tmpDir("parharvest")
    val conf = spark.sparkContext.hadoopConfiguration
    def writeFiles(sub: String, n: Int): Seq[String] = {
      (1 to n * 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartition(n).write.parquet(s"$dir/$sub")
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      p.getFileSystem(conf).listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    }
    val big = writeFiles("big", 64) // > ExecutorHarvestThreshold
    assert(big.size == 64)
    val viaJob = SegmentStats.collect(spark, big)
    val serial = SegmentStats.collect(conf, big)
    assert(viaJob == serial, "distributed harvest diverged from serial")
    assert(viaJob.size == 64)

    val small = writeFiles("small", 8) // <= threshold: driver pool
    val viaPool = SegmentStats.collect(spark, small)
    assert(viaPool == SegmentStats.collect(conf, small))

    // the scale claim: at many files the job-path harvest must beat
    // the serial driver loop outright (locally ~4x on 4 cores; on an
    // object store the gap is the difference between seconds and
    // minutes). Warm both paths once, compare best-of-2 — the margin
    // (1.5x) is far inside the measured gap, so host noise can't flip
    // the verdict while a silent fallback to serial reads would.
    val bigger = writeFiles("bigger", 256)
    def time(body: => Unit): Long = {
      val t0 = System.nanoTime(); body; System.nanoTime() - t0
    }
    val tSerial = (1 to 2).map(_ =>
      time(SegmentStats.collect(conf, bigger))).min
    val tJob = (1 to 2).map(_ =>
      time(SegmentStats.collect(spark, bigger))).min
    assert(tJob * 3 < tSerial * 2,
      f"256-file harvest: job ${tJob / 1e6}%.0f ms vs serial " +
        f"${tSerial / 1e6}%.0f ms — executor path not pulling ahead")
  }

  test("serialize/parse round-trips hostile names and values; malformed " +
    "suffixes and stats-less manifest lines degrade to no stats") {
    val fs = FileStats(5, Map(
      "weird col\tname" -> ColStats('s', Some(""), Some("a:b\tc%"), None),
      "n" -> ColStats('l', None, Some("-4"), Some(5))))
    assert(SegmentStats.parse(SegmentStats.serialize(fs)).contains(fs))
    assert(SegmentStats.parse("garbage").isEmpty)
    assert(SegmentStats.parse("rows=notanumber").isEmpty)

    // a manifest whose file lines carry no stats suffix (pre-stats
    // format) still reads fine and reports no stats
    val t = tmpDir("segstats") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v").coalesce(1), t)
    val root = new org.apache.hadoop.fs.Path(t)
    val conf = spark.sparkContext.hadoopConfiguration
    val hfs = root.getFileSystem(conf)
    val mf = new org.apache.hadoop.fs.Path(root, "_graft_log/0.manifest")
    val in = hfs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val stripped = lines.map(_.split('\t').head).mkString("\n")
    val out = hfs.create(mf, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    Versioned.clearManifestCache() // out-of-band manifest edit
    assert(Versioned.fileStats(spark, t).isEmpty)
    assert(Versioned.read(spark, t).count() == 1)
  }
}
