package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** The incremental manifest log: commits store DELTA ACTIONS
  * (`A`/`R` lines) with a full-snapshot checkpoint every
  * [[Versioned.CheckpointInterval]] commits — Delta's delta-log +
  * checkpoint discipline. This is what makes commit METADATA cost
  * O(changed files) instead of O(table): a streaming sink committing
  * per micro-batch onto a 1M-file table would otherwise write the
  * whole file list (~100 MB) every few seconds. The format change
  * must be invisible above the log layer — resolution (checkpoint +
  * action replay) equals the full-snapshot read everywhere. */
class ManifestLogSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestBytes(t: String): Map[Long, Long] = {
    val fs = fsOf(t)
    fs.listStatus(new Path(s"$t/_graft_log")).toSeq
      .filter(_.getPath.getName.endsWith(".manifest"))
      .map(st => st.getPath.getName.stripSuffix(".manifest").toLong ->
        st.getLen)
      .toMap
  }

  private def isDelta(t: String, v: Long): Boolean = {
    val fs = fsOf(t)
    val in = fs.open(new Path(s"$t/_graft_log/$v.manifest"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.contains("#delta")
  }

  test("commit metadata bytes track the DELTA, not the table: appends " +
    "onto a many-file base stay small; checkpoints land on interval") {
    val t = tmpDir("mlog") + "/t"
    // base: 64 files — a full snapshot of it is ~64 stats-bearing lines
    Versioned.commit((1 to 6400).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(64), t)
    val base = manifestBytes(t)(0L)
    assert(!isDelta(t, 0), "version 0 is always a checkpoint")
    val appends = Versioned.CheckpointInterval + 5
    (1 to appends).foreach { i =>
      Versioned.commit(Seq((100000 + i, s"a$i")).toDF("k", "v")
        .coalesce(1), t, "append")
    }
    val sizes = manifestBytes(t)
    // interval arithmetic: exactly one checkpoint in the first
    // CheckpointInterval+5 commits after v0, the rest deltas
    val checkpointVs = (1L to appends.toLong).filter(!isDelta(t, _))
    assert(checkpointVs == Seq(Versioned.CheckpointInterval.toLong),
      s"expected one checkpoint at the interval, got $checkpointVs")
    val deltaVs = (1L to appends.toLong).filter(isDelta(t, _))
    // every delta manifest is tiny — one added line + headers — and
    // does NOT grow with the version index or the table's file count
    deltaVs.foreach { v =>
      assert(sizes(v) < base / 4,
        s"delta manifest $v is ${sizes(v)} B — should be far under " +
          s"the ${base} B full snapshot")
    }
    assert(sizes(deltaVs.max) <= sizes(deltaVs.min) * 2,
      "delta size must not scale with history depth")
    // checkpoints DO carry the full list (that is their job)
    checkpointVs.foreach(v => assert(sizes(v) > base))
    // resolution is invisible: every version reads exactly its rows
    assert(Versioned.read(spark, t, Some(0)).count() == 6400)
    assert(Versioned.read(spark, t, Some(5)).count() == 6405)
    assert(Versioned.read(spark, t).count() == 6400 + appends)
    // history stays one manifest read per version: file counts exact
    val h = Versioned.history(spark, t).map(r => r._1 -> r._3).toMap
    assert(h(0L) == 64 && h(5L) == 69 && h(appends.toLong) == 64L + appends)
    // user meta stays clean of system headers
    assert(Versioned.readMeta(spark, t, 3L) == Map.empty)
  }

  test("DML and overwrite encode naturally: a DV delete's delta is an " +
    "in-place line swap; an overwrite resets to a full snapshot") {
    val t = tmpDir("mlog") + "/t"
    Versioned.commit((1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(8), t)
    Versioned.commit(Seq((101, "x")).toDF("k", "v").coalesce(1), t, "append")
    val before = manifestBytes(t)
    // DV delete: one file line gains a ref -> delta = marker + 1 A line
    assert(Versioned.deleteWithDv(spark, t, _ => true, col("k") === 101) == 1L)
    assert(isDelta(t, 2), "a one-file DV delete must encode as a delta")
    assert(manifestBytes(t)(2L) < before(0L) / 2,
      "the DV commit's manifest must not re-list the table")
    assert(Versioned.read(spark, t).count() == 100)
    // overwrite: removes every line -> full snapshot is smaller than
    // the R-spam and resets the chain
    Versioned.commit(Seq((1, "z")).toDF("k", "v").coalesce(1), t)
    assert(!isDelta(t, 3), "an overwrite should reset to a checkpoint")
    assert(Versioned.read(spark, t).count() == 1)
    // restore commits re-reference prior lines; resolution still exact
    Versioned.restore(spark, t, 2)
    assert(Versioned.read(spark, t).count() == 100)
  }

  test("reader protocol: a manifest stamped by a NEWER writer refuses " +
    "loudly instead of being silently misread") {
    val t = tmpDir("mlog") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v").coalesce(1), t)
    Versioned.commit(Seq((2, "b")).toDF("k", "v").coalesce(1), t, "append")
    // meta surfaces stay clean of the protocol stamp
    assert(Versioned.readMeta(spark, t, 1L) == Map.empty)
    assert(Versioned.history(spark, t).forall(!_._4.contains("reader")))
    // forge a future-protocol manifest on top
    val fs = fsOf(t)
    val p = new Path(s"$t/_graft_log/2.manifest")
    val out = fs.create(p, false)
    try out.write("#reader=99\n#commit_ts_ms=1\ndata/x/f.parquet"
      .getBytes("UTF-8"))
    finally out.close()
    Versioned.clearManifestCache()
    val e = intercept[IllegalStateException] {
      Versioned.read(spark, t).count()
    }
    assert(e.getMessage.contains("reader protocol 99"))
    // older versions stay readable — only the future commit refuses
    assert(Versioned.read(spark, t, Some(1)).count() == 2)
  }

  test("writer protocol: a duty-bearing table stamps #writer=2; a " +
    "table stamped by a NEWER writer stays READABLE but refuses " +
    "commits and vacuum — duties can never be silently bypassed") {
    val t = tmpDir("mlog") + "/t"
    Versioned.commit(Seq((1, 10L)).toDF("k", "cents").coalesce(1), t)
    // duty-free commits stamp writer=1 (downgrade-tolerant)...
    def writerOf(v: Long): Option[String] = {
      val fs = fsOf(t)
      val in = fs.open(new Path(s"$t/_graft_log/$v.manifest"))
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      body.linesIterator.collectFirst {
        case l if l.startsWith("#writer=") => l.stripPrefix("#writer=") }
    }
    assert(writerOf(0L).contains("1"))
    // ...and declaring a DUTY (an invariant) raises the stamp to 2,
    // which every later commit keeps while the duty rides
    Versioned.addInvariants(spark, t,
      Seq(Invariants.CheckRule("cents_pos", "cents >= 0")))
    assert(writerOf(1L).contains("2"))
    Versioned.commit(Seq((2, 20L)).toDF("k", "cents").coalesce(1),
      t, "append")
    assert(writerOf(2L).contains("2"),
      "the inherited duty must keep demanding writer 2")
    // forge a FUTURE writer's commit on top (readable: reader=1)
    val fs = fsOf(t)
    val out = fs.create(new Path(s"$t/_graft_log/3.manifest"), false)
    try out.write(("#reader=1\n#writer=99\n#commit_ts_ms=1\n#n_files=1\n" +
      "data/x/f.parquet").getBytes("UTF-8"))
    finally out.close()
    Versioned.clearManifestCache()
    // reads still resolve (the reader protocol is separate) ...
    assert(Versioned.versions(spark, t) == Seq(0L, 1L, 2L, 3L))
    // ... but every mutation refuses with the protocol named
    val e = intercept[IllegalStateException] {
      Versioned.commit(Seq((3, 30L)).toDF("k", "cents").coalesce(1),
        t, "append")
    }
    assert(e.getMessage.contains("writer protocol 99"))
    intercept[IllegalStateException] {
      Versioned.addInvariants(spark, t, Seq(Invariants.NotNull("k"))) }
    intercept[IllegalStateException] {
      Versioned.vacuum(spark, t, keepLast = 1) }
    assert(Versioned.versions(spark, t) == Seq(0L, 1L, 2L, 3L),
      "a refused mutation must change nothing")
  }

  test("the manifest cache bounds read-planning IO: re-planning warm " +
    "versions and reading a fresh commit open ZERO manifests") {
    val t = tmpDir("mlog") + "/t"
    Versioned.commit((1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4), t)
    (1 to 8).foreach(i =>
      Versioned.commit(Seq((1000 + i, "a")).toDF("k", "v")
        .coalesce(1), t, "append"))
    Versioned.read(spark, t).count() // warm the chain once
    Versioned.history(spark, t)
    val before = Versioned.manifestReads.get()
    Versioned.read(spark, t).count()
    Versioned.history(spark, t)
    assert(Versioned.manifestReads.get() == before,
      "re-planning cached versions must be manifest-IO-free — on an " +
        "object store every open is a round trip")
    // a fresh commit seeds the cache with its own bytes: the next
    // read opens nothing either
    Versioned.commit(Seq((2000, "z")).toDF("k", "v").coalesce(1),
      t, "append")
    val mid = Versioned.manifestReads.get()
    assert(Versioned.read(spark, t).count() == 109)
    assert(Versioned.manifestReads.get() == mid,
      "a committer's own next read must not re-open its manifest")
    // vacuum invalidates: the dropped version is gone from the cache
    // (a vacuumed version must throw, not resurrect from memory)
    Versioned.vacuum(spark, t, keepLast = 2)
    intercept[Exception] { Versioned.read(spark, t, Some(0)).count() }
  }

  test("a BIG checkpoint lands as a tiny pointer manifest + gzip'd " +
    "body sidecar — reads, history, meta, deltas, materialization and " +
    "vacuum sweeps all see the same log") {
    val t = tmpDir("mlog-gz") + "/t"
    Versioned.commit((1 to 3000).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(300), t)
    val fs = fsOf(t)
    def gzFiles() = fs.listStatus(new Path(s"$t/_graft_log")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".checkpoint.gz"))
    // the O(table) artifact is gone: the manifest itself is headers
    // only, the body rides compressed in the sidecar
    assert(manifestBytes(t)(0L) < 4096,
      s"pointer manifest must be tiny, got ${manifestBytes(t)(0L)} B")
    assert(gzFiles().size == 1)
    // cold resolution through the sidecar is invisible
    Versioned.clearManifestCache()
    assert(Versioned.read(spark, t).count() == 3000)
    assert(Versioned.readMeta(spark, t, 0L) == Map.empty,
      "ckpt/reader must stay system headers, never user meta")
    assert(Versioned.history(spark, t).head._3 == 300)
    // deltas chain off a pointer checkpoint exactly as off a text one
    Versioned.commit(Seq((9999, "x")).toDF("k", "v").coalesce(1),
      t, "append")
    Versioned.commit(Seq((9998, "y")).toDF("k", "v").coalesce(1),
      t, "append")
    assert(isDelta(t, 1) && isDelta(t, 2))
    assert(Versioned.read(spark, t).count() == 3002)
    assert(Versioned.read(spark, t, Some(0)).count() == 3000)
    // vacuum: the dropped pointer's sidecar is swept WITH it, and the
    // materialized survivor checkpoint is itself pointer-form
    Versioned.vacuum(spark, t, keepLast = 2)
    assert(Versioned.versions(spark, t) == Seq(1L, 2L))
    assert(!isDelta(t, 1),
      "the oldest survivor must be a materialized checkpoint")
    assert(manifestBytes(t)(1L) < 4096,
      "a big materialized checkpoint must also be pointer-form")
    assert(gzFiles().size == 1,
      "v0's sidecar swept, v1's materialization landed one")
    Versioned.clearManifestCache()
    assert(Versioned.read(spark, t, Some(1)).count() == 3001)
    assert(Versioned.read(spark, t).count() == 3002)
    // a small overwrite resets to a plain-text checkpoint; vacuuming
    // the last pointer version leaves no sidecar behind
    Versioned.commit(Seq((1, "z")).toDF("k", "v").coalesce(1), t)
    Versioned.vacuum(spark, t, keepLast = 1)
    assert(gzFiles().isEmpty,
      "no version references a sidecar — all must be swept")
    assert(Versioned.read(spark, t).count() == 1)
  }

  test("vacuum materializes the oldest survivor as a checkpoint: " +
    "surviving deltas stay resolvable after their chain base is dropped") {
    val t = tmpDir("mlog") + "/t"
    Versioned.commit((1 to 50).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4), t)
    (1 to 6).foreach { i =>
      Versioned.commit(Seq((1000 + i, s"a$i")).toDF("k", "v")
        .coalesce(1), t, "append")
    }
    assert((1L to 6L).forall(isDelta(t, _)))
    // drop versions 0..3 — the checkpoint the chain of 4..6 replays from
    Versioned.vacuum(spark, t, keepLast = 3)
    assert(Versioned.versions(spark, t) == Seq(4L, 5L, 6L))
    assert(!isDelta(t, 4),
      "the oldest survivor must have been rewritten as a checkpoint")
    assert(Versioned.read(spark, t, Some(4)).count() == 54)
    assert(Versioned.read(spark, t, Some(6)).count() == 56)
    // its commit meta survived the in-place rewrite
    assert(Versioned.history(spark, t).map(_._1) == Seq(4L, 5L, 6L))
    // and the next commit chains off the materialized checkpoint
    Versioned.commit(Seq((2000, "n")).toDF("k", "v").coalesce(1), t, "append")
    assert(isDelta(t, 7))
    assert(Versioned.read(spark, t).count() == 57)
  }

  test("header reads never touch a pointer checkpoint's body: meta and " +
    "history survive a MISSING sidecar — only the data read needs it") {
    val t = tmpDir("mlog-hdr") + "/t"
    Versioned.commit((1 to 3000).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(300), t) // 300 files >= CheckpointGzMinLines: pointer form
    val fs = fsOf(t)
    val gz = fs.listStatus(new Path(s"$t/_graft_log")).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".checkpoint.gz"))
    assert(gz.size == 1)
    fs.delete(gz.head, false)
    Versioned.clearManifestCache()
    // DESCRIBE HISTORY / readMeta / commit-time consumers read the
    // tiny pointer manifest only — on a million-file table the body
    // download+gunzip would dominate every metadata operation
    assert(Versioned.readMeta(spark, t, 0L) == Map.empty)
    val (v0, ts, nFiles, _) = Versioned.history(spark, t).head
    assert(v0 == 0L && nFiles == 300 && ts.getTime > 0,
      "history must serve version, time and file count from headers")
    // the DATA read is the one consumer that needs the body
    intercept[Exception] { Versioned.read(spark, t).count() }
  }

  test("the writer-protocol gate reads HEADERS only: past the cache " +
    "bound, maintenance on a pointer table pays no gate-side body fetch") {
    val t = tmpDir("mlog-wgate") + "/t"
    Versioned.commit((1 to 3000).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(300), t) // 300 files: pointer + gz body form
    val oldMax = Versioned.ManifestCacheLineMax
    // simulate a million-file table: expanded manifests too big to
    // cache, so every BODY consumer pays a physical sidecar fetch —
    // exactly the regime where a gate reading manifestLines doubles
    // the per-operation sidecar downloads
    Versioned.ManifestCacheLineMax = 10
    try {
      Versioned.clearManifestCache()
      val before = Versioned.sidecarReads.get()
      // vacuum that drops nothing: the writer gate (header-only) +
      // the keep-side sweep accounting (the ONE legitimate body read)
      Versioned.vacuum(spark, t, keepLast = 5)
      val fetches = Versioned.sidecarReads.get() - before
      assert(fetches == 1,
        s"expected exactly 1 sidecar fetch (sweep accounting), got " +
          s"$fetches — a gate-side manifestLines read would make it 2")
      assert(Versioned.versions(spark, t) == Seq(0L))
    } finally {
      Versioned.ManifestCacheLineMax = oldMax
      Versioned.clearManifestCache()
    }
  }

  test("dropping the last duty stamps the table back down to writer=1 " +
    "— an empty carried contract key imposes no duty") {
    val t = tmpDir("mlog-wdown") + "/t"
    Versioned.commit(Seq((1, 10L)).toDF("k", "cents").coalesce(1), t)
    Versioned.addInvariants(spark, t,
      Seq(Invariants.CheckRule("cents_pos", "cents >= 0")))
    def writerOf(v: Long): Option[String] = {
      val fs = fsOf(t)
      val in = fs.open(new Path(s"$t/_graft_log/$v.manifest"))
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      body.linesIterator.collectFirst {
        case l if l.startsWith("#writer=") => l.stripPrefix("#writer=") }
    }
    assert(writerOf(1L).contains("2"))
    Versioned.dropInvariant(spark, t, "cents_pos")
    assert(writerOf(2L).contains("1"),
      "the drop itself leaves a duty-free table — stamp 1")
    // the explicit empty inv= (which overrides inheritance) must keep
    // stamping 1 as later commits carry it forward
    Versioned.commit(Seq((2, 20L)).toDF("k", "cents").coalesce(1),
      t, "append")
    assert(writerOf(3L).contains("1"),
      "older writers must regain a table whose duties were all dropped")
  }
}
