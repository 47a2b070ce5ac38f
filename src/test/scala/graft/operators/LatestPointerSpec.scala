package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The `_graft_log/_latest` pointer: read planning on a deep-history
  * table must resolve the latest version with O(1) file stats — no
  * listing of the log dir (on an object store, LIST over 100k
  * streaming commits would dominate every read). The pointer is
  * best-effort: stale, missing, or garbage pointers degrade to a
  * listing, never to a wrong version. */
class LatestPointerSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fabricate a deep manifest history without paying 1000 Spark
    * writes: commit v0 for real, then clone its manifest body into
    * versions 1..n-1 (every version references the same segment —
    * layout-legal, and exactly what a restore chain looks like). */
  private def deepTable(n: Int): String = {
    val t = tmpDir("deep") + "/t"
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val fs = fsOf(t)
    val m0 = new Path(s"$t/_graft_log/0.manifest")
    val body = {
      val in = fs.open(m0)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    (1 until n).foreach { v =>
      val out = fs.create(new Path(s"$t/_graft_log/$v.manifest"), false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    t
  }

  private def writePointer(t: String, s: String): Unit = {
    val fs = fsOf(t)
    val out = fs.create(new Path(s"$t/_graft_log/_latest"), true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  test("commit writes the pointer; reads resolve latest with zero " +
    "log-dir listings on a 1000-version table") {
    val t = deepTable(1000)
    writePointer(t, "999") // hand-made history: hand-set the pointer
    val before = Versioned.latestListFallbacks.get()
    assert(Versioned.read(spark, t).count() == 2)
    assert(Versioned.versionFiles(spark, t).nonEmpty)
    assert(Versioned.latestListFallbacks.get() == before,
      "a valid pointer must resolve the version without a LIST")
    // and a real commit maintains it: pointer == committed version
    val v = Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append")
    assert(v == 1000L)
    val fs = fsOf(t)
    val in = fs.open(new Path(s"$t/_graft_log/_latest"))
    val ptr = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    assert(ptr == "1000")
  }

  test("stale pointer (best-effort write lost a race) forward-probes to " +
    "the true latest without a listing") {
    val t = deepTable(50)
    writePointer(t, "41") // 8 commits behind
    val before = Versioned.latestListFallbacks.get()
    // versions() lists by contract; latest-resolution must not
    assert(Versioned.versionFiles(spark, t).nonEmpty)
    assert(Versioned.latestListFallbacks.get() == before)
    // proves it resolved 49, not 41: a commit lands at 50
    assert(Versioned.commit(Seq((9, "z")).toDF("k", "v"), t, "append") == 50L)
  }

  test("missing, garbage, and beyond-end pointers fall back to a " +
    "listing and still resolve correctly") {
    val t = deepTable(10)
    val fs = fsOf(t)
    // missing (v0's commit wrote pointer=0 — delete it; a stale-at-0
    // pointer would otherwise forward-probe, which the first test
    // already covers)
    fs.delete(new Path(s"$t/_graft_log/_latest"), false)
    val b0 = Versioned.latestListFallbacks.get()
    assert(Versioned.read(spark, t).count() == 2)
    assert(Versioned.latestListFallbacks.get() == b0 + 1)
    // garbage
    writePointer(t, "not-a-version")
    val b1 = Versioned.latestListFallbacks.get()
    assert(Versioned.read(spark, t).count() == 2)
    assert(Versioned.latestListFallbacks.get() == b1 + 1)
    // beyond end (names a manifest that does not exist — e.g. the
    // pointed-at version was vacuumed)
    writePointer(t, "5000")
    val b2 = Versioned.latestListFallbacks.get()
    assert(Versioned.read(spark, t).count() == 2)
    assert(Versioned.latestListFallbacks.get() == b2 + 1)
    assert(fs.exists(new Path(s"$t/_graft_log/9.manifest")))
  }

  test("vacuum keeps the pointer valid (latest always survives)") {
    val t = tmpDir("vacptr") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append")
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append")
    Versioned.vacuum(spark, t, keepLast = 1)
    val before = Versioned.latestListFallbacks.get()
    assert(Versioned.read(spark, t).count() == 3)
    assert(Versioned.latestListFallbacks.get() == before,
      "post-vacuum reads must still ride the pointer")
  }
}
