package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny sidecar files (flat one-object JSON or a bare value) next to
  * persisted indexes: the content-addressed IVF codebook
  * (`_ivf_codebook-<fp>.txt`), the legacy plain-dir LSH plane family
  * (`_lsh_planes.json`), the streaming batch mirrors
  * (`_neardedup_batch`, `_annbatch`). One read/write/parse
  * implementation so the call sites cannot drift — and so a
  * TRUNCATED sidecar (a crash between create and write leaves a
  * zero-byte file) fails with a named, actionable error instead of a
  * bare MatchError. */
private[graft] object Sidecars {

  def write(spark: SparkSession, p: Path, content: String): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // temp + rename, never an in-place overwrite: the re-seed paths
    // rewrite a sidecar a concurrent reader may be mid-read, and a
    // crash mid-write would leave a truncated file that fails every
    // later read until manually deleted (r15 ADVICE). The rename is
    // atomic-enough on the Hadoop filesystems we target.
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, fs.getConf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      // ONLY capability errors (no AbstractFileSystem binding / no
      // atomic-overwrite rename) downgrade to delete+rename — a
      // TRANSIENT IOException must propagate, because the fallback
      // deletes the existing sidecar first and a second failure (or a
      // crash) in that window would leave NO sidecar where stale-but-
      // valid content previously survived.
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
          _: UnsupportedOperationException =>
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p), s"could not write sidecar $p")
    }
  }

  /** None iff the file does not exist; an existing file is read fully. */
  def read(spark: SparkSession, p: Path): Option[String] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val arr = new Array[Byte](4096)
        var n = in.read(arr)
        while (n >= 0) { buf.write(arr, 0, n); n = in.read(arr) }
        Some(new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Parse `{"k":v,...}` (values contain no commas/colons — ours are
    * numbers and plain path strings written by [[write]]). A corrupt
    * or truncated payload names the file and the remedy. */
  def parseFlatJson(raw: String, p: Path): Map[String, String] = {
    val body = raw.trim.stripPrefix("{").stripSuffix("}")
    val pairs = body.split(",").filter(_.nonEmpty).map { kv =>
      kv.split(":", 2) match {
        case Array(k, v) =>
          k.trim.replaceAll("\"", "") -> v.trim.replaceAll("\"", "")
        case _ => throw new IllegalStateException(
          s"corrupt sidecar $p: ${raw.take(80)} — a crash may have " +
            "truncated it; delete the file (or rebuild the index) and " +
            "re-run")
      }
    }
    if (pairs.isEmpty) throw new IllegalStateException(
      s"corrupt sidecar $p: empty — a crash may have truncated it; " +
        "delete the file (or rebuild the index) and re-run")
    pairs.toMap
  }
}
