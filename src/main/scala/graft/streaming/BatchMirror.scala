package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The vacuum-proof half of a streaming sink's replay ledger. The
  * PRIMARY ledger is manifest commit meta (it lands atomically with
  * the batch's rows); but `Versioned.vacuum` on a shared table can
  * drop the old manifests that carry the stream's last batch id
  * (foreign commits land on top, retention sweeps below), so the id is
  * ALSO mirrored to a root-level sidecar file retention never touches.
  * The mirror is SCOPED to its table (normalized path), so a stale
  * mirror in a reused location can never mark a NEW stream's batches
  * as replays. Shared by [[NearDedup]] and [[AnnIngest]] so the
  * normalization and escaping rules cannot drift between the two. */
private[graft] object BatchMirror {

  /** Canonical spelling of the scoping path: the filesystem-qualified
    * URI, so trailing slashes, relative forms and bare-vs-scheme
    * spellings all collapse to one string. */
  def normalize(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toUri.toString
  }

  /** Batch id recorded in the mirror, iff it is scoped to `scopePath`.
    * An unparseable or foreign-scoped mirror reads as None — the
    * manifest is primary; the mirror only exists for the
    * vacuum-erased-manifest case. BOTH sides of the scope comparison
    * are normalized: mirrors written before the normalization landed
    * recorded the RAW index path, and reading them as foreign would
    * silently drop exactly the vacuum-erasure protection they carry —
    * a spelling that qualifies to the same URI is the same index. */
  def read(spark: SparkSession, file: Path, scopePath: String)
      : Option[Long] =
    graft.operators.Sidecars.read(spark, file)
      .flatMap(raw => scala.util.Try {
        val m = graft.operators.Sidecars.parseFlatJson(raw, file)
        if (normalize(spark, m("index")) == normalize(spark, scopePath))
          Some(m("batch").toLong)
        else None
      }.toOption.flatten)

  /** Record `batchId` scoped to `scopePath`. The flat-JSON sidecar
    * format splits on commas and strips quotes, so a path containing
    * either would round-trip WRONG (mis-split → diagnosed as corrupt,
    * or scope-compared against a mangled string) — such exotic paths
    * refuse loudly at the first batch rather than escape. */
  def write(spark: SparkSession, file: Path, scopePath: String,
      batchId: Long): Unit = {
    val norm = normalize(spark, scopePath)
    require(!norm.contains(',') && !norm.contains('"'),
      s"index path unencodable in the batch mirror (contains , or \"): " +
        s"$norm — use a comma/quote-free index path")
    graft.operators.Sidecars.write(spark, file,
      s"""{"batch":$batchId,"index":"$norm"}""")
  }
}
