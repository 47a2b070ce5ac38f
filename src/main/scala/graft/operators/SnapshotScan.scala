package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-scanned reads of Versioned snapshot tables addressed by
  * PATH — the one way to read a bucketed table such that the DSv2 scan
  * reports its layout to the planner (KeyGroupedPartitioning for
  * storage-partitioned joins, bucket pruning for equality/IN probes on
  * the bucket column). A plain `spark.read.parquet` of the same files
  * would be correct but shuffle every co-located join and scan every
  * bucket of every point probe. Shared by the band-index probe path
  * (graft.operators.Dedup) and the persisted ANN indexes
  * (graft.operators.Similarity). */
private[graft] object SnapshotScan {

  /** Does `path` hold a committed snapshot table (a `_graft_log`)? */
  def isSnapshot(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(p, Versioned.LogDir))
  }

  /** Register (idempotently) a per-table catalog rooted at the table's
    * parent dir and return the backtick-quoted `cat.table` identifier.
    * The catalog name is a pure function of the path, so repeated
    * reads reuse one catalog instance (and its caches). The name
    * carries 64 hash bits: Spark's CatalogManager caches the catalog
    * INSTANCE by name with the root it was initialized with, so a
    * name collision between two table paths would silently serve the
    * first path's parent for both — wrong-table reads, not an error.
    * At 64 bits a collision needs ~10^9 distinct table paths in one
    * session; the 24-bit form this replaces collided at birthday odds
    * of ~3% by 1000 tables. */
  /** 64 hash bits from two seeded murmur passes — NOT MessageDigest:
    * this runs on the universal read path, and a FIPS-restricted JVM
    * throws on MD5 where pure-JVM hashing always works. */
  private[graft] def pathToken(path: String): String = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(path, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(path, 0x85ebca6b)
    java.lang.Long.toHexString((h1.toLong << 32) | (h2 & 0xffffffffL))
  }

  private def identifierOf(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val cat = "graft_snap_" + pathToken(path)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", p.getParent.toString)
    s"$cat.`${p.getName}`"
  }

  /** The table's LATEST version as a catalog-scanned frame. */
  def frame(spark: SparkSession, path: String): DataFrame =
    spark.table(identifierOf(spark, path))

  /** A PINNED version as a catalog-scanned frame (`VERSION AS OF`) —
    * the atomic-read primitive: resolve a version, read its manifest
    * meta, then scan exactly that version's files, immune to commits
    * landing in between. */
  def frameAt(spark: SparkSession, path: String, v: Long): DataFrame =
    spark.sql(s"SELECT * FROM ${identifierOf(spark, path)} VERSION AS OF $v")
}
