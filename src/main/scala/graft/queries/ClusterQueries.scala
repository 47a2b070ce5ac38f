package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Clustering

/** Z-order clustering declared as oracle-checked queries: the layout
  * rewrite must preserve content EXACTLY (zo1) and serve range
  * predicates with the same answers as the original table (zo2) — the
  * file-skipping geometry itself is proven in `ClusteringSpec` (per-file
  * min/max spans + files-touched counts, not SQL-expressible).
  */
object ClusterQueries {

  /** Clustered copy of lineitem, memoized per (JVM, sf dir): the rewrite
    * is the operator under test but is paid once, so zo2 times the read
    * path, not a second rewrite. */
  private val clustered =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def clusteredDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    clustered.computeIfAbsent(dir, { _ =>
      val out = java.nio.file.Files.createTempDirectory("zorder").toString + "/li"
      Clustering.clusterWrite(Tables(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey"), out, files = 8)
      out
    })

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- ZO1 the clustered copy is byte-equivalent to the source table
    "zo1_zorder_roundtrip" -> QueryDef(
      (s, dir) => s.read.parquet(clusteredDir(s, dir)),
      Some("SELECT * FROM lineitem")),

    // ---- ZO2 a two-column range probe against the clustered layout —
    // at scale this is the scan that footer-stats pruning accelerates on
    // BOTH columns; the answer must match the unclustered table
    "zo2_zorder_range" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.functions._
        s.read.parquet(clusteredDir(s, dir))
          .where($"l_orderkey" <= 3000 && $"l_partkey".between(100, 400))
          .agg(count(lit(1)).as("cnt"),
            round(sum($"l_quantity"), 2).as("sum_qty"))
      },
      Some("""SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        WHERE l_orderkey <= 3000 AND l_partkey BETWEEN 100 AND 400"""))
  )
}
