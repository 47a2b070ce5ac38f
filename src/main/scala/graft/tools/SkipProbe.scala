package graft.tools

import graft.Tables
import graft.operators.Clustering
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: measured file-skipping geometry of the z-order
  * layout vs a single-column linear sort at sf0.1 — per-file normalized
  * spans on both clustered columns and files touched by a 10%-band
  * predicate on the SECOND column (the one a linear sort abandons).
  * Results are recorded in PERFORMANCE.md; re-run with
  * `sbt "runMain graft.tools.SkipProbe [sfDir] [files]"`.
  */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val zDir = java.nio.file.Files.createTempDirectory("zprobe").toString + "/z"
    val linDir = java.nio.file.Files.createTempDirectory("zprobe").toString + "/lin"

    Clustering.clusterWrite(li, Seq("l_orderkey", "l_partkey"), zDir, files)
    li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey").write.parquet(linDir)

    def spans(dir: String) =
      (Clustering.avgFileSpan(spark, dir, "l_orderkey"),
        Clustering.avgFileSpan(spark, dir, "l_partkey"))
    val (zo, zp) = spans(zDir)
    val (lo, lp) = spans(linDir)
    println(f"layout=zorder  files=$files%d span(l_orderkey)=$zo%.3f span(l_partkey)=$zp%.3f")
    println(f"layout=linear  files=$files%d span(l_orderkey)=$lo%.3f span(l_partkey)=$lp%.3f")

    val Array(qlo, qhi) = li.stat.approxQuantile("l_partkey",
      Array(0.45, 0.55), 0.001)
    val pred = col("l_partkey").between(qlo, qhi)
    val zT = Clustering.filesTouched(spark, zDir, pred)
    val lT = Clustering.filesTouched(spark, linDir, pred)
    println(s"10%-band predicate on l_partkey: zorder touches $zT/$files files, " +
      s"linear touches $lT/$files")
    spark.stop()
  }
}
