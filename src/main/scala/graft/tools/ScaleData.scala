package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: derive an N× copy of a testdata
  * directory under a scratch path (the driver testdata itself is
  * read-only and never touched). Fact tables are scaled by unioning N
  * key-shifted copies — each copy gets a DISJOINT key population
  * (orders/lineitem shift the order key consistently so the join
  * structure is preserved; events shift user and event ids so key
  * cardinality scales with volume, the shape a real 10× of an event
  * stream has). Dimensions and the text/embedding corpora are copied
  * verbatim: scaling near-duplicate text by copying would multiply
  * duplicate-group sizes (a data-construction artifact that reads as
  * superlinear engine cost), so dedup-family queries rehearse at 1×
  * and the relational/streaming/lake families carry the 10× claim.
  *
  * Usage: ScaleData <srcDir> <dstDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcDir> <dstDir> <factor>")
    val Array(src, dst, fs) = args
    val factor = fs.toInt
    require(factor >= 1 && factor <= 100, s"factor out of range: $factor")
    require(!src.contains("/root/testdata") || dst.startsWith("/tmp"),
      "derived data must land under /tmp")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-scale-data")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copyVerbatim = Seq("region", "nation", "customer", "supplier",
      "part", "documents", "embeddings")
    copyVerbatim.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"copied $t")
    }

    val OrderShift = 100000000L
    val UserShift = 10000000L
    val EventShift = 1000000000L

    def scaled(t: String)(shift: (org.apache.spark.sql.DataFrame, Int)
        => org.apache.spark.sql.DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      (0 until factor).map(i => shift(base, i))
        .reduce(_.unionByName(_))
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"scaled $t x$factor -> " +
        spark.read.parquet(s"$dst/$t.parquet").count())
    }

    scaled("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * OrderShift))
    }
    scaled("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * OrderShift))
    }
    scaled("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * EventShift))
        .withColumn("user_id", col("user_id") + lit(i * UserShift))
    }
    spark.stop()
  }
}
