package graft.operators

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact rewrites a many-file dir to one file, data intact") {
    val path = tmpDir("compact") + "/t"
    // simulate many chunk appends
    (0 until 6).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(path)
    }
    assert(Compaction.fileCount(spark, path) == 6)
    val (before, after) = Compaction.compact(spark, path, targetFiles = 1)
    assert(before == 6 && after == 1)
    val got = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(got == (0 until 6).map(i => (i.toLong, s"v$i")).toSet)
  }

  test("compactPartitions touches only partitions over the threshold") {
    val path = tmpDir("compactp") + "/t"
    // part=0 gets 5 files, part=1 gets 1 file (partition value lives in
    // the dir name, not the files, as partitionBy writes it)
    (0 until 5).foreach { i =>
      Seq(i.toLong).toDF("k")
        .coalesce(1).write.mode("append").parquet(s"$path/part=0")
    }
    Seq(99L).toDF("k")
      .coalesce(1).write.mode("append").parquet(s"$path/part=1")
    val p1Before = new java.io.File(s"$path/part=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

    val compacted = Compaction.compactPartitions(spark, path, maxFiles = 2)
    assert(compacted == Seq("part=0"))
    assert(Compaction.fileCount(spark, s"$path/part=0") == 1)
    // untouched partition keeps its exact files
    val p1After = new java.io.File(s"$path/part=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(p1After == p1Before)
    // data intact across both partitions
    assert(spark.read.parquet(path).count() == 6)
  }

  test("leaf rewrites stage under hidden names; leftovers don't poison reads") {
    val path = tmpDir("compacth") + "/t"
    (0 until 3).foreach { i =>
      Seq(i.toLong).toDF("k")
        .coalesce(1).write.mode("append").parquet(s"$path/part=0")
    }
    Compaction.compactPartitions(spark, path, maxFiles = 1)
    // nothing visible with '=' in the name besides the real partition:
    // a `part=0.merge-staging` sibling would be parsed as a bogus
    // partition VALUE by path-based discovery
    val visible = new java.io.File(path).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).toSet
    assert(visible == Set("part=0"))
    assert(spark.read.parquet(path).count() == 3)

    // a crash-leftover hidden staging dir is invisible to partition
    // discovery AND to a later compaction pass
    val leftover = new java.io.File(s"$path/.part=0.merge-staging/part=9")
    leftover.mkdirs()
    Seq(7L).toDF("k").coalesce(1).write.mode("append")
      .parquet(s"$path/.part=0.merge-staging/part=9")
    assert(spark.read.parquet(path).count() == 3) // leftover not read
    assert(Compaction.leafPartitionDirs(spark, path)
      .forall(_.endsWith("part=0")))
    val again = Compaction.compactPartitions(spark, path, maxFiles = 1)
    assert(again.isEmpty) // already 1 file; leftover not compacted
  }
}
