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
}
