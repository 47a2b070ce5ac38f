package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("applyChanges closes changed rows, inserts new versions and keys, " +
    "leaves equal-attr and absent keys untouched") {
    val history = Seq(
      // k=1 has a closed old version + a current one
      (1L, "v1", ts("2024-01-01 00:00:00"), Option(ts("2024-02-01 00:00:00"))),
      (1L, "v2", ts("2024-02-01 00:00:00"), None),
      (2L, "w1", ts("2024-01-15 00:00:00"), None),
      (3L, "x1", ts("2024-01-20 00:00:00"), None))
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "v3", ts("2024-03-01 00:00:00")), // changed -> close + insert
      (2L, "w1", ts("2024-03-01 00:00:00")), // equal attrs -> no-op
      (4L, "y1", ts("2024-03-01 00:00:00"))) // new key -> insert
      .toDF("k", "attr", "ts")

    val out = Scd2.applyChanges(history, updates, Seq("k"), Seq("attr"), "ts")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet

    assert(out == Set(
      (1L, "v1", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00"))),
      (1L, "v2", ts("2024-02-01 00:00:00"), Some(ts("2024-03-01 00:00:00"))),
      (1L, "v3", ts("2024-03-01 00:00:00"), None),
      (2L, "w1", ts("2024-01-15 00:00:00"), None), // not churned
      (3L, "x1", ts("2024-01-20 00:00:00"), None), // absent from batch
      (4L, "y1", ts("2024-03-01 00:00:00"), None)))
    // invariant: exactly one current row per live key
    val currents = out.filter(_._4.isEmpty).groupBy(_._1).map(_._2.size)
    assert(currents.forall(_ == 1))
  }

  private def partFiles(path: String): Map[String, Long] = {
    val d = new java.io.File(path)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("applyToTable rewrites only touched partitions; untouched keep " +
    "their exact files") {
    val path = tmpDir("scd2table") + "/t"
    Seq(
      (1L, 10, "v1", ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      (2L, 20, "w1", ts("2024-01-15 00:00:00"), None: Option[Timestamp]))
      .toDF("k", "part", "attr", "valid_from", "valid_to")
      .write.partitionBy("part").parquet(path)
    val before20 = partFiles(s"$path/part=20")
    assert(before20.nonEmpty)

    val updates = Seq((1L, 10, "v2", ts("2024-03-01 00:00:00")))
      .toDF("k", "part", "attr", "ts")
    val touched = Scd2.applyToTable(spark, path, updates, Seq("k"),
      Seq("part", "attr"), "ts", Seq("part"))
    assert(touched == Seq(Seq("10")))

    val out = spark.read.parquet(path)
      .select($"k", $"attr", $"valid_from", $"valid_to")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(out == Set(
      (1L, "v1", ts("2024-01-01 00:00:00"), Some(ts("2024-03-01 00:00:00"))),
      (1L, "v2", ts("2024-03-01 00:00:00"), None),
      (2L, "w1", ts("2024-01-15 00:00:00"), None)))
    assert(partFiles(s"$path/part=20") == before20) // bit-for-bit untouched
  }

  test("applyToTable: a key moving partitions closes the row in the OLD " +
    "partition and opens the new version in the NEW one") {
    val path = tmpDir("scd2move") + "/t"
    Seq(
      (1L, "east", "v1", ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      (2L, "west", "w1", ts("2024-01-15 00:00:00"), None: Option[Timestamp]))
      .toDF("k", "region", "attr", "valid_from", "valid_to")
      .write.partitionBy("region").parquet(path)

    // k=1 moves east -> central
    val updates = Seq((1L, "central", "v1", ts("2024-03-01 00:00:00")))
      .toDF("k", "region", "attr", "ts")
    val touched = Scd2.applyToTable(spark, path, updates, Seq("k"),
      Seq("region", "attr"), "ts", Seq("region")).toSet
    assert(touched == Set(Seq("central"), Seq("east")))

    val out = spark.read.parquet(path)
      .select($"k", $"region", $"attr", $"valid_from", $"valid_to")
      .as[(Long, String, String, Timestamp, Option[Timestamp])]
      .collect().toSet
    assert(out == Set(
      (1L, "east", "v1", ts("2024-01-01 00:00:00"),
        Some(ts("2024-03-01 00:00:00"))), // closed in old partition
      (1L, "central", "v1", ts("2024-03-01 00:00:00"), None), // new current
      (2L, "west", "w1", ts("2024-01-15 00:00:00"), None)))
  }

  test("an unpartitioned apply self-heals a crash in a prior apply's " +
    "commit window instead of failing on the missing path forever") {
    val path = tmpDir("scd2crash") + "/dim"
    Seq((1L, "v1", ts("2024-01-01 00:00:00"),
      Option.empty[Timestamp])).toDF("k", "attr", "valid_from", "valid_to")
      .write.parquet(path)
    // simulate the crash window: table renamed to the hidden backup
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(DataMerge.hiddenSibling(path, ".old"))))
    val updates = Seq((1L, "v2", ts("2024-02-01 00:00:00")))
      .toDF("k", "attr", "ts")
    Scd2.applyToTable(spark, path, updates, Seq("k"), Seq("attr"), "ts", Nil)
    val out = spark.read.parquet(path)
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(out == Set(
      (1L, "v1", ts("2024-01-01 00:00:00"),
        Some(ts("2024-02-01 00:00:00"))),
      (1L, "v2", ts("2024-02-01 00:00:00"), None)),
      "the apply must recover the backup and close v1 against it")
  }
}
