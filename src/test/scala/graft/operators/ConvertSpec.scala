package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** In-place CONVERT of a plain parquet dir into the snapshot format:
  * version 0 references the existing files (stats harvested, nothing
  * moved); the table then carries the full lake lifecycle, while the
  * imported originals are never swept by vacuum. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("CONVERT imports files in place: same bytes, stats harvested, " +
    "reads equal; re-convert and hive layouts refuse") {
    val dir = tmpDir("convert") + "/landing"
    (1 to 300).map(i => (i, i * 2L)).toDF("k", "v")
      .repartition(3).write.parquet(dir)
    val before = fsOf(dir).listStatus(new Path(dir))
      .map(s => s.getPath.getName -> s.getLen).toMap
    val r = spark.sql(s"CONVERT '$dir' TO GRAFT").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((0L, 3L)))
    val after = fsOf(dir).listStatus(new Path(dir))
      .filterNot(_.getPath.getName.startsWith("_graft"))
      .map(s => s.getPath.getName -> s.getLen).toMap
    assert(after == before, "convert must not touch one data byte")
    assert(Versioned.read(spark, dir).count() == 300)
    assert(Versioned.fileStats(spark, dir).size == 3,
      "footer stats must be harvested onto the manifest lines")
    intercept[IllegalArgumentException] { Versioned.convert(spark, dir) }
    // hive-partitioned: refused with the partition-values explanation
    val hive = tmpDir("convert") + "/hive"
    Seq((1, "a"), (2, "b")).toDF("k", "p")
      .write.partitionBy("p").parquet(hive)
    val e = intercept[IllegalArgumentException] {
      Versioned.convert(spark, hive)
    }
    assert(e.getMessage.contains("partition"))
  }

  test("a converted table lives the full lifecycle: stats-scoped DML " +
    "carries untouched imports, appends land under data/, vacuum " +
    "never sweeps the originals") {
    val dir = tmpDir("convert") + "/landing"
    // two files with disjoint k ranges for scoped DML
    (1 to 100).map(i => (i, i * 1L)).toDF("k", "v")
      .coalesce(1).write.parquet(dir)
    (101 to 200).map(i => (i, i * 1L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Versioned.convert(spark, dir)
    // scoped delete: the 1-100 import is carried without being read
    spark.sql(s"DELETE FROM '$dir' WHERE k > 150")
    val files1 = Versioned.versionFiles(spark, dir)
    assert(files1.exists(!_.contains("/data/")),
      "the untouched import must be carried in place")
    assert(Versioned.read(spark, dir).count() == 150)
    // append: standard segment layout
    Versioned.commit(Seq((500, 5L)).toDF("k", "v").coalesce(1),
      dir, "append")
    assert(Versioned.read(spark, dir).count() == 151)
    // time travel to the import
    assert(Versioned.read(spark, dir, Some(0)).count() == 200)
    // vacuum: imported originals survive even once unreferenced —
    // the format never deletes files it didn't create
    spark.sql(s"OPTIMIZE '$dir' COMPACT") // localizes everything
    Versioned.vacuum(spark, dir, keepLast = 1)
    val rootFiles = fsOf(dir).listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(rootFiles.length == 2,
      "vacuum must not sweep the imported originals")
    assert(Versioned.read(spark, dir).count() == 151)
  }

  test("vacuum while survivors still REFERENCE imported files: the " +
    "sweep must tolerate top-level rels (no data/<uuid>/ shape) " +
    "instead of crashing, and keep both imports and fresh segments") {
    val dir = tmpDir("convert") + "/landing"
    (1 to 50).map(i => (i, i * 1L)).toDF("k", "v")
      .coalesce(1).write.parquet(dir)
    Versioned.convert(spark, dir)
    // two appends so there are manifests to drop AND the survivor
    // still carries the imported top-level rel — no OPTIMIZE first
    Versioned.commit(Seq((500, 5L)).toDF("k", "v").coalesce(1),
      dir, "append")
    Versioned.commit(Seq((501, 6L)).toDF("k", "v").coalesce(1),
      dir, "append")
    Versioned.vacuum(spark, dir, keepLast = 1) // crashed pre-fix (AIOOBE)
    assert(Versioned.read(spark, dir).count() == 52)
    assert(Versioned.versionFiles(spark, dir).exists(!_.contains("/data/")),
      "the import must still be referenced by the survivor")
    // both appended segments' data must survive the sweep (their
    // lines ride the surviving manifest)
    assert(Versioned.read(spark, dir).where($"k" >= 500).count() == 2)
  }
}
