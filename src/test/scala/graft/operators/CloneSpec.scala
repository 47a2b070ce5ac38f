package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Zero-copy shallow clone: one manifest write re-references the
  * source's files absolutely; the clone reads identically, evolves
  * independently (its DML/appends land clone-side), carries layout
  * contracts, and its vacuum can never touch source data. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("clone copies ZERO data files, reads equal the source, and the " +
    "SQL form returns the versions") {
    val dir = tmpDir("clone")
    val src = s"$dir/src"; val dst = s"$dir/dst"
    Versioned.commit((1 to 500).map(i => (i, i * 2L)).toDF("k", "v")
      .coalesce(2), src)
    Versioned.commit(Seq((501, 1002L)).toDF("k", "v").coalesce(1),
      src, "append")
    val r = spark.sql(s"CLONE '$src' TO '$dst'").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 0L)))
    // zero bytes moved: the clone has no data dir of its own yet
    assert(!fsOf(dst).exists(new Path(s"$dst/data")),
      "a shallow clone must not copy segments")
    assert(Versioned.read(spark, dst).collect().toSet ==
      Versioned.read(spark, src).collect().toSet)
    assert(Versioned.readMeta(spark, dst, 0L)
      .get("operation").contains("clone"))
    // stats carried: scoped DML on the clone still prunes
    assert(Versioned.fileStats(spark, dst).size == 3)
    // a second clone onto the same target refuses
    intercept[IllegalArgumentException] {
      Versioned.shallowClone(spark, src, dst)
    }
  }

  test("the clone evolves independently: appends/DML land clone-side, " +
    "the source never changes; source evolution is invisible") {
    val dir = tmpDir("clone")
    val src = s"$dir/src"; val dst = s"$dir/dst"
    Versioned.commit((1 to 100).map(i => (i, i * 1L)).toDF("k", "v")
      .coalesce(1), src)
    Versioned.shallowClone(spark, src, dst)
    val srcFiles = Versioned.versionFiles(spark, src).toSet
    // append to the clone: a clone-local segment
    Versioned.commit(Seq((200, 9L)).toDF("k", "v").coalesce(1),
      dst, "append")
    assert(Versioned.read(spark, dst).count() == 101)
    assert(Versioned.read(spark, src).count() == 100)
    // COW delete on the clone rewrites INTO the clone's root and
    // leaves the shared source segment byte-identical
    spark.sql(s"DELETE FROM '$dst' WHERE k <= 10")
    assert(Versioned.read(spark, dst).count() == 91)
    assert(Versioned.versionFiles(spark, src).toSet == srcFiles)
    assert(Versioned.read(spark, src).count() == 100,
      "the source must never observe the clone's DML")
    // source-side evolution is invisible to the clone
    Versioned.commit(Seq((999, 0L)).toDF("k", "v").coalesce(1),
      src, "append")
    assert(Versioned.read(spark, dst).count() == 91)
    // clone vacuum sweeps only clone-local segments; the shared file
    // is still readable from the source afterwards
    Versioned.vacuum(spark, dst, keepLast = 1)
    assert(Versioned.read(spark, src).count() == 101)
    assert(Versioned.read(spark, dst).count() == 91)
  }

  test("bucket layout, column mapping and deletion vectors ride the " +
    "clone; OPTIMIZE localizes it") {
    val dir = tmpDir("clone")
    val src = s"$dir/src"; val dst = s"$dir/dst"
    Versioned.commitBucketed((1L to 40L).map(k => (k, s"r$k"))
      .toDF("k", "v"), src, "k", 4)
    Versioned.renameColumn(spark, src, "v", "label")
    Versioned.deleteWithDv(spark, src, _ => true, col("k") === 7L)
    Versioned.shallowClone(spark, src, dst)
    assert(Versioned.bucketSpec(spark, dst).contains(("k", 4)),
      "the SPJ layout contract must ride the clone")
    assert(Versioned.read(spark, dst).columns.toSeq == Seq("k", "label"))
    assert(Versioned.read(spark, dst).select($"k").as[Long]
      .collect().toSet == (1L to 40L).toSet - 7L,
      "the source's deletion vectors must apply on the clone")
    // OPTIMIZE on the clone rewrites clone-side: after a whole-table
    // compact every referenced file lives under the clone's root
    spark.sql(s"OPTIMIZE '$dst' COMPACT")
    val fs = fsOf(dst)
    val dstAbs = fs.makeQualified(new Path(dst)).toUri.getPath
    assert(Versioned.versionFiles(spark, dst).forall(f =>
      new Path(f).toUri.getPath.startsWith(dstAbs)),
      "OPTIMIZE must localize the clone")
    assert(Versioned.read(spark, dst).select($"k").as[Long]
      .collect().toSet == (1L to 40L).toSet - 7L)
  }
}
