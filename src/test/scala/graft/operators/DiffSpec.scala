package graft.operators

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies inserts, deletes, updates; unchanged " +
    "dropped unless requested; null-safe column compare") {
    val before = Seq(
      (1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, None: Option[String], 3.0), (4L, Some("d"), 4.0))
      .toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), 1.0),                 // unchanged
      (2L, Some("B"), 2.0),                 // updated (s)
      (3L, None: Option[String], 3.0),      // unchanged (null <=> null)
      (5L, Some("e"), 5.0))                 // inserted; k=4 deleted
      .toDF("k", "s", "v")

    val d = Diff.snapshotDiff(before, after, Seq("k"))
      .select($"k", $"change_type").as[(Long, String)].collect().toSet
    assert(d == Set((2L, "updated"), (4L, "deleted"), (5L, "inserted")))

    val all = Diff.snapshotDiff(before, after, Seq("k"), keepUnchanged = true)
    assert(all.count() == 5)
    // deleted rows carry the before-version's data columns
    val deleted = all.where($"change_type" === "deleted").head()
    assert(deleted.getAs[String]("s") == "d" && deleted.getAs[Double]("v") == 4.0)
    // updated rows carry the after-version's data columns
    val updated = all.where($"change_type" === "updated").head()
    assert(updated.getAs[String]("s") == "B")
  }
}
