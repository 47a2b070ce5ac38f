package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Row-level change feed reconstructed from manifest diffs
  * ([[Versioned.rowChanges]]): the Delta-CDF contract — a consumer
  * sees exactly the rows a commit changed, tagged insert / delete /
  * update_preimage / update_postimage, with carried rows (whole
  * carried files AND carried rows inside rewritten segments)
  * cancelling out of the diff. */
class RowCdfSpec extends SparkSpec {
  import spark.implicits._

  private def changed(t: String, from: Long, to: Long) =
    Versioned.rowChanges(spark, t, from, to)
      .select(col("k").as[Int], col("v").as[String],
        col("_change_type").as[String], col("_commit_version").as[Long])
      .collect().toSet

  test("append commits surface as inserts; an empty range is empty " +
    "with the CDF schema") {
    val t = tmpDir("cdf") + "/t"
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append")
    assert(changed(t, 0, 1) == Set((3, "c", "insert", 1L)))
    val empty = Versioned.rowChanges(spark, t, 1, 1)
    assert(empty.count() == 0)
    assert(empty.columns.takeRight(2).toSeq ==
      Seq("_change_type", "_commit_version"))
  }

  test("COW DELETE: only the deleted rows surface, carried rows inside " +
    "the rewritten segment cancel") {
    val t = tmpDir("cdf") + "/t"
    // ONE segment holding all rows — the rewrite replaces the whole
    // file, but only the dropped row may appear in the feed
    Versioned.commit((1 to 6).map(i => (i, s"r$i")).toDF("k", "v")
      .coalesce(1), t)
    Versioned.rewrite(spark, t, _ => true, col("k") === 3,
      df => df.where(col("k") =!= 3), Map("operation" -> "delete"))
    assert(changed(t, 0, 1) == Set((3, "r3", "delete", 1L)))
  }

  test("COW UPDATE: changed rows surface as preimage/postimage pairs; " +
    "a bit-identical no-op row emits nothing") {
    import org.apache.spark.sql.functions.{concat, lit, when}
    val t = tmpDir("cdf") + "/t"
    Versioned.commit((1 to 4).map(i => (i, s"r$i")).toDF("k", "v")
      .coalesce(1), t)
    // "update" k<=2, but make k=2's assignment a no-op (new value =
    // old value): CDF must report only k=1
    Versioned.rewrite(spark, t, _ => true, col("k") <= 2,
      df => df.withColumn("v",
        when(col("k") === 1, concat(col("v"), lit("!")))
          .otherwise(col("v"))),
      Map("operation" -> "update"))
    assert(changed(t, 0, 1) == Set(
      (1, "r1", "update_preimage", 1L),
      (1, "r1!", "update_postimage", 1L)))
  }

  test("OPTIMIZE emits no change rows; overwrite diffs generically; a " +
    "multi-commit range unions with per-commit versions") {
    val t = tmpDir("cdf") + "/t"
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v")
      .repartition(2), t)
    // v1: compaction — same rows, new layout: NOT a change
    val all = Versioned.read(spark, t)
    Versioned.commit(all.coalesce(1), t, "overwrite",
      Map("operation" -> "optimize"))
    // v2: overwrite replacing (2,b) with (3,c) while carrying (1,a)
    Versioned.commit(Seq((1, "a"), (3, "c")).toDF("k", "v"), t,
      "overwrite")
    // v3: plain append
    Versioned.commit(Seq((4, "d")).toDF("k", "v"), t, "append")
    assert(changed(t, 0, 1) == Set.empty)
    assert(changed(t, 0, 3) == Set(
      (2, "b", "delete", 2L), (3, "c", "insert", 2L),
      (4, "d", "insert", 3L)))
  }

  test("DESCRIBE CHANGES SQL surfaces the same change rows; plain " +
    "DESCRIBE statements still delegate") {
    val t = tmpDir("cdfsql") + "/t"
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1), t)
    spark.sql(s"DELETE FROM '$t' WHERE k = 1")
    val rows = spark.sql(s"DESCRIBE CHANGES '$t' FROM 0 TO 1")
      .select(col("k").as[Int], col("v").as[String],
        col("_change_type").as[String], col("_commit_version").as[Long])
      .collect().toSet
    assert(rows == Set((1, "a", "delete", 1L)))
    // non-matching DESCRIBE forms stay Spark's (a table named changes)
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("changes")
    assert(spark.sql("DESCRIBE changes").count() > 0)
  }

  test("RESTORE that drops dv refs resurrects rows as inserts — the " +
    "feed fold tracks the snapshot diff through the rollback") {
    val t = tmpDir("cdf") + "/t"
    Versioned.commit(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .coalesce(1), t)                                         // v0
    Versioned.deleteWithDv(spark, t, _ => true, col("k") === 2) // v1
    Versioned.restore(spark, t, 0) // v2: same files, dv refs dropped
    assert(changed(t, 1, 2) == Set((2, "b", "insert", 2L)),
      "the resurrected row must surface — the file set is unchanged, " +
        "so only the lost-ref diff can see it")
    assert(changed(t, 0, 2) ==
      Set((2, "b", "delete", 1L), (2, "b", "insert", 2L)))
  }

  test("a many-version range folds with a bounded (log-depth) plan; " +
    "an above-cap range fails with a named error, not a plan explosion") {
    val t = tmpDir("cdf") + "/t"
    Versioned.commit(Seq((0, "v0")).toDF("k", "v").coalesce(1), t)
    (1 to 30).foreach(i =>
      Versioned.commit(Seq((i, s"v$i")).toDF("k", "v").coalesce(1),
        t, "append"))
    val feed = Versioned.rowChanges(spark, t, 0, 30)
    assert(feed.count() == 30)
    assert(feed.select(col("_commit_version")).distinct().count() == 30)
    // plan depth grows like log(range), not range: count Union nodes'
    // maximum nesting on the analyzed plan
    def depth(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      if (p.children.isEmpty) 1 else 1 + p.children.map(depth).max
    assert(depth(feed.queryExecution.logical) < 30,
      "a 30-step range must not produce a 30-deep left spine")
    val e = intercept[IllegalArgumentException] {
      Versioned.rowChanges(spark, t, 0, Versioned.MaxChangeRange + 1)
    }
    assert(e.getMessage.contains("change-feed range"))
  }

  test("a table that already carries a _change_type column is refused") {
    val t = tmpDir("cdf") + "/t"
    Versioned.commit(Seq((1, "x")).toDF("k", "_change_type"), t)
    Versioned.commit(Seq((2, "y")).toDF("k", "_change_type"), t, "append")
    intercept[IllegalArgumentException] {
      Versioned.rowChanges(spark, t, 0, 1)
    }
  }
}
