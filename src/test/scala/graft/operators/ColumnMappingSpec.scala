package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Column mapping (RENAME/DROP COLUMN on snapshot tables): metadata-
  * only schema surgery over stable PHYSICAL column names — no
  * committed segment changes meaning, time travel reads each version
  * under its own names, and the DML stats-scoping stays keyed
  * correctly through a rename. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(t: String) = Versioned.versionFiles(spark, t).toSet

  test("RENAME COLUMN is a metadata-only commit: same data files, new " +
    "name on reads, time travel reads the old name") {
    val t = tmpDir("cmap") + "/t"
    Versioned.commit((1 to 10).map(i => (i, i * 100L)).toDF("k", "amount")
      .coalesce(1), t) // v0
    val before = dataFiles(t)
    val v = Versioned.renameColumn(spark, t, "amount", "price")
    assert(v == 1L)
    assert(dataFiles(t) == before, "a rename must move zero bytes of data")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "price"))
    assert(Versioned.read(spark, t).agg(sum($"price")).as[Long].head ==
      (1 to 10).map(_ * 100L).sum)
    assert(Versioned.read(spark, t, Some(0)).columns.toSeq ==
      Seq("k", "amount"), "time travel must read the pre-rename name")
    // renaming to a taken name or from a missing one refuses
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, t, "k", "price") }
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, t, "ghost", "x") }
  }

  test("appends after a rename write PHYSICAL names: old and new " +
    "segments stay one coherent table under the logical view") {
    val t = tmpDir("cmap") + "/t"
    Versioned.commit((1 to 5).map(i => (i, s"r$i")).toDF("k", "v")
      .coalesce(1), t)
    Versioned.renameColumn(spark, t, "v", "label")
    // the appended df speaks the LOGICAL schema
    Versioned.commit(Seq((6, "r6")).toDF("k", "label").coalesce(1),
      t, "append")
    val rows = Versioned.read(spark, t)
      .select($"k", $"label").as[(Int, String)].collect().toSet
    assert(rows == (1 to 6).map(i => (i, s"r$i")).toSet)
    // the appended FILE carries the physical name (v), not label
    val newest = Versioned.read(spark, t, Some(2)).schema
    assert(newest.fieldNames.toSeq == Seq("k", "label"))
    val physical = spark.read.option("mergeSchema", "true")
      .parquet(dataFiles(t).toSeq: _*).schema.fieldNames.toSet
    assert(physical == Set("k", "v"),
      s"on-disk names must be stable, got $physical")
  }

  test("stats-scoped DML after a rename: carried segments stay carried " +
    "(pruning keyed correctly), matched rows transform logically") {
    val t = tmpDir("cmap") + "/t"
    // two segments with disjoint k ranges, each with footer stats
    Versioned.commit((1 to 100).map(i => (i, i * 10L)).toDF("id", "amount")
      .coalesce(1), t)
    Versioned.commit((101 to 200).map(i => (i, i * 10L)).toDF("id", "amount")
      .coalesce(1), t, "append")
    Versioned.renameColumn(spark, t, "id", "row_id")
    // delete via the LOGICAL name; stats scoping must translate
    // row_id -> id to read the manifest bounds — and carry the
    // provably-untouched first segment without opening it
    val pushed = graft.sources.StatsPruner.pushableFilters(
      Versioned.read(spark, t).where($"row_id" > 150),
      Versioned.columnMapping(spark, t).logicalOf)
    assert(pushed.nonEmpty, "the probe predicate must lower (in the " +
      "logical name space, translated back through the mapping)")
    val (n, rewritten, carried) = Versioned.rewrite(spark, t,
      st => pushed.forall(graft.sources.StatsPruner.mayMatch(st, _)),
      $"row_id" > 150, df => df.where($"row_id" <= 150),
      Map("operation" -> "delete"))
    assert(n == 50L)
    assert(rewritten == 1L && carried == 1L,
      "the 1-100 segment must be carried via translated stats, " +
        s"got rewritten=$rewritten carried=$carried")
    assert(Versioned.read(spark, t).count() == 150)
    assert(Versioned.read(spark, t).columns.toSeq == Seq("row_id", "amount"),
      "the rewrite must carry the mapping forward")
    // merge-on-read under the mapping too
    assert(Versioned.deleteWithDv(spark, t, _ => true, $"row_id" === 7) == 1L)
    assert(Versioned.read(spark, t).count() == 149)
  }

  test("DROP COLUMN hides without touching segments; re-adding the " +
    "name is refused (tombstoned physical); time travel still sees it") {
    val t = tmpDir("cmap") + "/t"
    Versioned.commit((1 to 8).map(i => (i, s"secret$i", i * 2))
      .toDF("k", "pii", "score").coalesce(1), t)
    val before = dataFiles(t)
    Versioned.dropColumn(spark, t, "pii")
    assert(dataFiles(t) == before)
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "score"))
    assert(Versioned.read(spark, t, Some(0)).columns.toSeq ==
      Seq("k", "pii", "score"), "time travel must still see the column")
    // appending data that maps onto the tombstone is refused loudly
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((9, "x", 18)).toDF("k", "pii", "score"),
        t, "append")
    }
    assert(e.getMessage.contains("tombstoned"))
    // rename after drop composes; restore reinstates the mapping state
    Versioned.renameColumn(spark, t, "score", "points")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "points"))
    Versioned.restore(spark, t, 0)
    assert(Versioned.read(spark, t).columns.toSeq ==
      Seq("k", "pii", "score"), "restore must reinstate v0's view")
  }

  test("an overwrite (and whole-table OPTIMIZE) MATERIALIZES the " +
    "mapping: logical names land on disk and the mapping clears") {
    val t = tmpDir("cmap") + "/t"
    Versioned.commit((1 to 10).map(i => (i, i * 1L)).toDF("k", "qty")
      .coalesce(1), t)
    Versioned.renameColumn(spark, t, "qty", "quantity")
    assert(!Versioned.columnMapping(spark, t).isEmpty)
    // overwrite with the logical view (what any reader computes)
    Versioned.commit(Versioned.read(spark, t), t, "overwrite")
    assert(Versioned.columnMapping(spark, t).isEmpty,
      "an overwrite must clear the mapping")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "quantity"))
    val physical = spark.read.parquet(dataFiles(t).toSeq: _*)
      .schema.fieldNames.toSet
    assert(physical == Set("k", "quantity"),
      "the overwrite must write logical names physically")
  }

  test("the change feeds speak the logical view: file-level changes " +
    "and the row-level feed both surface renamed names") {
    val t = tmpDir("cmap") + "/t"
    Versioned.commit(Seq((1, 10L)).toDF("k", "amt").coalesce(1), t) // v0
    Versioned.renameColumn(spark, t, "amt", "price")                // v1
    Versioned.commit(Seq((2, 20L)).toDF("k", "price").coalesce(1),
      t, "append")                                                  // v2
    val fileFeed = Versioned.changes(spark, t, 1, 2)
    assert(fileFeed.columns.toSeq == Seq("k", "price"),
      "the appended file carries the physical name — the feed must " +
        "project it to the logical view")
    assert(fileFeed.select($"k", $"price").as[(Int, Long)]
      .collect().toSet == Set((2, 20L)))
    val rowFeed = Versioned.rowChanges(spark, t, 0, 2)
    assert(rowFeed.columns.take(2).toSeq == Seq("k", "price"))
    assert(rowFeed.where($"_change_type" === "insert").count() == 1,
      "the rename itself is metadata-only: no change rows")
  }

  test("partial compaction carries the mapping through the physical " +
    "space; whole-table OPTIMIZE materializes and clears it") {
    val t = tmpDir("cmap") + "/t"
    Versioned.commit((1 to 2000).map(i => (i, i * 3L)).toDF("k", "amt")
      .coalesce(1), t)
    (1 to 3).foreach(i => Versioned.commit(
      Seq((10000 + i, 1L)).toDF("k", "amt").coalesce(1), t, "append"))
    Versioned.renameColumn(spark, t, "amt", "value")
    // threshold compaction: small files fold, mapping must survive
    spark.conf.set("spark.graft.optimize.minFileBytes", (1L << 20).toString)
    try assert(spark.sql(s"OPTIMIZE '$t' COMPACT").count() == 1)
    finally spark.conf.unset("spark.graft.optimize.minFileBytes")
    assert(!Versioned.columnMapping(spark, t).isEmpty,
      "partial compaction must carry the mapping")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "value"))
    assert(Versioned.read(spark, t).count() == 2003)
    // whole-table OPTIMIZE: reads logical, writes logical, clears
    spark.sql(s"OPTIMIZE '$t' COMPACT")
    assert(Versioned.columnMapping(spark, t).isEmpty,
      "a whole-table rewrite must materialize logical names")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "value"))
    assert(Versioned.read(spark, t).count() == 2003)
  }

  test("re-ADDing a dropped or rename-occupied name gets a FRESH " +
    "physical slot — old on-disk data never resurrects") {
    val root = tmpDir("cmapreadd")
    val cat = "cmapre" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val td = s"$root/lake/t"
    Versioned.commit((1 to 5).map(i => (i, s"secret$i", i * 2))
      .toDF("k", "pii", "score").coalesce(1), td)
    spark.sql(s"ALTER TABLE $cat.lake.t DROP COLUMN pii")
    // the re-added pii is a NEW column: NULL on every old row even
    // though the old files still physically carry a pii column
    spark.sql(s"ALTER TABLE $cat.lake.t ADD COLUMN pii STRING")
    assert(spark.sql(s"SELECT count(pii) AS n FROM $cat.lake.t")
      .as[Long].head == 0L,
      "dropped data must NOT resurrect into the re-added column")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (6, 12, 'fresh')")
    val got = spark.sql(
      s"SELECT k, pii FROM $cat.lake.t WHERE pii IS NOT NULL")
      .as[(Int, String)].collect().toSet
    assert(got == Set((6, "fresh")))
    // rename-occupied slot: after k -> row_id, a new column named k
    // must not alias row_id's on-disk data
    spark.sql(s"ALTER TABLE $cat.lake.t RENAME COLUMN k TO row_id")
    spark.sql(s"ALTER TABLE $cat.lake.t ADD COLUMN k BIGINT")
    assert(spark.sql(s"SELECT count(k) AS n FROM $cat.lake.t")
      .as[Long].head == 0L,
      "the re-added k must be independent of row_id's physical data")
    assert(spark.sql(s"SELECT sum(row_id) AS s FROM $cat.lake.t")
      .as[Long].head == (1 to 6).sum.toLong)
  }

  test("catalog SQL: ALTER TABLE RENAME/DROP COLUMN, reads and " +
    "INSERTs under the new name, VERSION AS OF under the old") {
    val root = tmpDir("cmapcat")
    val cat = "cmapcat" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val td = s"$root/lake/t"
    Versioned.commit((1 to 20).map(i => (i, i * 5L)).toDF("k", "amt")
      .coalesce(1), td)
    spark.sql(s"ALTER TABLE $cat.lake.t RENAME COLUMN amt TO price")
    assert(spark.sql(s"SELECT sum(price) AS s FROM $cat.lake.t")
      .as[Long].head == (1 to 20).map(_ * 5L).sum)
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (21, CAST(105 AS LONG))")
    assert(spark.sql(s"SELECT sum(price) AS s FROM $cat.lake.t")
      .as[Long].head == (1 to 21).map(_ * 5L).sum)
    assert(spark.sql(s"SELECT * FROM $cat.lake.t VERSION AS OF 0")
      .columns.toSeq == Seq("k", "amt"))
    // DROP via SQL, then the hidden column is gone from SELECT *
    spark.sql(s"ALTER TABLE $cat.lake.t DROP COLUMN k")
    assert(spark.sql(s"SELECT * FROM $cat.lake.t").columns.toSeq ==
      Seq("price"))
    // catalog DELETE on the renamed table routes through the mapping
    spark.sql(s"DELETE FROM $cat.lake.t WHERE price > 50")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake.t")
      .as[Long].head == 10L)
  }

  test("renaming a column whose PHYSICAL name cannot ride the meta " +
    "grammar fails loudly instead of committing a colmap entry " +
    "fromMeta would silently drop") {
    val t = tmpDir("cmapbad") + "/t"
    // ':' is parquet-legal but a colmap separator — the physical name
    // of a never-renamed column is its own on-disk name
    Versioned.commit((1 to 3).map(i => (i, i.toString)).toDF("k", "a:b")
      .coalesce(1), t)
    val before = Versioned.versions(spark, t)
    val e = intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, t, "a:b", "good")
    }
    assert(e.getMessage.contains("meta grammar"))
    assert(Versioned.versions(spark, t) == before,
      "a refused rename must commit nothing")
    assert(Versioned.read(spark, t).columns.contains("a:b"))
  }

  test("commitIfAppendRebase refuses to rebase on a MAPPED table even " +
    "when called directly — the snapshot speaks logical names, the " +
    "carried appended lines physical names; mixing them is corruption") {
    val t = tmpDir("cmapreb") + "/t"
    Versioned.commit((1 to 5).map(i => (i, i * 1L)).toDF("k", "v")
      .coalesce(1), t) // v0
    Versioned.renameColumn(spark, t, "v", "label") // v1: mapped
    val base = Versioned.versions(spark, t).last
    // interleave an append whose stats a guard could prove disjoint —
    // WITHOUT the mapping check this interleave would rebase cleanly
    Versioned.commit(Seq((100, 100L)).toDF("k", "label").coalesce(1),
      t, "append") // v2
    val out = Versioned.commitIfAppendRebase(
      Seq((1, 999L)).toDF("k", "label").coalesce(1), t,
      Map("operation" -> "merge"), base,
      guard = () => Seq(org.apache.spark.sql.sources.EqualTo("k", -5)))
    assert(out.isEmpty, "a mapped table must never rebase")
    assert(Versioned.versions(spark, t).size == 3, "no commit may land")
    assert(Versioned.read(spark, t).count() == 6)
  }
}
