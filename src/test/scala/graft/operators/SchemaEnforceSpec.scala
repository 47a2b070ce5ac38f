package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-time schema enforcement on snapshot appends: type-conflicting
  * appends refuse BEFORE any segment lands (the writer fails, not the
  * next reader), lossless-narrower appends upcast in place, and the
  * opt-in widening mode commits a declared-schema carrier that every
  * read path (time travel, DML, OPTIMIZE, catalog SQL, CDF) resolves
  * under — while the narrow committed files are never rewritten. */
class SchemaEnforceSpec extends SparkSpec {
  import spark.implicits._

  private def withWiden[A](f: => A): A = {
    spark.conf.set(SchemaEnforce.WidenConf, "true")
    try f finally spark.conf.unset(SchemaEnforce.WidenConf)
  }

  test("a type-conflicting append is REFUSED with a named error and " +
    "commits nothing — no segment, no version, later reads intact") {
    val t = tmpDir("enforce") + "/t"
    Versioned.commit((1 to 5).map(i => (i, i * 1.0)).toDF("k", "price")
      .coalesce(1), t)
    val before = Versioned.versions(spark, t)
    val e = intercept[SchemaConflict] {
      Versioned.commit(Seq((6, "oops")).toDF("k", "price").coalesce(1),
        t, "append")
    }
    assert(e.getMessage.contains("price") &&
      e.getMessage.contains("string") && e.getMessage.contains("double"))
    assert(Versioned.versions(spark, t) == before)
    assert(Versioned.read(spark, t).count() == 5, "reads must stay clean")
    // long onto int without the opt-in also refuses, but names the fix
    val e2 = intercept[SchemaConflict] {
      Versioned.commit(Seq((7L, 7.0)).toDF("k", "price").coalesce(1),
        t, "append")
    }
    assert(e2.getMessage.contains(SchemaEnforce.WidenConf))
  }

  test("missing and extra columns stay accepted (additive evolution), " +
    "and a losslessly NARROWER append upcasts to the table's type " +
    "without changing the table") {
    val t = tmpDir("enforce") + "/t"
    Versioned.commit((1 to 3).map(i => (i.toLong, i * 1.0, s"r$i"))
      .toDF("k", "v", "tag").coalesce(1), t)
    // missing column (no tag) and an extra new column both commit
    Versioned.commit(Seq((4, 4.0f, true)).toDF("k", "v", "flag")
      .coalesce(1), t, "append") // int k -> long, float v -> double
    val out = Versioned.read(spark, t)
    assert(out.schema("k").dataType == LongType &&
      out.schema("v").dataType == DoubleType,
      s"narrow append must upcast, got ${out.schema.simpleString}")
    assert(out.count() == 4 && out.columns.toSet ==
      Set("k", "v", "tag", "flag"))
    assert(out.where($"k" === 4L && $"v" === 4.0).count() == 1)
    assert(Versioned.schemaCarrier(spark, t).isEmpty,
      "store-assignment upcasts must not spawn a carrier")
  }

  test("opt-in widening: a wider append commits a declared-schema " +
    "carrier; narrow committed files are NOT rewritten and every " +
    "read resolves wide — the pre-fix poison read is gone") {
    val t = tmpDir("widen") + "/t"
    Versioned.commit((1 to 10).map(i => (i, i * 1.0f)).toDF("k", "v")
      .coalesce(1), t) // int k, float v
    val filesBefore = Versioned.versionFiles(spark, t).toSet
    withWiden {
      Versioned.commit(Seq((100L, 100.0)).toDF("k", "v").coalesce(1),
        t, "append")
    }
    assert(Versioned.versionFiles(spark, t).toSet.intersect(filesBefore)
      == filesBefore, "widening must not rewrite committed files")
    val carrier = Versioned.schemaCarrier(spark, t)
    assert(carrier.exists(s => s("k").dataType == LongType &&
      s("v").dataType == DoubleType), s"carrier: $carrier")
    val out = Versioned.read(spark, t)
    assert(out.schema("k").dataType == LongType &&
      out.schema("v").dataType == DoubleType)
    assert(out.agg(sum($"k")).as[Long].head == (1 to 10).sum + 100L)
    // a later NARROW append upcasts into the widened table
    Versioned.commit(Seq((200, 200.0f)).toDF("k", "v").coalesce(1),
      t, "append")
    assert(Versioned.read(spark, t).where($"k" === 200L).count() == 1)
    // time travel: v0 still reads its own narrow schema
    assert(Versioned.read(spark, t, Some(0)).schema("k").dataType ==
      IntegerType)
  }

  test("the carrier survives the full lifecycle: DML (COW and DV), " +
    "OPTIMIZE compaction, metadata DDL, RESTORE and CLONE all " +
    "re-carry it; an overwrite materializes and drops it") {
    val t = tmpDir("widenlife") + "/t"
    Versioned.commit((1 to 20).map(i => (i, i * 1.0)).toDF("k", "v")
      .coalesce(1), t)
    withWiden {
      Versioned.commit(Seq((1000L, 0.5)).toDF("k", "v").coalesce(1),
        t, "append")
    }
    // COW UPDATE
    spark.sql(s"UPDATE '$t' SET v = v + 1 WHERE k <= 5")
    assert(Versioned.schemaCarrier(spark, t).isDefined, "COW must carry")
    // DV DELETE
    Versioned.deleteWithDv(spark, t, _ => true, $"k" === 7L)
    assert(Versioned.schemaCarrier(spark, t).isDefined, "DV must carry")
    // metadata DDL
    Versioned.renameColumn(spark, t, "v", "price")
    assert(Versioned.schemaCarrier(spark, t).isDefined, "DDL must carry")
    val sum0 = Versioned.read(spark, t).agg(sum($"price")).as[Double].head
    // partial compaction
    Versioned.compactSmall(spark, t, 1L << 20)
    assert(Versioned.schemaCarrier(spark, t).isDefined,
      "compactSmall must carry (it may leave big narrow files in place)")
    assert(Versioned.read(spark, t).agg(sum($"price")).as[Double].head
      == sum0)
    // restore to the widened version keeps its carrier
    val widenedV = 1L
    Versioned.restore(spark, t, widenedV)
    assert(Versioned.schemaCarrier(spark, t).isDefined, "RESTORE carries")
    assert(Versioned.read(spark, t).schema("k").dataType == LongType)
    // clone keeps the carrier
    val dst = tmpDir("widenclone") + "/t"
    Versioned.shallowClone(spark, t, dst)
    assert(Versioned.schemaCarrier(spark, dst).isDefined, "CLONE carries")
    assert(Versioned.read(spark, dst).schema("k").dataType == LongType)
    // overwrite materializes: fresh wide files, carrier gone
    Versioned.commit(Versioned.read(spark, t), t, "overwrite")
    assert(Versioned.schemaCarrier(spark, t).isEmpty,
      "an overwrite snapshots wide files — the carrier must drop")
    assert(Versioned.read(spark, t).schema("k").dataType == LongType)
  }

  test("catalog SQL reads and row-level CDF speak the widened schema") {
    val root = tmpDir("widencat")
    val cat = "widencat" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val td = s"$root/lake/t"
    Versioned.commit((1 to 6).map(i => (i, i * 1.0f)).toDF("k", "v")
      .coalesce(1), td)
    withWiden {
      Versioned.commit(Seq((7L, 7.0)).toDF("k", "v").coalesce(1),
        td, "append")
    }
    val viaSql = spark.sql(s"SELECT sum(k) AS s FROM $cat.lake.t")
    assert(viaSql.as[Long].head == (1 to 7).sum)
    assert(spark.sql(s"SELECT * FROM $cat.lake.t").schema("k").dataType
      == LongType)
    // row CDF across the widening commit: the appended row surfaces
    // as an insert under the wide schema, old files diff cleanly
    val feed = Versioned.rowChanges(spark, td, 0L, 1L)
    assert(feed.where($"_change_type" === "insert").count() == 1)
    assert(feed.schema("k").dataType == LongType)
  }

  test("a carrier-bearing append racing an interleaved column-adding " +
    "append REPAIRS its carrier: the interleave's column survives in " +
    "the declared schema instead of being hidden from carrier reads") {
    val t = tmpDir("widenrace") + "/t"
    Versioned.commit((1 to 6).map(i => (i, i * 1.0f)).toDF("k", "v")
      .coalesce(1), t)
    withWiden {
      Versioned.commit(Seq((100L, 1.0)).toDF("k", "v").coalesce(1),
        t, "append") // widened: carrier in play
    }
    // hook: between OUR enforcement (which read the current carrier)
    // and OUR commit, another append lands carrying a NEW column —
    // our pre-computed carrier knows nothing about `tag`
    val self = Thread.currentThread()
    Versioned.commitTestHook = () => if (Thread.currentThread() eq self) {
      Versioned.commitTestHook = () => () // the inner commit must not recurse
      Versioned.commit(Seq((200L, 2.0, "x")).toDF("k", "v", "tag")
        .coalesce(1), t, "append")
      ()
    }
    try Versioned.commit(Seq((300L, 3.0)).toDF("k", "v").coalesce(1),
      t, "append")
    finally Versioned.commitTestHook = () => ()
    val carrier = Versioned.schemaCarrier(spark, t)
    assert(carrier.exists(_.fieldNames.exists(_.equalsIgnoreCase("tag"))),
      s"the interleave's column must survive in the carrier: $carrier")
    val out = Versioned.read(spark, t)
    assert(out.columns.map(_.toLowerCase).contains("tag"))
    assert(out.where($"tag" === "x").count() == 1)
    assert(out.count() == 9)
    assert(out.schema("k").dataType == LongType)
  }

  test("widening across the byte/short chain and enforcement on the " +
    "BUCKETED commit path") {
    val t = tmpDir("widenchain") + "/t"
    Versioned.commit((1 to 4).map(i =>
        (i.toByte, i.toShort)).toDF("b", "s").coalesce(1), t)
    withWiden {
      Versioned.commit(Seq((5, 5L)).toDF("b", "s").coalesce(1),
        t, "append") // byte->int, short->long
    }
    val sch = Versioned.read(spark, t).schema
    assert(sch("b").dataType == IntegerType &&
      sch("s").dataType == LongType)
    assert(Versioned.read(spark, t).agg(sum($"s")).as[Long].head == 15L)
    // bucketed append path enforces too
    val bt = tmpDir("widenbkt") + "/t"
    Versioned.commitBucketed((1L to 8L).map(i => (i, i * 1.0))
      .toDF("k", "v"), bt, "k", 2)
    intercept[SchemaConflict] {
      Versioned.commitBucketed(Seq((9L, "bad")).toDF("k", "v"),
        bt, "k", 2, "append")
    }
    assert(Versioned.read(spark, bt).count() == 8)
  }
}
