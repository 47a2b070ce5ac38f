package graft.sources

import graft.SparkSpec
import graft.operators.Versioned
import org.apache.spark.sql.SaveMode

/** Catalog-edge hardening: identifier path containment, atomic
  * multi-change ALTER, exclusive CREATE semantics (no check-then-act
  * window), and honest TBLPROPERTIES handling. */
class CatalogHardeningSpec extends SparkSpec {
  import spark.implicits._

  private def mkCatalog(): (String, String) = {
    val base = tmpDir("cathard")
    val cat = "ch" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    (cat, base)
  }

  test("identifier segments cannot escape the lake root: '..', '/' " +
    "and empty segments refuse for reads AND writes") {
    val (cat, base) = mkCatalog()
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), s"$base/lake/t")
    // a backquoted identifier is one SEGMENT — '..' in it must refuse,
    // not resolve to a directory outside the configured root
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.lake.`../../../etc`").collect()
    }
    assert(e.getMessage.contains("lake root"),
      s"expected the containment refusal, got: ${e.getMessage}")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`..`.anywhere (k BIGINT)")
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.lake.`a/b`").collect()
    }
    // sane identifiers keep working
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t")
      .as[Long].head() == 1L)
  }

  test("alterTable is all-or-nothing: a batch carrying one unsupported " +
    "change alters NOTHING, and a multi-change mapping batch lands as " +
    "ONE version") {
    val (cat, base) = mkCatalog()
    val t = s"$base/lake/t"
    Versioned.commit(Seq((1L, "a", "b")).toDF("k", "x", "y"), t)
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lake"), "t")
    import org.apache.spark.sql.connector.catalog.TableChange
    // REPLACE COLUMNS lowers to deletes + adds; an unsupported change
    // (non-nullable add) in the same batch must leave the deletes
    // un-applied — pre-fix the drops committed first and the table
    // lost its columns before the statement failed
    intercept[UnsupportedOperationException] {
      catalog.alterTable(ident,
        TableChange.deleteColumn(Array("x"), false),
        TableChange.deleteColumn(Array("y"), false),
        TableChange.addColumn(Array("z"),
          org.apache.spark.sql.types.IntegerType, false /* NOT NULL */))
    }
    assert(Versioned.read(spark, t).schema.fieldNames.toSeq ==
      Seq("k", "x", "y"), "a failing batch must alter nothing")
    assert(Versioned.versions(spark, t) == Seq(0L),
      "a failing batch must commit nothing")
    // a valid multi-change batch: one commit, both changes visible
    catalog.alterTable(ident,
      TableChange.renameColumn(Array("x"), "x2"),
      TableChange.deleteColumn(Array("y"), false))
    assert(Versioned.versions(spark, t) == Seq(0L, 1L),
      "a multi-change mapping batch must land as ONE version")
    assert(Versioned.read(spark, t).schema.fieldNames.toSeq ==
      Seq("k", "x2"))
    // order-sensitive batch: rename frees the name, drop takes the
    // renamed column — both against the EVOLVING schema
    catalog.alterTable(ident,
      TableChange.renameColumn(Array("x2"), "x3"),
      TableChange.deleteColumn(Array("x3"), false))
    assert(Versioned.read(spark, t).schema.fieldNames.toSeq == Seq("k"))
  }

  test("SaveMode.ErrorIfExists/Ignore ride an ATOMIC create: two " +
    "racing creators can never both land (no destructive overwrite)") {
    // the sequential contracts first
    val t1 = tmpDir("cathard") + "/t1"
    LakeWriter.write(Seq((1L, "a")).toDF("k", "v"), t1,
      SaveMode.ErrorIfExists, format = LakeFormat.Snapshot)
    intercept[Versioned.CreateConflict] {
      LakeWriter.write(Seq((2L, "b")).toDF("k", "v"), t1,
        SaveMode.ErrorIfExists, format = LakeFormat.Snapshot)
    }
    LakeWriter.write(Seq((3L, "c")).toDF("k", "v"), t1,
      SaveMode.Ignore, format = LakeFormat.Snapshot) // no-op
    assert(Versioned.read(spark, t1).as[(Long, String)].collect()
      .toSeq == Seq((1L, "a")), "Ignore/ErrorIfExists must never " +
        "overwrite the existing table")
    assert(Versioned.versions(spark, t1) == Seq(0L))
    // the race: both writers pass any pre-check simultaneously; the
    // commit CAS must let exactly ONE create land
    val t2 = tmpDir("cathard") + "/t2"
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val outcomes =
      try Seq(10L, 20L).map { k =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            gate.await(10, java.util.concurrent.TimeUnit.SECONDS)
            try { Versioned.commit(Seq((k, s"w$k")).toDF("k", "v"), t2,
              "create"); "ok" }
            catch { case _: Versioned.CreateConflict => "conflict" }
          }
        })
      }.map(_.get())
      finally pool.shutdown()
    assert(outcomes.sorted == Seq("conflict", "ok"),
      s"exactly one racing create must win, got $outcomes")
    assert(Versioned.versions(spark, t2) == Seq(0L),
      "the loser must not have landed a second version")
    assert(Versioned.read(spark, t2).count() == 1)
  }

  test("TBLPROPERTIES refuse loudly instead of vanishing; a COMMENT " +
    "rides the create commit's meta") {
    val (cat, base) = mkCatalog()
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"CREATE TABLE $cat.lake.p (k BIGINT) " +
        "TBLPROPERTIES ('retention'='30d')")
    }
    assert(e.getMessage.contains("retention"))
    assert(Versioned.versions(spark, s"$base/lake/p").isEmpty,
      "a refused CREATE must not leave a table behind")
    spark.sql(s"CREATE TABLE $cat.lake.c (k BIGINT) COMMENT 'fact table'")
    val meta = Versioned.readMeta(spark, s"$base/lake/c", 0L)
    assert(meta.get("comment").contains("fact table"))
  }

  test("versionSchema serves read planning without a footer job per " +
    "query: carrier when declared, cached inference otherwise") {
    val t = tmpDir("cathard") + "/t"
    Versioned.commit(Seq((1L, 2.0)).toDF("k", "v").coalesce(1), t)
    val s = Versioned.versionSchema(spark, t)
    assert(s.exists(_.fieldNames.toSeq == Seq("k", "v")))
    // a widened table serves the DECLARED carrier (mergeSchema over
    // the int-vs-long mix would throw — the carrier exists for this)
    spark.conf.set(graft.operators.SchemaEnforce.WidenConf, "true")
    try Versioned.commit(Seq((9999999999L, 3.0, "x"))
      .toDF("k", "v", "w").coalesce(1), t, "append")
    finally spark.conf.unset(graft.operators.SchemaEnforce.WidenConf)
    val widened = Versioned.versionSchema(spark, t)
    assert(widened.exists(_("k").dataType ==
      org.apache.spark.sql.types.LongType))
    assert(widened.exists(_.fieldNames.length == 3))
  }
}
