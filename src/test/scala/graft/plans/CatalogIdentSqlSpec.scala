package graft.plans

import graft.SparkSpec
import graft.operators.Versioned

/** Catalog-identifier forms for the maintenance statements that
  * previously accepted only quoted paths: VACUUM, DESCRIBE CHANGES and
  * CLONE each resolve `graft_cat.ns.t` against a registered
  * GraftCatalog's root — the same lowering as the quoted-path spelling,
  * with clean errors for unknown catalogs. */
class CatalogIdentSqlSpec extends SparkSpec {
  import spark.implicits._

  private def register(root: String): String = {
    val cat = "gident" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("VACUUM cat.ns.t RETAIN n VERSIONS / OLDER THAN n HOURS lower " +
    "to the same retention as the quoted-path form") {
    val root = tmpDir("identvac")
    val cat = register(root)
    val t = s"$root/lake/t"
    (0 to 4).foreach { i =>
      Versioned.commit(Seq((i, i.toLong)).toDF("k", "v").coalesce(1), t,
        if (i == 0) "overwrite" else "append")
    }
    val r = spark.sql(s"VACUUM $cat.lake.t RETAIN 2 VERSIONS")
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 3L)))
    assert(Versioned.versions(spark, t) == Seq(3L, 4L))
    // hours form: nothing is old enough -> drops 0, keeps 2
    val h = spark.sql(s"VACUUM $cat.lake.t OLDER THAN 9999 HOURS")
      .collect().head
    assert((h.getLong(0), h.getLong(1)) == ((2L, 0L)))
  }

  test("DESCRIBE CHANGES cat.ns.t FROM a TO b yields the row-level " +
    "feed; CLONE cat.ns.src TO cat.ns.dst clones under the catalog " +
    "root and mixes with quoted paths") {
    val root = tmpDir("identchg")
    val cat = register(root)
    val t = s"$root/lake/src"
    Versioned.commit((1 to 5).map(i => (i, i.toLong)).toDF("k", "v")
      .coalesce(1), t)
    Versioned.commit(Seq((6, 6L)).toDF("k", "v").coalesce(1), t, "append")
    val feed = spark.sql(s"DESCRIBE CHANGES $cat.lake.src FROM 0 TO 1")
    assert(feed.collect().map(r =>
      (r.getInt(0), r.getString(feed.columns.indexOf("_change_type"))))
      .toSeq == Seq((6, "insert")))
    // ident -> ident clone lands under the catalog root
    val r = spark.sql(s"CLONE $cat.lake.src TO $cat.lake.dst").collect().head
    assert(r.getLong(0) == 1L)
    assert(Versioned.read(spark, s"$root/lake/dst").count() == 6)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake.dst")
      .as[Long].head == 6L)
    // mixed spelling: ident source, quoted destination
    val dst2 = tmpDir("identclone2") + "/d"
    spark.sql(s"CLONE $cat.lake.src TO '$dst2' VERSION AS OF 0")
    assert(Versioned.read(spark, dst2).count() == 5)
    // unknown catalog: a clean error, not a path mangle
    val e = intercept[Exception] {
      spark.sql("VACUUM nosuchcat.ns.t RETAIN 1 VERSIONS") }
    assert(e.getMessage.contains("nosuchcat"))
  }

  test("DESCRIBE HISTORY/DETAIL, RESTORE and CONVERT accept catalog " +
    "idents through the same resolver; un-resolvable DESCRIBE " +
    "identifiers still delegate to Spark grammar") {
    val root = tmpDir("identsym")
    val cat = register(root)
    val t = s"$root/lake/t"
    Versioned.commit((1 to 5).map(i => (i, i.toLong)).toDF("k", "v")
      .coalesce(1), t)
    Versioned.commit(Seq((6, 6L)).toDF("k", "v").coalesce(1), t, "append")
    // DESCRIBE HISTORY ident == quoted-path form
    val hist = spark.sql(s"DESCRIBE HISTORY $cat.lake.t").collect()
    assert(hist.map(_.getLong(0)).toSeq.sorted == Seq(0L, 1L))
    assert(spark.sql(s"DESCRIBE HISTORY '$t'").collect().length == 2)
    // DESCRIBE DETAIL ident
    val detDf = spark.sql(s"DESCRIBE DETAIL $cat.lake.t")
    val det = detDf.collect().head
    assert(det.getLong(detDf.columns.indexOf("n_files")) == 2L)
    // RESTORE ident rolls back and commits a new version
    spark.sql(s"RESTORE $cat.lake.t TO VERSION 0")
    assert(Versioned.read(spark, t).count() == 5)
    assert(Versioned.versions(spark, t).last == 2L)
    // CONVERT ident: a plain parquet dir under the catalog root
    val plainDir = s"$root/lake/plain"
    (1 to 7).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1)
      .write.parquet(plainDir)
    spark.sql(s"CONVERT $cat.lake.plain TO GRAFT")
    assert(Versioned.versions(spark, plainDir) == Seq(0L))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake.plain")
      .as[Long].head == 7L)
    // a DESCRIBE over a table literally named "history" keeps
    // delegating to Spark grammar instead of failing in our parser
    spark.sql("CREATE TABLE spark_catalog.default.history (k INT) " +
      "USING parquet")
    try assert(spark.sql("DESCRIBE HISTORY").collect().nonEmpty)
    finally spark.sql("DROP TABLE spark_catalog.default.history")
  }

  test("constraint DDL: ADD CONSTRAINT CHECK / ALTER COLUMN SET NOT " +
    "NULL / DROP CONSTRAINT on quoted paths and catalog idents; " +
    "foreign ALTER TABLE shapes still delegate") {
    val root = tmpDir("identcons")
    val cat = register(root)
    val t = s"$root/lake/t"
    Versioned.commit((1 to 8).map(i => (i.toLong, i * 10L))
      .toDF("k", "cents").coalesce(1), t)
    spark.sql(s"ALTER TABLE '$t' ADD CONSTRAINT cents_pos " +
      "CHECK (cents >= 0)")
    spark.sql(s"ALTER TABLE $cat.lake.t ALTER COLUMN k SET NOT NULL")
    assert(Versioned.invariants(spark, t).map(_.name).toSet ==
      Set("cents_pos", "not_null(k)"))
    intercept[graft.operators.InvariantViolation] {
      Versioned.commit(Seq((9L, -1L)).toDF("k", "cents"), t, "append") }
    spark.sql(s"ALTER TABLE $cat.lake.t DROP CONSTRAINT cents_pos")
    Versioned.commit(Seq((9L, -1L)).toDF("k", "cents"), t, "append")
    assert(Versioned.read(spark, t).count() == 9)
    // a violating ADD refuses through SQL too
    intercept[graft.operators.InvariantViolation] {
      spark.sql(s"ALTER TABLE '$t' ADD CONSTRAINT pos CHECK (cents > 0)") }
    // existing ALTER TABLE DDL keeps delegating (ident ADD COLUMNS)
    spark.sql(s"ALTER TABLE $cat.lake.t ADD COLUMNS (tag STRING)")
    assert(Versioned.read(spark, t).columns.contains("tag"))
  }

  test("CREATE BLOOMFILTER INDEX SQL declares + backfills; FPP " +
    "optional; ident and quoted-path targets") {
    val root = tmpDir("identbloom")
    val cat = register(root)
    val t = s"$root/lake/t"
    Versioned.commit((1 to 50).map(i => (s"u$i", i.toLong))
      .toDF("u", "k").coalesce(1), t)
    Versioned.commit((51 to 100).map(i => (s"u$i", i.toLong))
      .toDF("u", "k").coalesce(1), t, "append")
    val v = spark.sql(
      s"CREATE BLOOMFILTER INDEX ON $cat.lake.t (u, k) FPP 0.01")
      .collect().head.getLong(0)
    assert(v == Versioned.versions(spark, t).last)
    assert(Versioned.bloomRefs(spark, t).size == 2,
      "both committed files must carry sidecar refs")
    // quoted-path spelling, default fpp
    val t2 = s"$root/lake/t2"
    Versioned.commit(Seq(("a", 1L)).toDF("u", "k").coalesce(1), t2)
    spark.sql(s"CREATE BLOOMFILTER INDEX ON '$t2' (u)")
    assert(Versioned.bloomRefs(spark, t2).nonEmpty)
  }
}
