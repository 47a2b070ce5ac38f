package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.{Clustering, Compaction}

class OptimizeSqlSpec extends SparkSpec {
  import spark.implicits._

  test("OPTIMIZE ... ZORDER BY rewrites the table z-clustered, content " +
    "intact, both columns' per-file spans bounded") {
    val loc = tmpDir("optz") + "/t"
    spark.sql("DROP TABLE IF EXISTS opt_z")
    Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
      .repartition(6)
      .write.option("path", loc).saveAsTable("opt_z")
    try {
      val before = spark.table("opt_z").collect().toSet
      spark.sql("OPTIMIZE opt_z ZORDER BY (l_orderkey, l_partkey) INTO 8 FILES")
      assert(Compaction.fileCount(spark, loc) == 8)
      assert(spark.table("opt_z").collect().toSet == before)
      assert(Clustering.avgFileSpan(spark, loc, "l_orderkey") < 0.7)
      assert(Clustering.avgFileSpan(spark, loc, "l_partkey") < 0.7)
    } finally spark.sql("DROP TABLE IF EXISTS opt_z")
  }

  test("OPTIMIZE ... COMPACT rewrites many files to the target count") {
    val loc = tmpDir("optc") + "/t"
    spark.sql("DROP TABLE IF EXISTS opt_c")
    Tables(spark, sfDir, "nation").repartition(5)
      .write.option("path", loc).saveAsTable("opt_c")
    try {
      assert(Compaction.fileCount(spark, loc) == 5)
      val before = spark.table("opt_c").collect().toSet
      spark.sql("OPTIMIZE opt_c COMPACT")
      assert(Compaction.fileCount(spark, loc) == 1)
      assert(spark.table("opt_c").collect().toSet == before)
    } finally spark.sql("DROP TABLE IF EXISTS opt_c")
  }

  test("OPTIMIZE COMPACT on a two-level partitioned table compacts " +
    "leaf dirs over the threshold and leaves small leaves untouched") {
    val loc = tmpDir("optc2") + "/t"
    spark.sql("DROP TABLE IF EXISTS opt_c2")
    spark.sql(s"""CREATE TABLE opt_c2 (k BIGINT, y INT, m INT)
      USING parquet PARTITIONED BY (y, m) LOCATION '$loc'""")
    try {
      // leaf (2024,1): 4 files; leaf (2024,2): 1 file
      (0 until 4).foreach { i =>
        Seq((i.toLong, 2024, 1)).toDF("k", "y", "m")
          .coalesce(1).write.mode("append").insertInto("opt_c2")
      }
      Seq((99L, 2024, 2)).toDF("k", "y", "m")
        .coalesce(1).write.mode("append").insertInto("opt_c2")
      val smallLeaf = new java.io.File(s"$loc/y=2024/m=2").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      val before = spark.table("opt_c2").collect().toSet

      spark.sql("OPTIMIZE opt_c2 COMPACT")
      assert(Compaction.fileCount(spark, s"$loc/y=2024/m=1") == 1)
      val after = new java.io.File(s"$loc/y=2024/m=2").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      assert(after == smallLeaf, "already-small leaf was rewritten")
      assert(spark.table("opt_c2").collect().toSet == before)
    } finally spark.sql("DROP TABLE IF EXISTS opt_c2")
  }

  test("OPTIMIZE ZORDER on a partitioned table clusters WITHIN each " +
    "leaf; content intact, spans bounded per leaf") {
    val loc = tmpDir("optz2") + "/t"
    spark.sql("DROP TABLE IF EXISTS opt_z2")
    Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity",
        ($"l_orderkey" % 2).cast("int").as("part"))
      .repartition(4)
      .write.partitionBy("part").option("path", loc).saveAsTable("opt_z2")
    try {
      val before = spark.table("opt_z2").collect().toSet
      spark.sql("OPTIMIZE opt_z2 ZORDER BY (l_orderkey, l_partkey) INTO 8 FILES")
      assert(spark.table("opt_z2").collect().toSet == before)
      // spans bounded well below 1.0 on BOTH columns in every leaf (a
      // single-column sort would leave the second column's span ~1.0;
      // exact values vary with z-curve segment alignment, hence 0.8)
      Seq(0, 1).foreach { p =>
        val leaf = s"$loc/part=$p"
        assert(Compaction.fileCount(spark, leaf) == 8)
        assert(Clustering.avgFileSpan(spark, leaf, "l_orderkey") < 0.8,
          s"leaf $p l_orderkey")
        assert(Clustering.avgFileSpan(spark, leaf, "l_partkey") < 0.8,
          s"leaf $p l_partkey")
      }
    } finally spark.sql("DROP TABLE IF EXISTS opt_z2")
  }

  test("OPTIMIZE '<path>' COMPACT/ZORDER on a snapshot table commits a " +
    "new version; pre-optimize layout stays time-travelable") {
    import graft.operators.Versioned
    val t = tmpDir("optv") + "/t"
    val df = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    // a year of coalesce(1)-per-chunk appends -> many small segments
    Versioned.commit(df.repartition(3), t)                       // v0
    Versioned.commit(df.limit(100).repartition(2), t, "append")  // v1
    val before = Versioned.read(spark, t).collect().toSet
    assert(Versioned.versionFiles(spark, t).size == 5)
    val r = spark.sql(s"OPTIMIZE '$t' COMPACT").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 5L, 1L))
    assert(Versioned.read(spark, t).collect().toSet == before)
    // pre-optimize version still readable; manifest records the op
    assert(Versioned.versionFiles(spark, t, Some(1L)).size == 5)
    assert(Versioned.readMeta(spark, t, 2L) ==
      Map("operation" -> "optimize"))
    // z-order form: content intact, clustered spans bounded
    val r2 = spark
      .sql(s"OPTIMIZE '$t' ZORDER BY (l_orderkey, l_partkey) INTO 8 FILES")
      .collect().head
    assert(r2.getLong(0) == 3L && r2.getLong(2) == 8L)
    assert(Versioned.read(spark, t).collect().toSet == before)
    val seg = Versioned.versionFiles(spark, t).head
      .split("/").dropRight(1).mkString("/")
    assert(Clustering.avgFileSpan(spark, seg, "l_orderkey") < 0.7)
  }

  test("OPTIMIZE ZORDER on an EMPTY bucketed table: the schema carrier " +
    "keeps the user schema (no phantom __z column) and the bucket " +
    "declaration survives") {
    val dir = tmpDir("zoemptyb") + "/tbl"
    val empty = spark.range(0)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    graft.operators.Versioned.commitBucketed(empty, dir, "k", 4)
    spark.sql(s"OPTIMIZE '$dir' ZORDER BY (v)")
    val df = graft.operators.Versioned.read(spark, dir)
    // pre-fix, the empty-commit carrier was written before the z-sort
    // temp column was dropped, so every later read surfaced __z
    assert(df.columns.toSeq == Seq("k", "v"), df.columns.mkString(","))
    assert(df.count() == 0)
    assert(graft.operators.Versioned.bucketSpec(spark, dir)
      .contains(("k", 4)))
  }

  test("commitIf refuses a stale base (the OPTIMIZE lost-update " +
    "guard): conflicting commit preserved, staged segment cleaned up") {
    import graft.operators.Versioned
    val t = tmpDir("optconflict") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t) // v0
    // a writer lands between OPTIMIZE's read (base=0) and its commit
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append") // v1
    val stale = Versioned.commitIf(Seq((9, "z")).toDF("k", "v"), t,
      "overwrite", Map("operation" -> "optimize"), expectedBase = 0L)
    assert(stale.isEmpty, "stale-base commit must be refused")
    // v1's row is NOT lost, no new version, and the refused attempt's
    // segment directory was swept
    assert(Versioned.versions(spark, t) == Seq(0L, 1L))
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    val dataDir = new org.apache.hadoop.fs.Path(s"$t/data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(dataDir).length == 2, "orphan segment left behind")
    // with the CURRENT base it commits normally
    val ok = Versioned.commitIf(Seq((3, "c")).toDF("k", "v"), t,
      "append", Map.empty, expectedBase = 1L)
    assert(ok.contains(2L))
    assert(Versioned.read(spark, t).count() == 3)
    // end-to-end: OPTIMIZE itself still succeeds post-conflict-window
    val r = spark.sql(s"OPTIMIZE '$t' COMPACT").collect().head
    assert(r.getLong(0) == 3L)
    assert(Versioned.read(spark, t).count() == 3)
  }

  test("UPDATE rejects duplicate assignment targets instead of " +
    "silently keeping the last one") {
    import graft.operators.Versioned
    val t = tmpDir("dupset") + "/t"
    Versioned.commit(Seq((1, 10.0)).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE '$t' SET v = 1, v = 2")
    }
    assert(e.getMessage.contains("duplicate UPDATE assignment"))
    // case-insensitive duplicates too; table untouched either way
    intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE '$t' SET v = 1, V = 2")
    }
    assert(Versioned.versions(spark, t) == Seq(0L))
    assert(Versioned.read(spark, t).as[(Int, Double)].collect().toSet ==
      Set((1, 10.0)))
  }

  test("UPDATE with a WHERE keyword INSIDE a string literal parses: " +
    "the SET/WHERE split is quote-aware, not a regex grab") {
    import graft.operators.Versioned
    val t = tmpDir("updlit") + "/t"
    Versioned.commit(Seq((1, "old"), (2, "old")).toDF("k", "msg"), t)
    spark.sql(s"UPDATE '$t' SET msg = 'x WHERE 1' WHERE k = 2")
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((1, "old"), (2, "x WHERE 1")))
    // and a parenthesized subquery-style WHERE inside the SET
    // expression stays with the assignment
    spark.sql(s"UPDATE '$t' SET msg = concat('w', 'here') WHERE k = 1")
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((1, "where"), (2, "x WHERE 1")))
  }

  test("SET/WHERE split is backtick-aware and boundary-relaxed: a " +
    "backquoted `…where…` name stays with the SET, WHERE( splits") {
    // parser-level pins (splitTopLevelWhere is package-visible):
    // 1. a backquoted identifier CONTAINING 'where' must not split —
    //    pre-fix this produced a malformed-assignment error
    assert(GraftSqlParser.splitTopLevelWhere("`a where b` = 1") ==
      (("`a where b` = 1", None)))
    assert(GraftSqlParser.splitTopLevelWhere(
      "`a where b` = 1 WHERE k = 2") ==
      (("`a where b` = 1", Some("k = 2"))))
    // 2. WHERE followed by '(' is a keyword boundary
    assert(GraftSqlParser.splitTopLevelWhere("v = 1 WHERE(k = 2)") ==
      (("v = 1", Some("(k = 2)"))))
    // 3. an identifier PREFIXED by where must still not split
    assert(GraftSqlParser.splitTopLevelWhere("v = whereabouts") ==
      (("v = whereabouts", None)))
    // 4. comma-split is backtick-aware too
    assert(GraftSqlParser.splitTopLevel("`a,b` = 1, c = 2") ==
      Seq("`a,b` = 1", "c = 2"))
    // and end-to-end: WHERE( boundary through a real statement
    import graft.operators.Versioned
    val t = tmpDir("updtick") + "/t"
    Versioned.commit(Seq((1, 10L), (2, 20L)).toDF("k", "v"), t)
    spark.sql(s"UPDATE '$t' SET v = 99 WHERE(k = 2)")
    assert(Versioned.read(spark, t).as[(Int, Long)].collect().toSet ==
      Set((1, 10L), (2, 99L)))
  }

  test("UPDATE/DELETE on a snapshot path: simultaneous assignments, " +
    "NULL-predicate rows kept, each statement one time-travelable version") {
    import graft.operators.Versioned
    val t = tmpDir("dmlv") + "/t"
    Versioned.commit(Seq((1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, null))
      .toDF("k", "v", "tag"), t) // v0
    // swap-style simultaneous SET: v sees the ORIGINAL k, k the ORIGINAL v
    val up = spark.sql(
      s"UPDATE '$t' SET v = v + k, k = k * 10 WHERE tag IS NOT NULL")
      .collect().head
    assert(up.getLong(0) == 2)
    assert(Versioned.read(spark, t).as[(Int, Double, String)]
      .collect().toSet ==
      Set((10, 11.0, "a"), (20, 22.0, "b"), (3, 30.0, null)))
    // DELETE with a predicate that is NULL for the tag-less row: kept
    val del = spark.sql(s"DELETE FROM '$t' WHERE tag = 'a'").collect().head
    assert(del.getLong(0) == 1)
    assert(Versioned.read(spark, t).count() == 2)
    // two DML statements -> versions 1 and 2, both operations recorded,
    // v0 still readable
    assert(Versioned.versions(spark, t) == Seq(0L, 1L, 2L))
    assert(Versioned.readMeta(spark, t, 1L) == Map("operation" -> "update"))
    assert(Versioned.readMeta(spark, t, 2L) == Map("operation" -> "delete"))
    assert(Versioned.read(spark, t, Some(0L)).count() == 3)
    // unknown SET column is a loud error, table untouched
    intercept[Exception] { spark.sql(s"UPDATE '$t' SET nope = 1") }
    assert(Versioned.versions(spark, t).size == 3)
    // ordinary table-name DML is untouched by the path interception
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("dml_probe")
    assert(spark.sql("SELECT * FROM dml_probe").count() == 1)
  }

  test("copy-on-write DML: segments the stats prove untouched are " +
    "carried forward verbatim, never rewritten") {
    import graft.operators.Versioned
    val t = tmpDir("cowv") + "/t"
    def seg(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i.toLong, s"u$i")).toDF("k", "name").coalesce(1)
    Versioned.commit(seg(1, 3), t) // v0
    Versioned.commit(seg(4, 6), t, "append")
    Versioned.commit(seg(7, 9), t, "append") // v2: three 1-file segments
    val before = Versioned.versionFiles(spark, t).toSet
    assert(before.size == 3)

    // DELETE hits one segment: the other two PHYSICAL files are
    // carried into the new version, one new segment replaces the third
    val del = spark.sql(s"DELETE FROM '$t' WHERE k = 8").collect().head
    assert(del.getLong(0) == 1)
    val after = Versioned.versionFiles(spark, t).toSet
    assert((before & after).size == 2, "two segments carried verbatim")
    assert((after -- before).size == 1, "one rewritten segment")
    assert(Versioned.read(spark, t).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L))
    // carried lines keep their data-skipping stats
    val stats = Versioned.fileStats(spark, t)
    assert((before & after).forall(stats.contains))

    // a provably-no-match DELETE is metadata-only: same file set
    val v = Versioned.versions(spark, t).last
    val none = spark.sql(s"DELETE FROM '$t' WHERE k = 100").collect().head
    assert(none.getLong(0) == 0)
    assert(Versioned.versions(spark, t).last == v + 1)
    assert(Versioned.versionFiles(spark, t).toSet == after)

    // UPDATE scoped the same way, and the predicate may be stringly
    val preUpd = Versioned.versionFiles(spark, t).toSet
    val upd = spark.sql(s"UPDATE '$t' SET name = 'zz' WHERE k = 2")
      .collect().head
    assert(upd.getLong(0) == 1)
    val postUpd = Versioned.versionFiles(spark, t).toSet
    assert((preUpd & postUpd).size == 2, "update rewrote one segment")
    assert(Versioned.read(spark, t).where("k = 2").select("name")
      .as[String].head() == "zz")

    // evolved column: the SET works even when the touched file
    // predates the column (read under the full table schema)
    Versioned.commit(Seq((10L, "u10", "x")).toDF("k", "name", "extra")
      .coalesce(1), t, "append")
    val updEvo = spark.sql(s"UPDATE '$t' SET extra = 'y' WHERE k = 1")
      .collect().head
    assert(updEvo.getLong(0) == 1)
    val evo = Versioned.read(spark, t).where("k = 1 OR k = 10")
      .select("k", "extra").as[(Long, String)].collect().toSet
    assert(evo == Set((1L, "y"), (10L, "x")))
  }

  test("DESCRIBE DETAIL summarizes the latest version from manifest " +
    "metadata: stats-backed row count, null once a file lacks stats") {
    import graft.operators.Versioned
    val t = tmpDir("detv") + "/t"
    Versioned.commit((1L to 5L).toDF("k").coalesce(1), t)
    Versioned.commit((6L to 8L).toDF("k").coalesce(1), t, "append")
    val d = spark.sql(s"DESCRIBE DETAIL '$t'").collect().head
    assert(d.getString(0) == t)
    assert(d.getLong(1) == 1L && d.getLong(2) == 2L) // version, n_versions
    assert(d.getLong(3) == 2L && d.getLong(4) > 0L) // n_files, size_bytes
    assert(d.getLong(5) == 8L, "row count from stats, no scan")
    assert(d.isNullAt(6), "unbucketed table reports no bucket_spec")
    assert(d.isNullAt(7) && d.isNullAt(8) && d.isNullAt(9),
      "no declared contract -> NULL constraints/bloom/widened columns")
    // a bucketed table SURFACES its layout contract
    val tb = tmpDir("detb") + "/t"
    Versioned.commitBucketed((1L to 20L).toDF("k"), tb, "k", 4)
    assert(spark.sql(s"DESCRIBE DETAIL '$tb'").collect().head
      .getString(6) == "bucket(4, k)")
    // ... and a table's declared CONTRACT surfaces alongside it
    val tc = tmpDir("detc") + "/t"
    Versioned.commit((1L to 9L).map(i => (i, i * 2.0f)).toDF("k", "v")
      .coalesce(1), tc)
    spark.sql(s"ALTER TABLE '$tc' ADD CONSTRAINT v_pos CHECK (v >= 0)")
    spark.sql(s"CREATE BLOOMFILTER INDEX ON '$tc' (k)")
    spark.conf.set(graft.operators.SchemaEnforce.WidenConf, "true")
    try Versioned.commit(Seq((10L, 1.0)).toDF("k", "v").coalesce(1),
      tc, "append")
    finally spark.conf.unset(graft.operators.SchemaEnforce.WidenConf)
    val dc = spark.sql(s"DESCRIBE DETAIL '$tc'").collect().head
    assert(dc.getString(7) == "v_pos", dc.toString)
    assert(dc.getString(8).startsWith("bloom(k)"), dc.toString)
    assert(dc.getString(9).toLowerCase.contains("v double"),
      "the widened declared schema must surface: " + dc.getString(9))
    // strip one file line's stats -> row count degrades to NULL
    val root = new org.apache.hadoop.fs.Path(t)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(root, "_graft_log/1.manifest")
    val in = hfs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    var stripped = false
    val doctored = lines.map { l =>
      // a delta manifest's file lines ride inside A\t actions
      if (!l.startsWith("#") && !stripped) { stripped = true
        if (l.startsWith("A\t")) "A\t" + l.substring(2).split('\t').head
        else l.split('\t').head } else l
    }
    val out = hfs.create(mf, true)
    try out.write(doctored.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    graft.operators.Versioned.clearManifestCache() // out-of-band edit
    assert(spark.sql(s"DESCRIBE DETAIL '$t'").collect().head.isNullAt(5))
    // plain DESCRIBE still delegates to Spark's own grammar
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("det_probe")
    assert(spark.sql("DESCRIBE det_probe").count() > 0)
  }

  test("VACUUM after copy-on-write keeps carried files shared across " +
    "versions and sweeps only the rewritten-away segment") {
    import graft.operators.Versioned
    val t = tmpDir("cowvac") + "/t"
    def seg(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i.toLong, s"u$i")).toDF("k", "name").coalesce(1)
    Versioned.commit(seg(1, 3), t)
    Versioned.commit(seg(4, 6), t, "append")
    Versioned.commit(seg(7, 9), t, "append") // v2
    val preCow = Versioned.versionFiles(spark, t).toSet
    spark.sql(s"DELETE FROM '$t' WHERE k = 8") // v3: 2 carried + 1 new
    val postCow = Versioned.versionFiles(spark, t).toSet
    val rewrittenAway = (preCow -- postCow).head
    spark.sql(s"VACUUM '$t' RETAIN 1 VERSIONS")
    // carried files survive (still referenced by the kept manifest);
    // the pre-delete 7-9 segment is unreferenced and swept
    val fs = new java.io.File(rewrittenAway.stripPrefix("file:"))
    assert(!fs.exists, s"swept: $rewrittenAway")
    assert(Versioned.versionFiles(spark, t).toSet == postCow)
    assert(Versioned.read(spark, t).count() == 8)
  }

  test("DSv2 DELETE through the catalog scopes by stats, including " +
    "external date/timestamp filter values") {
    import graft.operators.Versioned
    val rootDir = tmpDir("cowcat")
    val t = s"$rootDir/lake/ct"
    def seg(day: Int) = (1 to 3).map(i => (day * 10L + i,
      java.sql.Timestamp.valueOf(f"2024-06-$day%02d 0$i%d:00:00")))
      .toDF("k", "ts").coalesce(1)
    Versioned.commit(seg(1), t)
    Versioned.commit(seg(2), t, "append")
    Versioned.commit(seg(3), t, "append")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gd", classOf[graft.sources.GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gd.root", rootDir)
    val before = Versioned.versionFiles(c, t).toSet
    c.sql("DELETE FROM gd.lake.ct WHERE ts < TIMESTAMP '2024-06-02 00:00:00'")
    val after = Versioned.versionFiles(c, t).toSet
    assert((before & after).size == 2,
      "day-2 and day-3 segments carried; day-1 segment rewritten away")
    assert(Versioned.read(c, t).count() == 6)
    assert(c.sql("SELECT min(k) FROM gd.lake.ct").head.getLong(0) == 21L)
  }

  test("malformed OPTIMIZE fails with a parse error; ordinary SQL is " +
    "untouched by the delegating parser") {
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE nation FROBNICATE")
    }
    assert(e.getMessage != null)
    // delegate path still parses everything else
    assert(spark.sql("SELECT 1 AS one").head().getInt(0) == 1)
  }
}
