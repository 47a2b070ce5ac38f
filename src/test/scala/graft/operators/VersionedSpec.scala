package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("overwrite/append commits; every historic version stays readable") {
    val t = tmpDir("vers") + "/t"
    val v0 = Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val v1 = Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append")
    val v2 = Versioned.commit(Seq((9, "z")).toDF("k", "v"), t, "overwrite")
    assert((v0, v1, v2) == (0L, 1L, 2L))
    assert(Versioned.versions(spark, t) == Seq(0L, 1L, 2L))
    assert(Versioned.read(spark, t, Some(0)).count() == 2)
    assert(Versioned.read(spark, t, Some(1)).count() == 3)
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((9, "z")))
  }

  test("a commit landing mid-rewrite REBASES when it only appended: " +
    "its rows survive, the transform is NOT recomputed") {
    import org.apache.spark.sql.functions.col
    val t = tmpDir("rwconf") + "/t"
    Versioned.commit((1L to 3L).toDF("k").coalesce(1), t)
    Versioned.commit((4L to 6L).toDF("k").coalesce(1), t, "append")
    // mayTouch fires once per stats-bearing line DURING the rewrite's
    // compute phase — sneak a commit in on the first call, exactly the
    // window a streaming append would hit
    val sneaked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val transforms = new java.util.concurrent.atomic.AtomicInteger(0)
    val (n, _, _) = Versioned.rewrite(spark, t, { _ =>
      if (sneaked.compareAndSet(false, true))
        Versioned.commit((7L to 9L).toDF("k").coalesce(1), t, "append")
      true
    }, col("k") === 4L, df => {
      transforms.incrementAndGet(); df.where(col("k") =!= 4L)
    }, Map("operation" -> "delete"))
    assert(n == 1)
    assert(Versioned.read(spark, t).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L),
      "the mid-rewrite append must not be lost")
    assert(transforms.get() == 1,
      "an append-only conflict must rebase, not recompute — a " +
        "streaming sink appending every batch would otherwise starve DML")
    assert(Versioned.readMeta(spark, t,
      Versioned.versions(spark, t).last) == Map("operation" -> "delete"))
  }

  test("a commit landing mid-rewrite that MODIFIED a touched file " +
    "forces a recompute: no lost update, no resurrected row") {
    import org.apache.spark.sql.functions.col
    val t = tmpDir("rwconf") + "/t"
    Versioned.commit((1L to 6L).toDF("k").coalesce(1), t) // ONE segment
    val sneaked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val transforms = new java.util.concurrent.atomic.AtomicInteger(0)
    // the sneaked commit DELETES k=5 — rewriting the very segment the
    // outer delete-of-4 is transforming; a rebase would resurrect 5
    val (n, _, _) = Versioned.rewrite(spark, t, { _ =>
      if (sneaked.compareAndSet(false, true))
        Versioned.rewrite(spark, t, _ => true, col("k") === 5L,
          df => df.where(col("k") =!= 5L), Map("operation" -> "delete"))
      true
    }, col("k") === 4L, df => {
      transforms.incrementAndGet(); df.where(col("k") =!= 4L)
    }, Map("operation" -> "delete"))
    assert(n == 1)
    assert(transforms.get() == 2,
      "a touched-file conflict must recompute against the new latest")
    assert(Versioned.read(spark, t).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 6L),
      "both deletes must survive — neither lost nor resurrected")
  }

  test("write-skew guard: a mid-rewrite append MATCHING the delete " +
    "predicate forces a recompute — the late row must die too") {
    import org.apache.spark.sql.functions.col
    val t = tmpDir("rwskew") + "/t"
    Versioned.commit((1L to 6L).toDF("k").coalesce(1), t)
    val sneaked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val transforms = new java.util.concurrent.atomic.AtomicInteger(0)
    val (n, _, _) = Versioned.rewrite(spark, t, { _ =>
      if (sneaked.compareAndSet(false, true))
        Versioned.commit(Seq(4L).toDF("k"), t, "append")
      true
    }, col("k") === 4L, df => {
      transforms.incrementAndGet(); df.where(col("k") =!= 4L)
    }, Map("operation" -> "delete"))
    assert(n == 2L, "the recompute must see the interleaved matching row")
    assert(transforms.get() == 2,
      "a predicate-matching append must NOT rebase — the late row " +
        "would silently escape a delete that commits after it")
    assert(Versioned.read(spark, t).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 5L, 6L))
  }

  test("uncommitted segments and temp manifests are invisible to readers") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)
    val fs = fsOf(t)
    // crashed committer: data segment written, manifest never renamed
    Seq((99, "orphan")).toDF("k", "v")
      .write.parquet(s"$t/data/dead-segment")
    val tmp = new Path(s"$t/_graft_log/.tmp-dead")
    val out = fs.create(tmp, true)
    try out.write("data/dead-segment/garbage.parquet".getBytes) finally out.close()
    assert(Versioned.versions(spark, t) == Seq(0L))
    assert(Versioned.read(spark, t).count() == 1)
  }

  test("losing a commit race retries onto the next version (no clobber)") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)
    val fs = fsOf(t)
    // another writer already owns version 1
    val winner = new Path(s"$t/_graft_log/1.manifest")
    val out = fs.create(winner, false)
    try out.write("".getBytes) finally out.close()
    // bogus empty manifest: readers of v1 fail, but the next commit
    // must land at v2 without overwriting v1
    val v = Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "overwrite")
    assert(v == 2L)
    assert(Versioned.read(spark, t, Some(2)).count() == 1)
  }

  test("vacuum drops old versions' manifests and unreferenced segments, " +
    "survivors keep exact files") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append")
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "overwrite")
    val fs = fsOf(t)
    Versioned.vacuum(spark, t, keepLast = 1)
    assert(Versioned.versions(spark, t) == Seq(2L))
    // v2's single segment survives; v0/v1 segments are gone
    val segs = fs.listStatus(new Path(s"$t/data")).filter(_.isDirectory)
    assert(segs.length == 1, segs.map(_.getPath.getName).mkString(","))
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((3, "c")))
  }

  test("append after vacuum builds on the surviving latest") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append")
    Versioned.vacuum(spark, t, keepLast = 1)
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append")
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("SQL VACUUM ... RETAIN n VERSIONS runs retention and reports " +
    "kept/dropped; other statements still parse") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append")
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "overwrite")
    val row = spark.sql(s"VACUUM '$t' RETAIN 2 VERSIONS").collect()
    assert(row.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)))
    assert(Versioned.versions(spark, t) == Seq(1L, 2L))
    assert(Versioned.read(spark, t, Some(1)).count() == 2)
    // delegate passthrough unaffected
    assert(spark.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)
    // malformed VACUUM surfaces the delegate's ParseException
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(s"VACUUM '$t' KEEP 2")
    }
  }

  test("RESTORE rolls the latest state back as a NEW commit; " +
    "rolled-back versions stay readable") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)           // v0
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append") // v1
    Versioned.commit(Seq((9, "z")).toDF("k", "v"), t)           // v2 overwrite
    val nv = Versioned.restore(spark, t, 0L)
    assert(nv == 3L)
    // latest == v0 content; v2's overwrite still readable as history
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((1, "a")))
    assert(Versioned.read(spark, t, Some(2)).as[(Int, String)]
      .collect().toSet == Set((9, "z")))
    assert(Versioned.readMeta(spark, t, 3L) ==
      Map("operation" -> "restore", "restore_of" -> "0"))
    // restoring a vacuumed version fails loudly, table untouched
    Versioned.vacuum(spark, t, keepLast = 1)
    intercept[Exception] { Versioned.restore(spark, t, 1L) }
    assert(Versioned.versions(spark, t) == Seq(3L))
  }

  test("SQL RESTORE ... TO VERSION and DESCRIBE HISTORY; plain " +
    "DESCRIBE still delegates") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append",
      meta = Map("batch" -> "7"))
    val r = spark.sql(s"RESTORE '$t' TO VERSION 0").collect().head
    assert((r.getLong(0), r.getLong(1)) == (0L, 2L))
    assert(Versioned.read(spark, t).count() == 1)
    val hist = spark.sql(s"DESCRIBE HISTORY '$t'").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(hist.map(r2 => (r2.getLong(2), r2.getString(3))).toSeq ==
      Seq((1L, ""), (2L, "batch=7"),
        (1L, "operation=restore,restore_of=0")))
    // plain DESCRIBE is Spark's own grammar — untouched by the prefix
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("desc_probe")
    assert(spark.sql("DESCRIBE desc_probe").count() == 2)
    // ...including a table literally named "history": the two-word
    // prefix matches but the quoted-path form doesn't, so the
    // statement must DELEGATE, not die in our parser
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("history")
    assert(spark.sql("DESCRIBE history").count() == 2)
    // malformed forms surface the delegate's ParseException
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(s"RESTORE '$t' VERSION 0")
    }
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(s"DESCRIBE HISTORY $t")
    }
  }

  test("change feed: appends feed row-level deltas; an overwrite " +
    "re-snapshots; same-version feed is empty") {
    val t = tmpDir("vers") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)           // v0
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append") // v1
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append") // v2
    assert(Versioned.changes(spark, t, 0, 2).as[(Int, String)]
      .collect().toSet == Set((2, "b"), (3, "c")))
    assert(Versioned.changes(spark, t, 1, 1).count() == 0)
    // an overwrite's "adds" are the whole new snapshot, and every
    // pre-overwrite file shows as removed
    Versioned.commit(Seq((9, "z")).toDF("k", "v"), t)           // v3
    assert(Versioned.changes(spark, t, 2, 3).as[(Int, String)]
      .collect().toSet == Set((9, "z")))
    val (added, removed) = Versioned.changedFiles(spark, t, 2, 3)
    assert(added.size == 1 && removed.size == 3)
    intercept[IllegalArgumentException] {
      Versioned.changes(spark, t, 3, 2)
    }
  }

  test("consumeChanges: cursor advances per consumed delta; a failed " +
    "consumer re-reads the same delta; caught-up is a no-op") {
    val base = tmpDir("vers")
    val t = s"$base/t"; val cur = s"$base/consumer.cursor"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)           // v0
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append") // v1
    var seen = Seq.empty[Int]
    // first run: full table, cursor lands on v1
    val r1 = Versioned.consumeChanges(spark, t, cur) { df =>
      seen = df.select("k").as[Int].collect().toSeq.sorted
    }
    assert(r1 == Some((-1L, 1L)) && seen == Seq(1, 2))
    // caught up: f must not run
    assert(Versioned.consumeChanges(spark, t, cur) { _ =>
      fail("consumer ran while caught up")
    }.isEmpty)
    // new commit -> only the delta; a THROWING consumer leaves the
    // cursor untouched so the delta is re-delivered
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append") // v2
    intercept[RuntimeException] {
      Versioned.consumeChanges(spark, t, cur)(_ =>
        throw new RuntimeException("boom"))
    }
    val r2 = Versioned.consumeChanges(spark, t, cur) { df =>
      seen = df.select("k").as[Int].collect().toSeq.sorted
    }
    assert(r2 == Some((1L, 2L)) && seen == Seq(3))
  }

  test("consumeChanges recovers when the cursor's version is vacuumed: " +
    "full re-read of latest, cursor advances, next run incremental again") {
    val base = tmpDir("vers")
    val t = s"$base/t"; val cur = s"$base/consumer.cursor"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)           // v0
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append") // v1
    var seen = Seq.empty[Int]
    Versioned.consumeChanges(spark, t, cur) { df =>
      seen = df.select("k").as[Int].collect().toSeq.sorted
    } // cursor -> v1
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append") // v2
    Versioned.vacuum(spark, t, keepLast = 1) // drops v0+v1 manifests
    // cursor points at vacuumed v1: must NOT throw — at-least-once
    // full re-read of v2, and the cursor still advances
    val r = Versioned.consumeChanges(spark, t, cur) { df =>
      seen = df.select("k").as[Int].collect().toSeq.sorted
    }
    assert(r == Some((1L, 2L)), r.toString)
    assert(seen == Seq(1, 2, 3), "expected a full-table re-read")
    // recovered: a fresh commit flows incrementally again
    Versioned.commit(Seq((4, "d")).toDF("k", "v"), t, "append") // v3
    val r2 = Versioned.consumeChanges(spark, t, cur) { df =>
      seen = df.select("k").as[Int].collect().toSeq.sorted
    }
    assert(r2 == Some((2L, 3L)) && seen == Seq(4))
  }

  test("history/TIMESTAMP-AS-OF use the manifest's embedded commit " +
    "time, immune to mtime rewrites (table copy / rsync)") {
    val base = tmpDir("vers")
    val t = s"$base/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)           // v0
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "append") // v1
    val hist = Versioned.history(spark, t)
    // sabotage the mtimes the way a copy tool would (v0 newer than v1)
    val log = new java.io.File(s"$t/_graft_log")
    assert(new java.io.File(log, "0.manifest")
      .setLastModified(System.currentTimeMillis() + 3600 * 1000))
    val hist2 = Versioned.history(spark, t)
    assert(hist2.map(h => (h._1, h._2)) == hist.map(h => (h._1, h._2)),
      "commit timestamps must come from the manifest, not file mtime")
    // versionAt at v0's commit time still resolves to v0
    val v0ts = hist.head._2.getTime
    assert(Versioned.versionAt(spark, t, v0ts * 1000L) == 0L)
  }

  test("DSv2 catalog: native VERSION AS OF / TIMESTAMP AS OF time " +
    "travel, SHOW TABLES, read-only writes") {
    val rootDir = tmpDir("cat")
    val t = s"$rootDir/lake/tt"
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t) // v0
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "append") // v1
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.graft.root", rootDir)
    // latest and pinned-version reads through plain SQL
    assert(c.sql("SELECT count(*) FROM graft.lake.tt").head.getLong(0) == 3)
    assert(c.sql("SELECT count(*) FROM graft.lake.tt VERSION AS OF 0")
      .head.getLong(0) == 2)
    // pushdown still applies through the catalog's ParquetTable
    val plan = c.sql("SELECT k FROM graft.lake.tt WHERE k > 1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,1)"),
      plan)
    // TIMESTAMP AS OF: after both commits -> latest; before v0 -> error
    assert(c.sql("SELECT count(*) FROM graft.lake.tt " +
      "TIMESTAMP AS OF '2100-01-01'").head.getLong(0) == 3)
    intercept[Exception] {
      c.sql("SELECT * FROM graft.lake.tt TIMESTAMP AS OF '2000-01-01'")
        .collect()
    }
    // a missing VERSION AS OF is a clean version-not-found error with
    // the committed versions listed — never a leaked FileNotFound
    val e = intercept[Exception] {
      c.sql("SELECT * FROM graft.lake.tt VERSION AS OF 99").collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("committed versions"), msgs)
    // catalog listing sees exactly the committed table
    assert(c.sql("SHOW TABLES IN graft.lake").collect()
      .map(_.getString(1)).toSeq == Seq("tt"))
    // unknown table -> analysis error, not a file-not-found crash
    intercept[org.apache.spark.sql.AnalysisException] {
      c.sql("SELECT * FROM graft.lake.nope").collect()
    }
    // read-only: DDL through the catalog refuses
    intercept[Exception] { c.sql("DROP TABLE graft.lake.tt") }
    assert(Versioned.versions(spark, t) == Seq(0L, 1L))
    // additive schema evolution: an appended segment with a NEW column
    // widens the catalog table's schema (mergeSchema read)
    Versioned.commit(Seq((4, "d", true)).toDF("k", "v", "fresh"),
      t, "append")
    val evolved = c.sql("SELECT * FROM graft.lake.tt")
    assert(evolved.columns.toSet == Set("k", "v", "fresh"))
    assert(evolved.where("fresh").count() == 1 &&
      evolved.where("fresh IS NULL").count() == 3)
  }

  test("DSv2 catalog SQL writes: CREATE TABLE / CTAS / INSERT INTO / " +
    "INSERT OVERWRITE are atomic manifest commits; time travel still " +
    "read-only; DDL still refused") {
    val rootDir = tmpDir("catw")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gw",
      classOf[graft.sources.GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gw.root", rootDir)
    // CREATE TABLE: version 0, empty but readable with the schema
    c.sql("CREATE TABLE gw.lake.w (k INT, v STRING)")
    assert(c.sql("SELECT * FROM gw.lake.w").columns.toSeq == Seq("k", "v"))
    assert(c.sql("SELECT count(*) FROM gw.lake.w").head.getLong(0) == 0)
    intercept[Exception] { c.sql("CREATE TABLE gw.lake.w (k INT)") }
    // INSERT INTO appends a version; INSERT OVERWRITE re-snapshots
    c.sql("INSERT INTO gw.lake.w VALUES (1, 'a'), (2, 'b')")
    c.sql("INSERT INTO gw.lake.w VALUES (3, 'c')")
    assert(c.sql("SELECT count(*) FROM gw.lake.w").head.getLong(0) == 3)
    c.sql("INSERT OVERWRITE gw.lake.w VALUES (9, 'z')")
    assert(c.sql("SELECT v FROM gw.lake.w").collect()
      .map(_.getString(0)).toSeq == Seq("z"))
    // every write was one commit: create + 2 inserts + overwrite = v0..v3
    val t = s"$rootDir/lake/w"
    assert(Versioned.versions(spark, t) == Seq(0L, 1L, 2L, 3L))
    // ...and history is intact: the pre-overwrite state is still there
    assert(Versioned.read(spark, t, Some(2)).count() == 3)
    // CTAS: create + write in one statement
    c.sql("CREATE TABLE gw.lake.w2 AS SELECT k * 10 AS k10 FROM gw.lake.w")
    assert(c.sql("SELECT k10 FROM gw.lake.w2").head.getInt(0) == 90)
    // time-travel loads stay read-only
    intercept[Exception] {
      c.sql("INSERT INTO gw.lake.w VERSION AS OF 0 VALUES (5, 'x')")
    }
    // destructive DDL still refused (additive ADD COLUMN and
    // mapping-backed RENAME/DROP COLUMN are separately supported —
    // see the schema-evolution and ColumnMappingSpec tests)
    intercept[Exception] { c.sql("DROP TABLE gw.lake.w") }
    intercept[Exception] {
      c.sql("ALTER TABLE gw.lake.w ALTER COLUMN v TYPE INT")
    }
    assert(Versioned.versions(spark, t).size == 4)
    // DELETE FROM: surviving rows committed as a new version, SQL NULL
    // semantics (NULL predicate keeps the row), history intact
    c.sql("INSERT INTO gw.lake.w VALUES (1, 'a'), (2, NULL)") // v4
    c.sql("DELETE FROM gw.lake.w WHERE v = 'z'")              // v5
    assert(c.sql("SELECT k FROM gw.lake.w ORDER BY k").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 2)) // 'z' gone; NULL row kept
    assert(Versioned.readMeta(spark, t, 5L) ==
      Map("operation" -> "delete"))
    assert(Versioned.read(spark, t, Some(4L)).count() == 3) // pre-delete
  }

  test("concurrent committers: the optimistic rename race loses no " +
    "commit — every appender lands a distinct version, all rows survive") {
    val t = tmpDir("vers") + "/t"
    val n = 8
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val versions = Await.result(Future.sequence((0 until n).map(i =>
        Future {
          Versioned.commit(Seq((i, s"v$i")).toDF("k", "v"), t, "append")
        })), 180.seconds)
      // losers retried one version higher: exactly versions 0..n-1
      assert(versions.sorted == (0L until n.toLong), versions.toString)
      // no append lost to the race, none duplicated
      assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
        (0 until n).map(i => (i, s"v$i")).toSet)
    } finally pool.shutdown()
  }

  test("property: random commit/append/restore/rename/vacuum sequences " +
    "keep every readable version equal to the model — column name " +
    "included (ScalaCheck over the delta log + column mapping)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val opGen = Gen.oneOf(
      Gen.choose(1, 3).map(n => ("overwrite", n)),
      Gen.choose(1, 3).map(n => ("append", n)),
      Gen.choose(0, 10).map(i => ("restore", i)),
      Gen.const(("rename", 0)),
      Gen.choose(1, 3).map(k => ("vacuum", k)))
    val seqGen = Gen.listOfN(8, opGen)
    var case_ = 0
    val prop = Prop.forAll(seqGen) { ops =>
      case_ += 1
      val t = tmpDir("versprop") + s"/t$case_"
      // model: version -> (logical column name, sorted row multiset).
      // Renames are metadata-only commits; appends must speak the
      // CURRENT logical name; an overwrite materializes back to "x";
      // restore reinstates the target's name along with its rows.
      val model = scala.collection.mutable.Map.empty[Long, (String, Seq[Int])]
      var next = 0
      var renameN = 0
      def latest: Option[(String, Seq[Int])] =
        model.keys.toSeq.sorted.lastOption.map(model)
      ops.foreach {
        case ("overwrite", n) =>
          val rows = (next until next + n).toSeq; next += n
          val v = Versioned.commit(rows.toDF("x"), t)
          model(v) = ("x", rows.sorted)
        case ("append", n) =>
          val rows = (next until next + n).toSeq; next += n
          val (nm, base) = latest.getOrElse(("x", Seq.empty))
          val v = Versioned.commit(rows.toDF(nm), t, "append")
          model(v) = (nm, (base ++ rows).sorted)
        case ("rename", _) =>
          latest.foreach { case (nm, rows) =>
            renameN += 1
            val newNm = s"x$renameN"
            val v = Versioned.renameColumn(spark, t, nm, newNm)
            model(v) = (newNm, rows)
          }
        case ("restore", i) =>
          val live = model.keys.toSeq.sorted
          if (live.nonEmpty) {
            val target = live(i % live.size)
            val v = Versioned.restore(spark, t, target)
            model(v) = model(target)
          }
        case ("vacuum", k) =>
          if (model.nonEmpty) {
            Versioned.vacuum(spark, t, k)
            val keep = model.keys.toSeq.sorted.takeRight(k).toSet
            model.keys.toSeq.filterNot(keep).foreach(model.remove)
          }
      }
      model.forall { case (v, (nm, rows)) =>
        val df = Versioned.read(spark, t, Some(v))
        df.columns.toSeq == Seq(nm) &&
          df.collect().map(_.getInt(0)).sorted.toSeq == rows
      } && (Versioned.versions(spark, t).sorted == model.keys.toSeq.sorted)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("time-based VACUUM drops versions older than the horizon, " +
    "always keeps the latest, and sweeps their segments") {
    val t = tmpDir("vach") + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), t)            // v0
    Versioned.commit(Seq((2, "b")).toDF("k", "v"), t, "overwrite") // v1
    Versioned.commit(Seq((3, "c")).toDF("k", "v"), t, "overwrite") // v2
    val fs = fsOf(t)
    // age v0 and v1: rewrite their manifests' embedded commit time to
    // two days ago (the authoritative clock for OLDER THAN)
    val old = System.currentTimeMillis - 48L * 3600000L
    Seq(0L, 1L).foreach { v =>
      val p = new Path(s"$t/_graft_log/$v.manifest")
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val aged = body.replaceAll(
        "#commit_ts_ms=\\d+", s"#commit_ts_ms=$old")
      fs.delete(p, false)
      val out = fs.create(p, false)
      try out.write(aged.getBytes("UTF-8")) finally out.close()
    }
    Versioned.clearManifestCache() // out-of-band manifest edits
    val r = spark.sql(s"VACUUM '$t' OLDER THAN 24 HOURS").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)), r.toString)
    assert(Versioned.versions(spark, t) == Seq(2L))
    assert(Versioned.read(spark, t).count() == 1)
    // dropped versions' segments are swept
    val dataDirs = fs.listStatus(new Path(s"$t/data")).length
    assert(dataDirs == 1, s"expected 1 surviving segment dir, got $dataDirs")
    // a quiet table: even an ancient latest survives
    val t2 = tmpDir("vach") + "/t2"
    Versioned.commit(Seq((9, "z")).toDF("k", "v"), t2)
    val p2 = new Path(s"$t2/_graft_log/0.manifest")
    val in2 = fs.open(p2)
    val body2 = try scala.io.Source.fromInputStream(in2, "UTF-8").mkString
    finally in2.close()
    fs.delete(p2, false)
    val out2 = fs.create(p2, false)
    try out2.write(body2.replaceAll("#commit_ts_ms=\\d+",
      s"#commit_ts_ms=$old").getBytes("UTF-8"))
    finally out2.close()
    Versioned.clearManifestCache() // out-of-band manifest edit
    assert(Versioned.vacuumOlderThan(spark, t2, 1.0) == 0)
    assert(Versioned.read(spark, t2).count() == 1)
  }

  test("ALTER TABLE ADD COLUMN: additive evolution as a commit — new " +
    "column NULL on old rows, time travel reads the old schema, " +
    "bucketed layout survives; destructive shapes still refuse") {
    val base = tmpDir("addcol")
    val cat = "ac" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    val t = s"$base/lake/t"
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t) // v0
    spark.sql(s"ALTER TABLE $cat.lake.t ADD COLUMN score DOUBLE") // v1
    assert(Versioned.versions(spark, t) == Seq(0L, 1L))
    assert(Versioned.readMeta(spark, t, 1L)("operation") == "add_columns")
    // old rows read NULL; inserts can fill it
    assert(spark.sql(s"SELECT score FROM $cat.lake.t")
      .collect().forall(_.isNullAt(0)))
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (3, 'c', 9.5)") // v2
    assert(spark.sql(
      s"SELECT score FROM $cat.lake.t WHERE k = 3").as[Double].head() == 9.5)
    // time travel to before the DDL: the column does not exist
    assert(!spark.sql(s"SELECT * FROM $cat.lake.t VERSION AS OF 0")
      .columns.contains("score"))
    // duplicate / destructive shapes refuse without committing
    val vs = Versioned.versions(spark, t)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake.t ADD COLUMN score INT")
    }
    intercept[Exception] { // type change: still refused
      spark.sql(s"ALTER TABLE $cat.lake.t ALTER COLUMN v TYPE INT")
    }
    assert(Versioned.versions(spark, t) == vs)
    // bucketed table: the carrier keeps the declared layout
    val tb = s"$base/lake/b"
    Versioned.commitBucketed((1L to 8L).map(i => (i, s"x$i"))
      .toDF("k", "v"), tb, "k", 4)
    spark.sql(s"ALTER TABLE $cat.lake.b ADD COLUMN tag STRING")
    assert(Versioned.bucketSpec(spark, tb).contains(("k", 4)),
      "schema-evolution DDL must not de-bucket the table")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.b")
      .as[Long].head() == 8L)
  }
}
