package graft.sources

import graft.SparkSpec
import graft.operators.SegmentStats.{ColStats, FileStats}
import graft.operators.Versioned
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.{sources => f}

class StatsPruningSpec extends SparkSpec {
  import spark.implicits._

  private val fs = FileStats(10, Map(
    "k" -> ColStats('l', Some("5"), Some("20"), Some(0)),
    "name" -> ColStats('s', Some("delta"), Some("mango"), Some(2)),
    "score" -> ColStats('d', Some("0.5"), Some("2.5"), Some(0)),
    "flag" -> ColStats('b', Some("1"), Some("1"), Some(3)),
    "allnull" -> ColStats('l', None, None, Some(10))))
  private def keep(flt: f.Filter): Boolean = StatsPruner.mayMatch(fs, flt)

  test("mayMatch: range, null-count, all-null, absent-column and " +
    "composite semantics") {
    // long ranges
    assert(!keep(f.EqualTo("k", 25)) && keep(f.EqualTo("k", 7)))
    assert(!keep(f.GreaterThan("k", 20L)) && keep(f.GreaterThanOrEqual("k", 20)))
    assert(!keep(f.LessThan("k", 5)) && keep(f.LessThanOrEqual("k", 5)))
    // string ranges (byte order)
    assert(!keep(f.EqualTo("name", "zebra")) && keep(f.EqualTo("name", "hello")))
    assert(!keep(f.StringStartsWith("name", "z")), "max below prefix")
    assert(!keep(f.StringStartsWith("name", "cz")), "min's prefix above")
    assert(keep(f.StringStartsWith("name", "de")), "min itself matches")
    assert(keep(f.StringStartsWith("name", "ma")))
    // float/double columns never range-prune (NaN soundness)…
    assert(keep(f.EqualTo("score", 99.0)))
    // …but null counts still do
    assert(!keep(f.IsNull("score")))
    // all-NULL column: comparisons prune, IS NULL keeps
    assert(!keep(f.EqualTo("allnull", 3)) && !keep(f.IsNotNull("allnull")))
    assert(keep(f.IsNull("allnull")))
    // column absent from the file's schema = all-NULL (evolution)
    assert(!keep(f.EqualTo("extra", "x")) && keep(f.IsNull("extra")))
    // nested/dotted names are opaque, never treated as absent
    assert(keep(f.EqualTo("s.x", 1)))
    // booleans
    assert(!keep(f.EqualTo("flag", false)) && keep(f.EqualTo("flag", true)))
    // composites
    assert(!keep(f.And(f.EqualTo("k", 7), f.EqualTo("name", "zebra"))))
    assert(keep(f.Or(f.EqualTo("k", 99), f.EqualTo("name", "hello"))))
    assert(!keep(f.Or(f.EqualTo("k", 99), f.EqualTo("k", 0))))
    assert(keep(f.In("k", Array[Any](1, 7))))
    assert(!keep(f.In("k", Array[Any](1, 99))))
    // unknown value type and un-modeled shapes keep the file
    assert(keep(f.EqualTo("k", "weird")) && keep(f.Not(f.EqualTo("k", 25))))
    // null-safe equality
    assert(keep(f.EqualNullSafe("allnull", null)))
    assert(!keep(f.EqualNullSafe("k", null)))
    // an empty file satisfies nothing
    assert(!StatsPruner.mayMatch(FileStats(0, Map.empty), f.IsNull("k")))
  }

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec =>
        (b.scan match {
          case r: RuntimeSkippingScan => r.delegateScan
          case s => s
        }).asInstanceOf[ParquetScan].fileIndex.inputFiles.length
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("catalog scans skip segments whose manifest stats exclude the " +
    "predicate — and stay row-group-pushdown-capable") {
    val rootDir = tmpDir("prune")
    val t = s"$rootDir/lake/pt"
    def seg(lo: Int, hi: Int) = (lo to hi).map(i =>
      (i.toLong, s"u$i", java.sql.Timestamp.valueOf(f"2024-06-$i%02d 00:00:00")))
      .toDF("k", "name", "ts").coalesce(1)
    Versioned.commit(seg(1, 3), t) // v0
    Versioned.commit(seg(4, 6), t, "append") // v1
    Versioned.commit(seg(7, 9), t, "append") // v2: three 1-file segments
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gp", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gp.root", rootDir)

    val byK = c.sql("SELECT k FROM gp.lake.pt WHERE k >= 7")
    assert(byK.collect().map(_.getLong(0)).toSet == Set(7L, 8L, 9L))
    assert(scannedFiles(byK) == 1, "two segments above the k bound")

    val byTs = c.sql(
      "SELECT k FROM gp.lake.pt WHERE ts < TIMESTAMP '2024-06-04 00:00:00'")
    assert(byTs.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(scannedFiles(byTs) == 1, "timestamp window covers one segment")

    val byName = c.sql("SELECT k FROM gp.lake.pt WHERE name = 'u5'")
    assert(byName.collect().map(_.getLong(0)).toList == List(5L))
    assert(scannedFiles(byName) == 1)

    // zero survivors: a correct empty result from an empty scan
    val none = c.sql("SELECT * FROM gp.lake.pt WHERE k > 100")
    assert(none.count() == 0 && scannedFiles(none) == 0)

    // no predicate, no pruning; row-group pushdown survives the wrap
    assert(scannedFiles(c.sql("SELECT * FROM gp.lake.pt")) == 3)
    val plan = byK.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(k,7)"),
      plan)

    // time travel prunes against the PINNED version's manifest
    val old = c.sql("SELECT k FROM gp.lake.pt VERSION AS OF 0 WHERE k >= 2")
    assert(old.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(scannedFiles(old) == 1)
  }

  test("OPTIMIZE ZORDER makes stats pruning effective: a range query " +
    "on a clustered table scans a bounded slice of its files") {
    val rootDir = tmpDir("prune_z")
    val t = s"$rootDir/lake/zt"
    // shuffled keys: before clustering every file spans ~the whole key
    // range, so stats exclude nothing
    val df = spark.range(0, 4000).select(
      (($"id" * 2654435761L) % 4000).as("k"), $"id".as("v"))
    Versioned.commit(df.repartition(8), t)
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gz", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gz.root", rootDir)
    val before = c.sql("SELECT v FROM gz.lake.zt WHERE k >= 0 AND k < 400")
    assert(scannedFiles(before) == 8, "unclustered: nothing prunable")
    // cluster by k, then the same 10%-range query reads 1-2 of 8 files
    c.sql(s"OPTIMIZE '$t' ZORDER BY (k) INTO 8 FILES")
    val after = c.sql("SELECT v FROM gz.lake.zt WHERE k >= 0 AND k < 400")
    val n = scannedFiles(after)
    assert(n <= 2, s"clustered scan read $n of 8 files")
    assert(after.count() == before.count())
  }

  test("pruned reads stay correct under schema evolution: the evolved " +
    "column's filters prune files that predate it") {
    val rootDir = tmpDir("prune_evo")
    val t = s"$rootDir/lake/et"
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    Versioned.commit(Seq((3L, "c", "x")).toDF("k", "v", "extra").coalesce(1),
      t, "append")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gpe", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gpe.root", rootDir)

    // equality on the evolved column: the pre-evolution file is proven
    // all-NULL and skipped — and the schema still carries the column
    val eq = c.sql("SELECT k, extra FROM gpe.lake.et WHERE extra = 'x'")
    assert(eq.collect().map(r => (r.getLong(0), r.getString(1))).toList ==
      List((3L, "x")))
    assert(scannedFiles(eq) == 1)

    // IS NULL keeps the old file and prunes the new one (0 nulls there)
    val isNull = c.sql("SELECT k FROM gpe.lake.et WHERE extra IS NULL")
    assert(isNull.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(scannedFiles(isNull) == 1)

    // end-to-end parity with the unpruned programmatic read
    val all = Versioned.read(c, t).where("k >= 2").collect().map(_.getLong(0))
    val sql = c.sql("SELECT k FROM gpe.lake.et WHERE k >= 2")
      .collect().map(_.getLong(0))
    assert(all.toSet == sql.toSet)
  }

  test("filterless global aggregates come from the manifest alone — " +
    "zero-task LocalTableScan; strings, filters, grouping and " +
    "stats-less files all fall back to a real scan") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    val rootDir = tmpDir("magg")
    val t = s"$rootDir/lake/ma"
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-07-$d%02d 00:00:00")
    Versioned.commit(Seq(
      (1L, Option(10L), ts(1), "a"), (2L, Option.empty[Long], ts(2), "b"),
      (3L, Option(30L), ts(3), "c")).toDF("k", "c", "ts", "name").coalesce(1), t)
    Versioned.commit(Seq(
      (4L, Option.empty[Long], ts(4), "d", 77L),
      (5L, Option(50L), ts(5), "e", 99L))
      .toDF("k", "c", "ts", "name", "evo").coalesce(1), t, "append")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gma", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gma.root", rootDir)

    def leaves(df: DataFrame) =
      df.queryExecution.executedPlan.collectLeaves()
    def isLocal(df: DataFrame): Boolean =
      leaves(df).exists(_.isInstanceOf[LocalTableScanExec]) &&
        !leaves(df).exists(_.isInstanceOf[BatchScanExec])

    val q = c.sql("SELECT count(*) AS n, count(c) AS nc, count(evo) AS ne, " +
      "min(k) AS mk, max(k) AS xk, max(ts) AS xts, min(evo) AS me " +
      "FROM gma.lake.ma")
    assert(isLocal(q), q.queryExecution.executedPlan.toString)
    val r = q.collect().head
    assert(r.getLong(0) == 5L, "count(*)")
    assert(r.getLong(1) == 3L, "count(c) skips NULLs in both segments")
    assert(r.getLong(2) == 2L, "count(evo): pre-evolution file is all-NULL")
    assert(r.getLong(3) == 1L && r.getLong(4) == 5L, "min/max(k)")
    assert(r.getTimestamp(5) == ts(5), "max(ts) in catalyst micros")
    assert(r.getLong(6) == 77L, "min(evo) folds only stats-bearing files")

    // string bounds may be writer-truncated: never answered from stats
    val s = c.sql("SELECT max(name) AS xn FROM gma.lake.ma")
    assert(!isLocal(s) && s.collect().head.getString(0) == "e")
    // any filter or grouping: the real scan answers
    val w = c.sql("SELECT count(*) AS n FROM gma.lake.ma WHERE k >= 4")
    assert(!isLocal(w) && w.collect().head.getLong(0) == 2L)
    val g = c.sql("SELECT k % 2 AS p, count(*) FROM gma.lake.ma GROUP BY 1")
    assert(!isLocal(g) && g.count() == 2L)
    // time travel answers from the PINNED manifest
    val tt = c.sql("SELECT count(*) AS n, max(k) AS xk " +
      "FROM gma.lake.ma VERSION AS OF 0")
    assert(isLocal(tt))
    assert(tt.collect().head == org.apache.spark.sql.Row(3L, 3L))
    // a cast AROUND the aggregate (vt6's epoch-seconds shape) still
    // pushes: the cast applies to the manifest-served row
    val cast = c.sql("SELECT CAST(max(ts) AS LONG) AS s FROM gma.lake.ma")
    assert(isLocal(cast), cast.queryExecution.executedPlan.toString)
    assert(cast.collect().head.getLong(0) == ts(5).getTime / 1000)

    // strip one file's stats: count(*) is no longer provable — falls
    // back to a real scan and still answers correctly
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
    val q2 = c.sql("SELECT count(*) AS n FROM gma.lake.ma")
    assert(!isLocal(q2), q2.queryExecution.executedPlan.toString)
    assert(q2.collect().head.getLong(0) == 5L)
  }

  test("drifted or malformed manifest stats degrade metadata-only " +
    "aggregates to the real scan, never a plan-time failure") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    def doctor(rootDir: String, t: String, from: String, to: String): Unit = {
      val root = new org.apache.hadoop.fs.Path(t)
      val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mf = new org.apache.hadoop.fs.Path(root, "_graft_log/0.manifest")
      val in = hfs.open(mf)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      val doctored = lines.map(l => l.replace(from, to))
      assert(doctored != lines, s"pattern '$from' not found in manifest")
      val out = hfs.create(mf, true)
      try out.write(doctored.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      graft.operators.Versioned.clearManifestCache() // out-of-band edit
    }
    def probe(tag: String, from: String, to: String): Unit = {
      val rootDir = tmpDir(s"drift$tag")
      val t = s"$rootDir/lake/dr"
      Versioned.commit(
        (1L to 3L).map(i => (i, s"n$i")).toDF("k", "name").coalesce(1), t)
      doctor(rootDir, t, from, to)
      val c = spark.newSession()
      c.conf.set(s"spark.sql.catalog.gdr$tag", classOf[GraftCatalog].getName)
      c.conf.set(s"spark.sql.catalog.gdr$tag.root", rootDir)
      val q = c.sql(s"SELECT min(k) AS mk, max(k) AS xk FROM gdr$tag.lake.dr")
      // must NOT be served from the manifest (the stats lie) and must
      // NOT throw at plan time — the real scan answers
      assert(!q.queryExecution.executedPlan.collectLeaves()
        .exists(_.isInstanceOf[LocalTableScanExec]),
        q.queryExecution.executedPlan.toString)
      assert(q.collect().head == org.apache.spark.sql.Row(1L, 3L))
    }
    // type drift: an integral schema field whose stats were harvested
    // under the string ordering class (type-evolved table)
    probe("s", "k:l:", "k:s:")
    // malformed bound: tag says long but the value doesn't parse —
    // NumberFormatException must degrade, not fail the query
    probe("m", "k:l:v1:", "k:l:vNOPE:")
  }

  test("runtime filtering: a broadcast dim's join keys prune fact " +
    "segments at execution time (DSv2 dynamic pruning)") {
    import org.apache.spark.sql.functions.col
    val rootDir = tmpDir("rtf")
    val t = s"$rootDir/lake/ft"
    // three single-file segments over disjoint key ranges — at 100 TB
    // these are date/tenant-keyed commits; only manifest bounds matter
    def seg(lo: Int, hi: Int) = (lo to hi).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v").coalesce(1)
    Versioned.commit(seg(1, 100), t) // v0
    Versioned.commit(seg(101, 200), t, "append")
    Versioned.commit(seg(201, 300), t, "append")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.grt", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.grt.root", rootDir)
    // plain tree (no AQE wrapper) so the scan instance is inspectable;
    // DPP itself is a non-adaptive optimizer feature
    c.conf.set("spark.sql.adaptive.enabled", "false")

    // dim keys hit ONLY the third segment; the selective filter is on
    // a NON-join column (a join-key filter would constant-fold into
    // static pruning and never exercise the runtime path)
    (201 to 260).map(i => (i.toLong, i % 3)).toDF("fk", "grp")
      .write.parquet(s"$rootDir/dim")
    val dim = c.read.parquet(s"$rootDir/dim").where(col("grp") === 1)
    val fact = c.sql("SELECT * FROM grt.lake.ft")
    val j = fact.join(dim, fact("k") === dim("fk"))
    val rows = j.collect()
    assert(rows.length == 20, s"got ${rows.length}")
    assert(rows.map(_.getLong(0)).forall(k => k >= 201 && k % 3 == 1))

    val plan = j.queryExecution.executedPlan
    assert(plan.toString.toLowerCase.contains("dynamicpruning"),
      "no dynamic pruning over the v2 scan:\n" + plan)
    val scan = plan.collectLeaves().collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[RuntimeSkippingScan] =>
        b.scan.asInstanceOf[RuntimeSkippingScan]
    }.getOrElse(fail("no RuntimeSkippingScan leaf in plan:\n" + plan))
    assert(scan.currentFiles.size == 1,
      s"runtime filter kept ${scan.currentFiles.size} of 3 segments")

    // a dim spanning every segment prunes nothing and stays correct
    val wide = c.read.parquet(s"$rootDir/dim")
      .select((col("fk") - 200).as("fk"), col("grp")).where(col("grp") === 1)
    val jw = fact.join(wide, fact("k") === wide("fk"))
    assert(jw.collect().length == 20)
  }

  test("column-pruned catalog joins plan and run: filterAttributes " +
    "never declares a pruned-away column") {
    import org.apache.spark.sql.functions.col
    val rootDir = tmpDir("prune_dpp")
    val t = s"$rootDir/lake/pd"
    Versioned.commit((1 to 40).map(i => (i.toLong, s"n$i", i % 5))
      .toDF("k", "name", "grp").coalesce(1), t)
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gpd", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gpd.root", rootDir)
    c.conf.set("spark.sql.adaptive.enabled", "false")
    val dim = c.sql("SELECT * FROM gpd.lake.pd")
    val fact = c.range(0, 4000).select((col("id") % 40 + 1).as("k"))
    // bare count() prunes `name`/`grp` off the scan: before the
    // filterAttributes fix this crashed in PartitionPruning with
    // "Unable to resolve name" at planning time
    assert(fact.join(dim, "k").count() == 4000)
    val j = fact.join(dim, "k").select(dim("k"))
    assert(j.collect().length == 4000)
    val scan = j.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[RuntimeSkippingScan] =>
        b.scan.asInstanceOf[RuntimeSkippingScan]
    }.getOrElse(fail("no RuntimeSkippingScan leaf"))
    val declared = scan.filterAttributes().map(_.describe()).toSet
    val visible = scan.readSchema().fieldNames.toSet
    assert(declared.subsetOf(visible),
      s"filterAttributes $declared not within pruned output $visible")
  }

  test("catalog scans report statistics to the planner: a small " +
    "snapshot dim auto-broadcasts, with exact manifest row counts") {
    import org.apache.spark.sql.functions.col
    val rootDir = tmpDir("stats_bc")
    val t = s"$rootDir/lake/d"
    Versioned.commit((1 to 50).map(i => (i.toLong, s"d$i"))
      .toDF("k", "name").coalesce(1), t)
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gbc", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gbc.root", rootDir)
    c.conf.set("spark.sql.adaptive.enabled", "false")
    val dim = c.sql("SELECT * FROM gbc.lake.d")
    val fact = c.range(0, 100000)
      .select((col("id") % 50 + 1).as("k"), col("id").as("v"))
    val j = fact.join(dim, "k")
    assert(j.count() == 100000)
    // the v2 scan itself sits under the broadcast exchange — its
    // reported size let the planner pick the broadcast side
    val bcastScan = j.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        b.find(_.isInstanceOf[BatchScanExec])
    }.flatten
    assert(bcastScan.nonEmpty,
      "snapshot dim not broadcast:\n" + j.queryExecution.executedPlan)
    val scan = bcastScan.head.asInstanceOf[BatchScanExec].scan
      .asInstanceOf[RuntimeSkippingScan]
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 50, "exact manifest row count")
    assert(st.sizeInBytes().getAsLong > 0 &&
      st.sizeInBytes().getAsLong < 10L * 1024 * 1024)
    // the size is served from the manifest's bytes= stats — the exact
    // sum over the version's files, no delegate directory listing
    val manifestSum = Versioned.fileStats(spark, t)
      .values.flatMap(_.bytes).sum
    assert(st.sizeInBytes().getAsLong == manifestSum,
      s"sizeInBytes must equal the manifest bytes sum: " +
        s"${st.sizeInBytes().getAsLong} vs $manifestSum")
  }

  test("stats-less manifest lines degrade estimateStatistics to the " +
    "delegate: size still served (file listing), exact rows withheld") {
    val rootDir = tmpDir("stats_fb")
    val t = s"$rootDir/lake/d"
    Versioned.commit((1 to 50).map(i => (i.toLong, s"d$i"))
      .toDF("k", "name").coalesce(1), t)
    // strip the single file line's stats suffix (legacy-manifest form)
    val root = new org.apache.hadoop.fs.Path(t)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(root, "_graft_log/0.manifest")
    val in = hfs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val doctored = lines.map(l =>
      if (l.startsWith("#")) l else l.split('\t').head)
    assert(doctored != lines, "expected a stats-bearing file line")
    val out = hfs.create(mf, true)
    try out.write(doctored.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    graft.operators.Versioned.clearManifestCache() // out-of-band edit
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.gfb", classOf[GraftCatalog].getName)
    c.conf.set("spark.sql.catalog.gfb.root", rootDir)
    val q = c.sql("SELECT * FROM gfb.lake.d")
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[RuntimeSkippingScan] =>
        b.scan.asInstanceOf[RuntimeSkippingScan]
    }.getOrElse(fail("no RuntimeSkippingScan leaf"))
    val st = scan.estimateStatistics()
    // the delegate's file-size estimate still sizes the scan; an exact
    // row count is NOT invented for a stats-less manifest
    assert(st.sizeInBytes().isPresent && st.sizeInBytes().getAsLong > 0,
      "delegate sizeInBytes must back a stats-less manifest")
    assert(!st.numRows().isPresent || st.numRows().getAsLong != 50,
      "a stats-less manifest must not claim the exact manifest count")
    assert(q.count() == 50, "the scan itself is unaffected")
  }
}
