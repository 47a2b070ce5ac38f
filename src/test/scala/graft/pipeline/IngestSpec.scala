package graft.pipeline

import graft.SparkSpec
import graft.model.ConfigValue
import graft.sources.ParquetSource
import graft.state.{ConfigStore, WatermarkStore}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** End-to-end pipeline test (SURVEY.md §5.4): parquet-backed fake
  * "Postgres" source → full run → lake layout + watermark state →
  * second incremental run ingests only post-watermark rows (minus the
  * 80h overlap). */
class IngestSpec extends SparkSpec {

  /** Build a fake source table whose schema triggers watermark
    * *inference* (timestamp col named Modified*), from lineitem. */
  private def makeSource(dir: String): Unit = {
    import spark.implicits._
    graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey".as("id"), $"l_quantity".as("qty"),
        $"l_shipdate".as("ModifiedDate"))
      .write.mode("overwrite").parquet(s"$dir/visits.parquet")
  }

  private def setup(): (String, IngestConfig, AuditLog, Ingest) = {
    val base = tmpDir("ingest")
    makeSource(s"$base/src")
    val cfg = IngestConfig(
      configPath = s"$base/config",
      watermarkPath = s"$base/watermarks",
      lakeBasePath = s"$base/lake",
      auditPath = s"$base/audit",
      singleBatchDataLimit = 2000,
      runDate = LocalDate.of(2026, 8, 12))
    val configs = new ConfigStore(spark, cfg.configPath)
    configs.upsert(ConfigValue("dcx_postgresql_db_settings",
      "clinic_db_name", "clinicdb", is_active = true))
    configs.upsert(ConfigValue("dcx_postgresql_table_settings",
      "clinic_tables", "visits", is_active = true))
    val log = new AuditLog
    val ingest = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log), log)
    (base, cfg, log, ingest)
  }

  test("C1 fan-out builds jobs from db x table configs on task prefix") {
    val (_, _, _, ingest) = setup()
    val jobs = ingest.planJobs()
    assert(jobs.map(_.tableSpec) == Seq("visits"))
    assert(jobs.head.task == "clinic")
  }

  test("full run chunks, covers all rows, commits lagged watermark; " +
    "second run is incremental") {
    val (base, cfg, log, ingest) = setup()
    val report = ingest.run()
    assert(report.exitStatus == "SUCCESS", report.failed.toString)

    val src = spark.read.parquet(s"$base/src/visits.parquet")
    val lake = spark.read.parquet(s"$base/lake/visits/2026/08/12")
    // chunk union == source (6k rows > 2k limit → chunked append)
    assert(lake.count() == src.count())
    assert(lake.select(sum("qty")).head().getDouble(0) ==
      src.select(sum("qty")).head().getDouble(0))

    // watermark == max(ModifiedDate) - 80h
    val store = new WatermarkStore(spark, cfg.watermarkPath)
    val wmOpt = store.lastLoad(cfg.systemType, cfg.databaseName, "visits")
    assert(wmOpt.isDefined,
      s"no watermark; store rows=${store.all().collect().toSeq}; " +
        s"audit=${log.snapshot.map(_.message).mkString(" | ")}")
    val wm = wmOpt.get
    val expected = java.sql.Timestamp.valueOf(
      src.agg(max(col("ModifiedDate")) - expr("INTERVAL 80 HOURS"))
        .head().getAs[java.time.LocalDateTime](0))
    assert(wm == expected)

    // second run: only rows >= watermark are staged
    val log2 = new AuditLog
    val ingest2 = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log2), log2)
    val report2 = ingest2.run()
    assert(report2.exitStatus == "SUCCESS")
    val expectedIncr = src.where(col("ModifiedDate") >= lit(wm)).count()
    val stagedMsg = log2.snapshot.map(_.message)
      .find(m => m.contains("staged") && m.contains("incremental=true"))
    assert(stagedMsg.isDefined, log2.snapshot.map(_.message).mkString("; "))
    assert(stagedMsg.get.contains(s"staged $expectedIncr rows"))
  }

  test("snapshot lake format: chunk appends are atomic versioned " +
    "commits, the ingest run is time-travelable, watermark matches " +
    "the parquet-format run") {
    import graft.operators.Versioned
    val base = tmpDir("ingest")
    makeSource(s"$base/src")
    val cfg = IngestConfig(
      configPath = s"$base/config",
      watermarkPath = s"$base/watermarks",
      lakeBasePath = s"$base/lake",
      auditPath = s"$base/audit",
      singleBatchDataLimit = 2000,
      runDate = LocalDate.of(2026, 8, 12),
      lakeFormat = graft.sources.LakeFormat.Snapshot)
    val configs = new ConfigStore(spark, cfg.configPath)
    configs.upsert(ConfigValue("dcx_postgresql_db_settings",
      "clinic_db_name", "clinicdb", is_active = true))
    configs.upsert(ConfigValue("dcx_postgresql_table_settings",
      "clinic_tables", "visits", is_active = true))
    val log = new AuditLog
    val ingest = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log), log)
    assert(ingest.run().exitStatus == "SUCCESS")

    val table = s"$base/lake/visits/2026/08/12"
    val src = spark.read.parquet(s"$base/src/visits.parquet")
    // every chunk is one committed version; the latest covers the table
    val vs = Versioned.versions(spark, table)
    assert(vs.size > 1, s"expected one version per chunk, got $vs")
    assert(Versioned.read(spark, table).count() == src.count())
    // time travel: version 0 is exactly the first chunk (a strict,
    // non-empty prefix of the rows)
    val v0 = Versioned.read(spark, table, Some(0L)).count()
    assert(v0 > 0 && v0 < src.count())
    // change feed across the run == everything after the first chunk
    assert(Versioned.changes(spark, table, 0L, vs.last).count() ==
      src.count() - v0)
    // watermark identical to the parquet-format pipeline's rule
    val store = new WatermarkStore(spark, cfg.watermarkPath)
    val wm = store.lastLoad(cfg.systemType, cfg.databaseName, "visits").get
    val expected = java.sql.Timestamp.valueOf(
      src.agg(max(col("ModifiedDate")) - expr("INTERVAL 80 HOURS"))
        .head().getAs[java.time.LocalDateTime](0))
    assert(wm == expected)
  }

  test("bucketSpecs: ingested tables land co-bucketed and join through " +
    "the catalog with zero exchanges (SPJ from ingest to analytics)") {
    import graft.operators.Versioned
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val base = tmpDir("ingest")
    makeSource(s"$base/src")
    // second fact table sharing the join key (orders): Full route
    graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey".as("id"), $"o_totalprice".as("amt"),
        $"o_orderdate".as("ModifiedDate"))
      .write.mode("overwrite").parquet(s"$base/src/billing.parquet")
    val cfg = IngestConfig(
      configPath = s"$base/config",
      watermarkPath = s"$base/watermarks",
      lakeBasePath = s"$base/lake",
      auditPath = s"$base/audit",
      singleBatchDataLimit = 2000,
      runDate = LocalDate.of(2026, 8, 12),
      lakeFormat = graft.sources.LakeFormat.Snapshot,
      bucketSpecs = Map("visits" -> (("id", 4)), "billing" -> (("id", 4))))
    val configs = new ConfigStore(spark, cfg.configPath)
    configs.upsert(ConfigValue("dcx_postgresql_db_settings",
      "clinic_db_name", "clinicdb", is_active = true))
    configs.upsert(ConfigValue("dcx_postgresql_table_settings",
      "clinic_tables", "visits,billing", is_active = true))
    val log = new AuditLog
    val ingest = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log), log)
    assert(ingest.run().exitStatus == "SUCCESS")

    // both tables declare the layout on their LATEST version — visits
    // went through the CHUNKED route (several bucketed appends),
    // billing through the Full route (one bucketed overwrite)
    val visits = s"$base/lake/visits/2026/08/12"
    val billing = s"$base/lake/billing/2026/08/12"
    assert(Versioned.versions(spark, visits).size > 1)
    assert(Versioned.bucketSpec(spark, visits).contains(("id", 4)))
    assert(Versioned.bucketSpec(spark, billing).contains(("id", 4)))

    // ingest → analytics: the write-time layout carries the join
    val cat = "spj_ing"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", s"$base/lake")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$cat.visits.`2026`.`08`.`12`")
        .join(spark.table(s"$cat.billing.`2026`.`08`.`12`"), "id")
        .select($"id", $"qty", $"amt")
      joined.collect()
      def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
        val inner = p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
          case r: org.apache.spark.sql.execution.exchange
              .ReusedExchangeExec => countShuffles(r.child)
          case _ => 0
        }
        self + inner + p.children.map(countShuffles).sum
      }
      assert(countShuffles(joined.queryExecution.executedPlan) == 0,
        "ingested co-bucketed join should not shuffle:\n" +
          joined.queryExecution.executedPlan)
      val expected = spark.read.parquet(s"$base/src/visits.parquet")
        .select($"id").join(
          spark.read.parquet(s"$base/src/billing.parquet").select($"id"),
          "id").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("missing-watermark oversize table routes to BulkWarn with alert") {
    import spark.implicits._
    val base = tmpDir("bulk")
    // no watermark-shaped columns at all
    graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey".as("id"), $"l_quantity".as("qty"))
      .write.mode("overwrite").parquet(s"$base/src/big.parquet")
    val cfg = IngestConfig(
      configPath = s"$base/config", watermarkPath = s"$base/wm",
      lakeBasePath = s"$base/lake", auditPath = s"$base/audit",
      singleBatchDataLimit = 100, runDate = LocalDate.of(2026, 8, 12))
    val configs = new ConfigStore(spark, cfg.configPath)
    configs.upsert(ConfigValue("dcx_postgresql_db_settings",
      "t_db_name", "db", is_active = true))
    configs.upsert(ConfigValue("dcx_postgresql_table_settings",
      "t_tables", "big", is_active = true))
    val log = new AuditLog
    new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log), log).run()
    assert(log.snapshot.exists(_.message.startsWith("ALERT: missing watermark")))
    assert(spark.read.parquet(s"$base/lake/big/2026/08/12").count() > 100)
  }

  test("per-table failure is contained and reported (C7)") {
    val (base, cfg, log, _) = setup()
    val configs = new ConfigStore(spark, cfg.configPath)
    configs.upsert(ConfigValue("dcx_postgresql_table_settings",
      "clinic_tables", "visits,ghost_table", is_active = true))
    val ingest = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log), log)
    val report = ingest.run()
    assert(report.succeeded == Seq("visits"))
    assert(report.failed.map(_._1) == Seq("ghost_table"))
    assert(report.exitStatus == "ERROR: ghost_table")
  }

  test("parallel table loads: run(parallelism=3) loads every table and " +
    "commits every watermark (no lost store updates)") {
    import spark.implicits._
    val base = tmpDir("par")
    val tables = Seq("alpha", "beta", "gamma")
    tables.foreach { name =>
      graft.Tables(spark, sfDir, "lineitem")
        .select($"l_orderkey".as("id"), $"l_shipdate".as("ModifiedDate"))
        .write.mode("overwrite").parquet(s"$base/src/$name.parquet")
    }
    val cfg = IngestConfig(
      configPath = s"$base/config", watermarkPath = s"$base/wm",
      lakeBasePath = s"$base/lake", auditPath = s"$base/audit",
      singleBatchDataLimit = 100, // forces Chunked → watermark inserts
      runDate = LocalDate.of(2026, 8, 12))
    val configs = new ConfigStore(spark, cfg.configPath)
    configs.upsert(ConfigValue("dcx_postgresql_db_settings",
      "t_db_name", "db", is_active = true))
    configs.upsert(ConfigValue("dcx_postgresql_table_settings",
      "t_tables", tables.mkString(","), is_active = true))
    val log = new AuditLog
    val ingest = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log), log)
    val report = ingest.run(parallelism = 3)
    assert(report.exitStatus == "SUCCESS", report.failed.toString)
    val srcCount = spark.read.parquet(s"$base/src/alpha.parquet").count()
    tables.foreach { name =>
      assert(spark.read.parquet(s"$base/lake/$name/2026/08/12").count()
        == srcCount, s"lake count mismatch for $name")
    }
    // all three watermark rows survived the concurrent commits
    val store = new WatermarkStore(spark, cfg.watermarkPath)
    assert(store.all().count() == 3,
      store.all().collect().toSeq.toString)
  }

  test("additive schema evolution: appended chunk's new column surfaces " +
    "on merged read (reference mergeSchema parity)") {
    import spark.implicits._
    import graft.sources.{LakeReader, LakeWriter}
    import org.apache.spark.sql.SaveMode
    val path = tmpDir("evolve") + "/lake/t"
    // v1 chunk: two columns
    LakeWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      path, SaveMode.Overwrite)
    // v2 chunk appended with a NEW column (the reference's
    // mergeSchema=true write at `Ingest:304` intends exactly this)
    LakeWriter.write(Seq((3L, "c", 9.5)).toDF("id", "name", "score"),
      path, SaveMode.Append)
    val merged = LakeReader.read(spark, path)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score").sorted)
    assert(merged.count() == 3)
    // rows from the pre-evolution chunk surface the new column as NULL
    assert(merged.where($"score".isNull).count() == 2)
    assert(merged.where($"score" === 9.5).select($"id").head().getLong(0) == 3L)
  }

  test("pipeline end-to-end against JDBC state stores: configs planned " +
    "from, and watermark committed to, a live Derby metastore") {
    import graft.state.{JdbcConfigStore, JdbcWatermarkStore}
    val base = tmpDir("ingestjdbc")
    makeSource(s"$base/src")
    val url = "jdbc:derby:memory:ingestjdbc1;create=true"
    val jdbcConfigs = new JdbcConfigStore(url, "", "")
    val jdbcWatermarks = new JdbcWatermarkStore(url, "", "")
    jdbcConfigs.upsert(ConfigValue("dcx_postgresql_db_settings",
      "clinic_db_name", "clinicdb", is_active = true))
    jdbcConfigs.upsert(ConfigValue("dcx_postgresql_table_settings",
      "clinic_tables", "visits", is_active = true))
    val cfg = IngestConfig(
      configPath = s"$base/unused_config",
      watermarkPath = s"$base/unused_watermarks",
      lakeBasePath = s"$base/lake",
      auditPath = s"$base/audit",
      singleBatchDataLimit = 2000,
      runDate = LocalDate.of(2026, 8, 12))
    val log = new AuditLog
    val ingest = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log), log,
      watermarkStore = Some(jdbcWatermarks), configStore = Some(jdbcConfigs))
    val report = ingest.run()
    assert(report.exitStatus == "SUCCESS", report.failed.toString)
    // watermark landed in Derby (not in the unused parquet path), and
    // equals max(ModifiedDate) - 80h — the same contract the parquet
    // store satisfies
    val committed = jdbcWatermarks
      .lastLoad("offline", "sharestory", "visits")
    assert(committed.nonEmpty, "no JDBC watermark committed")
    // ModifiedDate is TIMESTAMP_NTZ → LocalDateTime, the NTZ-aware form
    val expected = java.sql.Timestamp.valueOf(
      spark.read.parquet(s"$base/src/visits.parquet")
        .agg(max(col("ModifiedDate")) - expr("INTERVAL 80 HOURS"))
        .head().getAs[java.time.LocalDateTime](0))
    assert(committed.get == expected)
    assert(!new java.io.File(s"$base/unused_watermarks").exists())
  }

  test("Snapshot LakeWriter honors ErrorIfExists/Ignore instead of " +
    "silently overwriting") {
    import spark.implicits._
    import graft.sources.{LakeFormat, LakeReader, LakeWriter}
    import org.apache.spark.sql.SaveMode
    val path = tmpDir("modes") + "/lake/t"
    // ErrorIfExists on a fresh table: fine, creates v0
    LakeWriter.write(Seq((1L, "a")).toDF("id", "name"), path,
      SaveMode.ErrorIfExists, format = LakeFormat.Snapshot)
    // ...but on an existing table it must throw, not overwrite
    intercept[IllegalStateException] {
      LakeWriter.write(Seq((9L, "z")).toDF("id", "name"), path,
        SaveMode.ErrorIfExists, format = LakeFormat.Snapshot)
    }
    // Ignore on an existing table: no-op — no new version, data intact
    LakeWriter.write(Seq((9L, "z")).toDF("id", "name"), path,
      SaveMode.Ignore, format = LakeFormat.Snapshot)
    assert(graft.operators.Versioned.versions(spark, path) == Seq(0L))
    assert(LakeReader.read(spark, path, format = LakeFormat.Snapshot)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
  }

  test("Route.decide matches reference volume routing") {
    assert(Route.decide(99, 100, hasWatermark = true) == Route.Full)
    assert(Route.decide(100, 100, hasWatermark = true) == Route.Chunked)
    assert(Route.decide(100, 100, hasWatermark = false) == Route.BulkWarn)
  }

  test("ConfigAdmin.mergeTableLists: append-new, skip-present, tag-elsewhere") {
    val merged = ConfigAdmin.mergeTableLists(
      existing = Seq("Hospital", "public.Visit"),
      incoming = Seq("hospital", "Ward", "Shared"),
      task = "urgentcare",
      tablesElsewhere = Set("shared"))
    assert(merged == Seq("Hospital", "public.Visit", "Ward",
      "urgentcare__Shared"))
    // IDEMPOTENT: re-merging the same request against the result must
    // change nothing — the tagged form counts as "already present"
    // (pre-fix every rerun appended urgentcare__Shared again)
    val again = ConfigAdmin.mergeTableLists(
      existing = merged,
      incoming = Seq("hospital", "Ward", "Shared"),
      task = "urgentcare",
      tablesElsewhere = Set("shared"))
    assert(again == merged)
  }

  test("a same-day rerun routed Full (small delta) APPENDS to the run " +
    "date's dir — never clobbers the chunked data already landed there") {
    val (base, cfg, _, ingest) = setup()
    ingest.run() // 6k rows > 2k limit: chunked appends + watermark
    val dated = s"$base/lake/visits/2026/08/12"
    val before = spark.read.parquet(dated).count()
    assert(before > 2000)
    // rerun the same day: stages only the >= watermark slice (a few
    // rows, < limit) -> Route.Full. Pre-fix this OVERWROTE the dated
    // dir with the tiny delta, silently discarding the chunked load
    val log2 = new AuditLog
    val ingest2 = new Ingest(spark, new ParquetSource(s"$base/src"), cfg,
      new LogAlertSink(log2), log2)
    assert(ingest2.run().exitStatus == "SUCCESS")
    val after = spark.read.parquet(dated).count()
    assert(after >= before,
      s"rerun shrank the day's data: $before -> $after")
  }

  test("ConfigAdmin.interactive drives the six widget prompts end to " +
    "end: insert-when-new, merge-update tables, never overwrite an " +
    "existing watermark config") {
    val store = new graft.state.ConfigStore(spark, tmpDir("cfgadm") + "/cfg")
    def session(answers: String*): Seq[String] = {
      val in = answers.iterator
      val out = scala.collection.mutable.Buffer.empty[String]
      ConfigAdmin.interactive(store, () => in.next(), out += _)
      out.toSeq.filterNot(_.endsWith(": ")) // drop the prompts
    }
    // fresh project: all three configs inserted
    val log1 = session("vet_db_name", "vetdb", "vet_tables",
      "Hospital, Ward", "vet_hospital_watermarks", "CreatedDate")
    assert(log1 == Seq("vet_db_name has been inserted into config",
      "vet_tables has been inserted into config",
      "vet_hospital_watermarks has been inserted into config"))
    assert(store.value("dcx_postgresql_db_settings", "vet_db_name")
      .contains("vetdb"))
    assert(store.value("dcx_postgresql_table_settings", "vet_tables")
      .contains("Hospital,Ward"))
    assert(store.value("dcx_postgresql_watermark_settings",
      "vet_hospital_watermarks").contains("CreatedDate"))
    // re-run for the same project: db reported as existing, tables
    // MERGED in place (dup skipped), watermark NOT overwritten
    val log2 = session("vet_db_name", "vetdb", "vet_tables",
      "ward, Status", "vet_hospital_watermarks", "LastModified")
    assert(log2.exists(_.contains("vet_db_name already exists")))
    assert(log2.exists(_.contains("have been added to config vet_tables")))
    assert(log2.exists(_.contains("vet_hospital_watermarks already exists")))
    assert(store.value("dcx_postgresql_table_settings", "vet_tables")
      .contains("Hospital,Ward,Status"))
    assert(store.value("dcx_postgresql_watermark_settings",
      "vet_hospital_watermarks").contains("CreatedDate"), "not overwritten")
    // another task adding a table registered elsewhere: prefix-tagged
    session("care_db_name", "caredb", "care_tables", "Status,Clinic",
      "", "")
    assert(store.value("dcx_postgresql_table_settings", "care_tables")
      .contains("care__Status,Clinic"))
    // blank answers everywhere: a no-op session
    val before = store.allValues().toSet
    assert(session("", "", "", "", "", "").isEmpty)
    assert(store.allValues().toSet == before)
  }
}
