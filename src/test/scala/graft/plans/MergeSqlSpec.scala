package graft.plans

import graft.SparkSpec

/** ANSI MERGE INTO over parquet catalog tables — the Delta-MERGE
  * surface a reference user writes (`...Notebook.py:373-415`), lowered
  * by GraftExtensions' ResolveParquetMerge to DataMerge. */
class MergeSqlSpec extends SparkSpec {
  import spark.implicits._

  test("MERGE INTO upserts a partitioned parquet catalog table, " +
    "including a brand-new partition") {
    val loc = tmpDir("mergesql") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS merge_tgt")
    spark.sql(s"""CREATE TABLE merge_tgt (k BIGINT, v DOUBLE, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 10.0, 2020), (2L, 20.0, 2021)).toDF("k", "v", "part")
        .write.mode("append").insertInto("merge_tgt")
      Seq((2L, 200.0, 2021), (3L, 30.0, 2021), (4L, 40.0, 2022))
        .toDF("k", "v", "part").createOrReplaceTempView("merge_src")
      spark.sql("""MERGE INTO merge_tgt USING merge_src
        ON merge_tgt.k = merge_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.table("merge_tgt").as[(Long, Double, Int)]
        .collect().toSet
      assert(got == Set((1L, 10.0, 2020), (2L, 200.0, 2021),
        (3L, 30.0, 2021), (4L, 40.0, 2022)))
    } finally spark.sql("DROP TABLE IF EXISTS merge_tgt")
  }

  test("MERGE INTO an unpartitioned parquet table rewrites via staging") {
    val loc = tmpDir("mergesql2") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS merge_flat")
    spark.sql(s"""CREATE TABLE merge_flat (k BIGINT, v DOUBLE)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
        .write.mode("append").insertInto("merge_flat")
      Seq((2L, 22.0), (9L, 9.0)).toDF("k", "v")
        .createOrReplaceTempView("merge_flat_src")
      spark.sql("""MERGE INTO merge_flat USING merge_flat_src
        ON merge_flat.k = merge_flat_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.table("merge_flat").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 1.0), (2L, 22.0), (9L, 9.0)))
    } finally spark.sql("DROP TABLE IF EXISTS merge_flat")
  }

  test("SQL UPDATE with WHERE rewrites matched rows only; NULL-cond " +
    "rows untouched") {
    val loc = tmpDir("updsql") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS upd_tgt")
    spark.sql(s"""CREATE TABLE upd_tgt (k BIGINT, name STRING, v DOUBLE)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, null.asInstanceOf[String], 3.0))
        .toDF("k", "name", "v").write.mode("append").insertInto("upd_tgt")
      spark.sql("UPDATE upd_tgt SET v = v * 10 WHERE name = 'b'")
      val got = spark.table("upd_tgt").select($"k", $"v")
        .as[(Long, Double)].collect().toSet
      // NULL name => condition NULL => not updated (SQL semantics)
      assert(got == Set((1L, 1.0), (2L, 20.0), (3L, 3.0)))
    } finally spark.sql("DROP TABLE IF EXISTS upd_tgt")
  }

  test("SQL UPDATE with duplicate assignment targets refuses — never a " +
    "quiet last-one-wins coin-flip (the path form refuses identically)") {
    val loc = tmpDir("upddup") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS upd_dup")
    spark.sql(s"""CREATE TABLE upd_dup (k BIGINT, v DOUBLE)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, 1.0)).toDF("k", "v").write.mode("append")
        .insertInto("upd_dup")
      val e = intercept[Exception] {
        spark.sql("UPDATE upd_dup SET v = 1, v = 2")
      }
      assert(e.getMessage.contains("duplicate"),
        s"expected the duplicate-target refusal, got: ${e.getMessage}")
      assert(spark.table("upd_dup").select($"v").as[Double].head() == 1.0,
        "a refused UPDATE must change nothing")
    } finally spark.sql("DROP TABLE IF EXISTS upd_dup")
  }

  test("SQL DELETE with WHERE removes matched rows from a partitioned " +
    "table; NULL-cond rows survive") {
    val loc = tmpDir("delsql") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS del_tgt")
    spark.sql(s"""CREATE TABLE del_tgt (k BIGINT, name STRING, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, "a", 1), (2L, "b", 1), (3L, null.asInstanceOf[String], 2))
        .toDF("k", "name", "part").write.mode("append").insertInto("del_tgt")
      spark.sql("DELETE FROM del_tgt WHERE name = 'a'")
      val got = spark.table("del_tgt").select($"k").as[Long].collect().toSet
      assert(got == Set(2L, 3L))
    } finally spark.sql("DROP TABLE IF EXISTS del_tgt")
  }

  test("partition-scoped UPDATE: only partitions with matched rows are " +
    "rewritten; others keep their exact files") {
    val loc = tmpDir("updscope") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS upd_scope")
    spark.sql(s"""CREATE TABLE upd_scope (k BIGINT, v DOUBLE, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, 1), (2L, 2.0, 1), (3L, 3.0, 2))
        .toDF("k", "v", "part").write.mode("append").insertInto("upd_scope")
      def files(p: Int) = new java.io.File(s"$loc/part=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f =>
          f.getName -> f.lastModified()).toMap
      val p2Before = files(2)
      spark.sql("UPDATE upd_scope SET v = v + 100 WHERE k = 1")
      // part=1 rewritten (incl. the unmatched k=2 row, unchanged value);
      // part=2 never read or rewritten
      assert(files(2) == p2Before, "untouched partition was rewritten")
      val got = spark.table("upd_scope").select($"k", $"v")
        .as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 101.0), (2L, 2.0), (3L, 3.0)))
    } finally spark.sql("DROP TABLE IF EXISTS upd_scope")
  }

  test("partition-scoped DELETE: a fully-deleted partition's dir is " +
    "dropped; others keep their exact files") {
    val loc = tmpDir("delscope") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS del_scope")
    spark.sql(s"""CREATE TABLE del_scope (k BIGINT, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1), (2L, 1), (3L, 2)).toDF("k", "part")
        .write.mode("append").insertInto("del_scope")
      val p2Before = new java.io.File(s"$loc/part=2").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      spark.sql("DELETE FROM del_scope WHERE part = 1")
      assert(!new java.io.File(s"$loc/part=1").exists(),
        "fully-deleted partition dir should be gone")
      val p2After = new java.io.File(s"$loc/part=2").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      assert(p2After == p2Before)
      assert(spark.table("del_scope").select($"k").as[Long]
        .collect().toSeq == Seq(3L))
    } finally spark.sql("DROP TABLE IF EXISTS del_scope")
  }

  test("no-match UPDATE is a no-op that rewrites nothing") {
    val loc = tmpDir("updnoop") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS upd_noop")
    spark.sql(s"""CREATE TABLE upd_noop (k BIGINT, v DOUBLE, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, 1)).toDF("k", "v", "part")
        .write.mode("append").insertInto("upd_noop")
      val before = new java.io.File(s"$loc/part=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f =>
          f.getName -> f.lastModified()).toMap
      spark.sql("UPDATE upd_noop SET v = 999 WHERE k = 12345")
      val after = new java.io.File(s"$loc/part=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f =>
          f.getName -> f.lastModified()).toMap
      assert(after == before)
      assert(spark.table("upd_noop").select($"v").as[Double]
        .collect().toSeq == Seq(1.0))
    } finally spark.sql("DROP TABLE IF EXISTS upd_noop")
  }

  test("the reference's LITERAL MERGE shape runs: expression ON " +
    "(lower=lower), column-level UPDATE SET, conditional INSERT VALUES") {
    val loc = tmpDir("refmerge") + "/tld"
    spark.sql("CREATE DATABASE IF NOT EXISTS configurations")
    spark.sql("DROP TABLE IF EXISTS configurations.TableLoadDetails")
    spark.sql(s"""CREATE TABLE configurations.TableLoadDetails (
        tableloaddetailsid INT, SystemType STRING, DatabaseName STRING,
        TableName STRING, LastLoadDate TIMESTAMP,
        SqlCreatedDate TIMESTAMP, SqlUpdatedDate TIMESTAMP)
      USING parquet LOCATION '$loc'""")
    try {
      spark.sql("""INSERT INTO configurations.TableLoadDetails VALUES
        (1, 'pg', 'sharestory', 'visits',
         TIMESTAMP '2026-01-01 00:00:00',
         TIMESTAMP '2026-01-01 00:00:00', NULL)""")
      // the reference's statement (`...Notebook.py:373-415`) with its
      // f-string holes filled; WHEN MATCHED updates the existing row
      def refMerge(maxKey: Int, tableName: String, loadDate: String,
          insertconfig: Boolean): Unit =
        spark.sql(s"""
          MERGE INTO configurations.TableLoadDetails AS T
          USING (
            SELECT CAST('$maxKey' AS INT) AS tableloaddetailsid,
                   'pg' AS SystemType,
                   'sharestory' AS DatabaseName,
                   '$tableName' AS TableName,
                   CAST('$loadDate' AS TIMESTAMP) AS LastLoadDate,
                   CURRENT_TIMESTAMP() AS SqlCreatedDate,
                   CURRENT_TIMESTAMP() AS SqlUpdatedDate
          ) S
          ON T.SystemType = S.SystemType
          AND T.DatabaseName = S.DatabaseName
          AND lower(T.TableName) = lower(S.TableName)
          WHEN MATCHED THEN UPDATE SET
            T.LastLoadDate = S.LastLoadDate,
            T.SqlUpdatedDate = S.SqlUpdatedDate
          WHEN NOT MATCHED AND $insertconfig THEN INSERT (
            tableloaddetailsid, SystemType, DatabaseName, TableName,
            LastLoadDate, SqlCreatedDate, SqlUpdatedDate)
          VALUES (S.tableloaddetailsid, S.SystemType, S.DatabaseName,
            S.TableName, S.LastLoadDate, S.SqlCreatedDate, NULL)""")

      // MATCHED (case-insensitive name) -> LastLoadDate updated in place
      refMerge(2, "VISITS", "2026-06-01 00:00:00", insertconfig = false)
      val t = spark.table("configurations.TableLoadDetails")
      assert(t.count() == 1)
      val row = t.head()
      assert(row.getAs[java.sql.Timestamp]("LastLoadDate").toString
        .startsWith("2026-06-01"))
      assert(row.getAs[java.sql.Timestamp]("SqlUpdatedDate") != null)
      assert(row.getInt(0) == 1, "matched row keeps its id")

      // NOT MATCHED + insertconfig=false -> no insert
      refMerge(2, "wards", "2026-06-02 00:00:00", insertconfig = false)
      assert(spark.table("configurations.TableLoadDetails").count() == 1)

      // NOT MATCHED + insertconfig=true -> inserted with NULL updated-date
      refMerge(2, "wards", "2026-06-02 00:00:00", insertconfig = true)
      val t2 = spark.table("configurations.TableLoadDetails")
      assert(t2.count() == 2)
      val ward = t2.where($"TableName" === "wards").head()
      assert(ward.getInt(0) == 2)
      assert(ward.isNullAt(ward.fieldIndex("SqlUpdatedDate")))
    } finally spark.sql("DROP TABLE IF EXISTS configurations.TableLoadDetails")
  }

  test("general MERGE with a conditional DELETE clause empties and " +
    "drops a partition") {
    val loc = tmpDir("gdel") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS gdel_tgt")
    spark.sql(s"""CREATE TABLE gdel_tgt (k BIGINT, v DOUBLE, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, 1), (2L, 2.0, 1), (3L, 3.0, 2)).toDF("k", "v", "part")
        .write.mode("append").insertInto("gdel_tgt")
      Seq((1L, 0.0), (2L, 99.0)).toDF("k", "v")
        .createOrReplaceTempView("gdel_src")
      spark.sql("""MERGE INTO gdel_tgt USING gdel_src
        ON gdel_tgt.k = gdel_src.k
        WHEN MATCHED AND gdel_src.v = 0.0 THEN DELETE""")
      // k=1 deleted (cond true), k=2 matched-but-kept, k=3 untouched
      val got = spark.table("gdel_tgt").select($"k", $"v")
        .as[(Long, Double)].collect().toSet
      assert(got == Set((2L, 2.0), (3L, 3.0)))
    } finally spark.sql("DROP TABLE IF EXISTS gdel_tgt")
  }

  test("MERGE into a TWO-LEVEL partitioned table (the reference's " +
    "y/m layout): untouched leaf dirs keep their exact files, new " +
    "leaf partition created") {
    val loc = tmpDir("merge2l") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS merge_2l")
    spark.sql(s"""CREATE TABLE merge_2l (k BIGINT, v DOUBLE, y INT, m INT)
      USING parquet PARTITIONED BY (y, m) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, 2024, 1), (2L, 2.0, 2024, 2), (3L, 3.0, 2025, 1))
        .toDF("k", "v", "y", "m")
        .write.mode("append").insertInto("merge_2l")
      val untouchedFiles = new java.io.File(s"$loc/y=2025/m=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      // update (2024,1), insert a row into brand-new leaf (2025,2)
      Seq((1L, 10.0, 2024, 1), (9L, 9.0, 2025, 2)).toDF("k", "v", "y", "m")
        .createOrReplaceTempView("merge_2l_src")
      spark.sql("""MERGE INTO merge_2l USING merge_2l_src
        ON merge_2l.k = merge_2l_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.table("merge_2l").select($"k", $"v", $"y", $"m")
        .as[(Long, Double, Int, Int)].collect().toSet
      assert(got == Set((1L, 10.0, 2024, 1), (2L, 2.0, 2024, 2),
        (3L, 3.0, 2025, 1), (9L, 9.0, 2025, 2)))
      // untouched leaf (2025,1) was never rewritten
      val after = new java.io.File(s"$loc/y=2025/m=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      assert(after == untouchedFiles, "untouched leaf dir was rewritten")
    } finally spark.sql("DROP TABLE IF EXISTS merge_2l")
  }

  test("DELETE on a two-level partitioned table rewrites only matched " +
    "leaves and drops a fully-emptied one") {
    val loc = tmpDir("del2l") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS del_2l")
    spark.sql(s"""CREATE TABLE del_2l (k BIGINT, y INT, m INT)
      USING parquet PARTITIONED BY (y, m) LOCATION '$loc'""")
    try {
      Seq((1L, 2024, 1), (2L, 2024, 1), (3L, 2024, 2), (4L, 2025, 1))
        .toDF("k", "y", "m")
        .write.mode("append").insertInto("del_2l")
      val keepFiles = new java.io.File(s"$loc/y=2025/m=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      spark.sql("DELETE FROM del_2l WHERE k <= 2 OR (y = 2024 AND m = 2)")
      assert(spark.table("del_2l").select($"k").as[Long].collect().toSet
        == Set(4L))
      // fully-emptied leaves dropped, untouched leaf byte-identical
      assert(!new java.io.File(s"$loc/y=2024/m=1").exists())
      assert(!new java.io.File(s"$loc/y=2024/m=2").exists())
      val after = new java.io.File(s"$loc/y=2025/m=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      assert(after == keepFiles)
    } finally spark.sql("DROP TABLE IF EXISTS del_2l")
  }

  test("MERGE UPDATE that moves a row across partitions cleans the old " +
    "partition (no stale duplicate) and drops it when emptied") {
    val loc = tmpDir("mvmerge") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS mv_merge")
    spark.sql(s"""CREATE TABLE mv_merge (k BIGINT, v DOUBLE, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, 1), (2L, 2.0, 2)).toDF("k", "v", "part")
        .write.mode("append").insertInto("mv_merge")
      Seq((1L, 9)).toDF("k", "newpart").createOrReplaceTempView("mv_src")
      spark.sql("""MERGE INTO mv_merge USING mv_src
        ON mv_merge.k = mv_src.k
        WHEN MATCHED THEN UPDATE SET part = mv_src.newpart""")
      val got = spark.table("mv_merge").select($"k", $"v", $"part")
        .as[(Long, Double, Int)].collect().toSet
      assert(got == Set((1L, 1.0, 9), (2L, 2.0, 2)),
        s"moved row must exist ONLY in the new partition: $got")
      // part=1 emptied by the move -> its dir is dropped
      assert(!new java.io.File(s"$loc/part=1").exists())
    } finally spark.sql("DROP TABLE IF EXISTS mv_merge")
  }

  test("MERGE with multiple source matches for one target row raises " +
    "the ANSI cardinality error, target untouched") {
    val loc = tmpDir("multimatch") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS mm_merge")
    spark.sql(s"""CREATE TABLE mm_merge (k BIGINT, v DOUBLE)
      USING parquet LOCATION '$loc'""")
    try {
      spark.sql("INSERT INTO mm_merge VALUES (1, 1.0)")
      Seq((1L, 2.0), (1L, 3.0)).toDF("k", "v")
        .createOrReplaceTempView("mm_src")
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO mm_merge USING mm_src
          ON mm_merge.k = mm_src.k
          WHEN MATCHED THEN UPDATE SET v = mm_src.v""")
      }
      assert(e.getMessage.contains("cardinality"), e.getMessage)
      assert(spark.table("mm_merge").as[(Long, Double)].collect().toSet
        == Set((1L, 1.0)))
    } finally spark.sql("DROP TABLE IF EXISTS mm_merge")
  }

  test("SQL UPDATE assigning a partition column falls back to the " +
    "whole-table rewrite and loses no rows") {
    val loc = tmpDir("mvupd") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS mv_upd")
    spark.sql(s"""CREATE TABLE mv_upd (k BIGINT, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1), (2L, 1), (3L, 2)).toDF("k", "part")
        .write.mode("append").insertInto("mv_upd")
      spark.sql("UPDATE mv_upd SET part = 7 WHERE k = 1")
      val got = spark.table("mv_upd").select($"k", $"part")
        .as[(Long, Int)].collect().toSet
      assert(got == Set((1L, 7), (2L, 1), (3L, 2)), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS mv_upd")
  }

  test("partition values needing Hive path escaping survive MERGE " +
    "(dir names match the writer's escaped form)") {
    val loc = tmpDir("escmerge") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS esc_merge")
    spark.sql(s"""CREATE TABLE esc_merge (k BIGINT, v DOUBLE, part STRING)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, "a:b"), (2L, 2.0, "plain")).toDF("k", "v", "part")
        .write.mode("append").insertInto("esc_merge")
      Seq((1L, 9.0, "a:b"), (3L, 3.0, "x=y")).toDF("k", "v", "part")
        .createOrReplaceTempView("esc_src")
      spark.sql("""MERGE INTO esc_merge USING esc_src
        ON esc_merge.k = esc_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.table("esc_merge").select($"k", $"v", $"part")
        .as[(Long, Double, String)].collect().toSet
      assert(got == Set((1L, 9.0, "a:b"), (2L, 2.0, "plain"),
        (3L, 3.0, "x=y")), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS esc_merge")
  }

  test("hostile partition values (space, slash, percent, unicode) " +
    "survive partition-scoped UPDATE and DELETE dir swaps") {
    val loc = tmpDir("escdml") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS esc_dml")
    spark.sql(s"""CREATE TABLE esc_dml (k BIGINT, v DOUBLE, part STRING)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      // (non-ASCII values are out of scope: the container JVM's file
      // encoding rejects them inside Spark's own writer, before any
      // graft code runs)
      Seq((1L, 1.0, "a b"), (2L, 2.0, "p/q"), (3L, 3.0, "100%"),
        (4L, 4.0, "a#b,c"), (5L, 5.0, "plain"))
        .toDF("k", "v", "part")
        .write.mode("append").insertInto("esc_dml")
      // partition-scoped UPDATE touching the space + slash partitions
      spark.sql("UPDATE esc_dml SET v = v * 10 WHERE k <= 2")
      // partition-scoped DELETE emptying the percent partition (its
      // escaped dir must be found and dropped)
      spark.sql("DELETE FROM esc_dml WHERE part = '100%'")
      val got = spark.table("esc_dml").select($"k", $"v", $"part")
        .as[(Long, Double, String)].collect().toSet
      assert(got == Set((1L, 10.0, "a b"), (2L, 20.0, "p/q"),
        (4L, 4.0, "a#b,c"), (5L, 5.0, "plain")), s"got $got")
      // no bogus visible siblings left behind in the table root
      val visible = new java.io.File(loc).listFiles().map(_.getName)
        .filterNot(n => n.startsWith(".") || n.startsWith("_")).toSet
      assert(visible.forall(_.startsWith("part=")), s"visible: $visible")
      assert(!visible.exists(_.contains("100")), s"visible: $visible")
    } finally spark.sql("DROP TABLE IF EXISTS esc_dml")
  }

  test("timestamp-typed partition values render to the writer's dir " +
    "form (no stray .0 suffix) through MERGE") {
    val loc = tmpDir("tsmerge") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS ts_merge")
    spark.sql(s"""CREATE TABLE ts_merge (k BIGINT, v DOUBLE, part TIMESTAMP)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      spark.sql("""INSERT INTO ts_merge VALUES
        (1, 1.0, TIMESTAMP '2024-01-01 00:00:00'),
        (2, 2.0, TIMESTAMP '2024-02-01 12:30:00')""")
      spark.sql("""CREATE OR REPLACE TEMP VIEW ts_src AS
        SELECT CAST(1 AS BIGINT) AS k, CAST(9.0 AS DOUBLE) AS v,
          TIMESTAMP '2024-01-01 00:00:00' AS part""")
      spark.sql("""MERGE INTO ts_merge USING ts_src
        ON ts_merge.k = ts_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.table("ts_merge").select($"k", $"v")
        .as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 9.0), (2L, 2.0)), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS ts_merge")
  }

  test("star-form MERGE moving a row across partitions: old dir " +
    "dropped AND its catalog partition entry removed") {
    val loc = tmpDir("mvstar") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS mv_star")
    spark.sql(s"""CREATE TABLE mv_star (k BIGINT, v DOUBLE, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, 1), (2L, 2.0, 2)).toDF("k", "v", "part")
        .write.mode("append").insertInto("mv_star")
      Seq((1L, 9.0, 9)).toDF("k", "v", "part")
        .createOrReplaceTempView("mv_star_src")
      spark.sql("""MERGE INTO mv_star USING mv_star_src
        ON mv_star.k = mv_star_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.table("mv_star").select($"k", $"v", $"part")
        .as[(Long, Double, Int)].collect().toSet
      assert(got == Set((1L, 9.0, 9), (2L, 2.0, 2)), s"got $got")
      assert(!new java.io.File(s"$loc/part=1").exists(),
        "emptied source partition dir must be dropped")
      // and the catalog must not keep a stale entry for the dropped dir
      val parts = spark.sql("SHOW PARTITIONS mv_star")
        .collect().map(_.getString(0)).toSet
      assert(parts == Set("part=2", "part=9"), parts.toString)
    } finally spark.sql("DROP TABLE IF EXISTS mv_star")
  }

  test("multi-clause WHEN MATCHED chain: first true clause wins " +
    "(DELETE before UPDATE, per-clause conditions)") {
    val loc = tmpDir("chain1") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS chain_tgt")
    spark.sql(s"""CREATE TABLE chain_tgt (k BIGINT, v DOUBLE)
      USING parquet LOCATION '$loc'""")
    try {
      // k=1 hits the DELETE clause; k=2 falls to the UPDATE clause;
      // k=3 matches but fires NO clause -> unchanged; k=4 unmatched
      Seq((1L, 1.0), (2L, 2.0), (3L, -3.0), (4L, 4.0)).toDF("k", "v")
        .write.mode("append").insertInto("chain_tgt")
      Seq((1L, 0.0), (2L, 99.0), (3L, 0.0)).toDF("k", "nv")
        .createOrReplaceTempView("chain_src")
      spark.sql("""MERGE INTO chain_tgt USING chain_src
        ON chain_tgt.k = chain_src.k
        WHEN MATCHED AND chain_src.nv = 0.0 AND chain_tgt.v > 0 THEN DELETE
        WHEN MATCHED AND chain_tgt.v > 0 THEN UPDATE SET v = chain_src.nv""")
      val got = spark.table("chain_tgt").as[(Long, Double)].collect().toSet
      assert(got == Set((2L, 99.0), (3L, -3.0), (4L, 4.0)), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS chain_tgt")
  }

  test("clause ORDER matters: UPDATE listed before DELETE shadows it " +
    "for rows satisfying both") {
    val loc = tmpDir("chain2") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS chain_ord")
    spark.sql(s"""CREATE TABLE chain_ord (k BIGINT, v DOUBLE)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, 1.0)).toDF("k", "v").write.mode("append")
        .insertInto("chain_ord")
      Seq((1L, 50.0)).toDF("k", "nv").createOrReplaceTempView("chain_ord_src")
      // both conditions true for k=1 — the FIRST clause (UPDATE) wins
      spark.sql("""MERGE INTO chain_ord USING chain_ord_src
        ON chain_ord.k = chain_ord_src.k
        WHEN MATCHED AND chain_ord.v > 0 THEN UPDATE SET v = chain_ord_src.nv
        WHEN MATCHED AND chain_ord.v > 0 THEN DELETE""")
      val got = spark.table("chain_ord").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 50.0)), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS chain_ord")
  }

  test("multiple conditional NOT MATCHED clauses: first firing clause " +
    "picks the projection, non-firing rows are not inserted") {
    val loc = tmpDir("chain3") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS chain_ins")
    spark.sql(s"""CREATE TABLE chain_ins (k BIGINT, v DOUBLE, tag STRING)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, 10.0, "x")).toDF("k", "v", "tag")
        .write.mode("append").insertInto("chain_ins")
      Seq((2L, 2.0), (3L, 30.0), (4L, -4.0)).toDF("k", "v")
        .createOrReplaceTempView("chain_ins_src")
      // k=2 fires clause 1 (v<10 -> tagged 'small', v column left NULL);
      // k=3 falls to clause 2 ('big'); k=4 fires neither -> dropped
      spark.sql("""MERGE INTO chain_ins USING chain_ins_src s
        ON chain_ins.k = s.k
        WHEN NOT MATCHED AND s.v < 10 AND s.v > 0 THEN
          INSERT (k, tag) VALUES (s.k, 'small')
        WHEN NOT MATCHED AND s.v >= 10 THEN
          INSERT (k, v, tag) VALUES (s.k, s.v, 'big')""")
      val got = spark.table("chain_ins")
        .select($"k", $"v", $"tag").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
      assert(got == Set((1L, Some(10.0), "x"), (2L, None, "small"),
        (3L, Some(30.0), "big")), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS chain_ins")
  }

  test("WHEN NOT MATCHED BY SOURCE DELETE retires target rows absent " +
    "from the source; untouched partitions keep their exact files") {
    val loc = tmpDir("nmbs1") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS nmbs_del")
    spark.sql(s"""CREATE TABLE nmbs_del (k BIGINT, v DOUBLE, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, 1), (2L, 2.0, 1), (3L, 3.0, 2), (4L, 4.0, 3))
        .toDF("k", "v", "part").write.mode("append").insertInto("nmbs_del")
      // source still has k=1 (updated) and k=9 (new); k=2/k=3 vanished
      // upstream; the NMBS condition limits retirement to part<=2, so
      // k=4 (part=3, unmatched) survives AND its dir is never touched
      Seq((1L, 10.0, 1), (9L, 9.0, 2)).toDF("k", "v", "part")
        .createOrReplaceTempView("nmbs_del_src")
      def files(p: Int) = new java.io.File(s"$loc/part=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f =>
          f.getName -> f.lastModified()).toMap
      val p3Before = files(3)
      spark.sql("""MERGE INTO nmbs_del USING nmbs_del_src s
        ON nmbs_del.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, part) VALUES (s.k, s.v, s.part)
        WHEN NOT MATCHED BY SOURCE AND nmbs_del.part <= 2 THEN DELETE""")
      val got = spark.table("nmbs_del").select($"k", $"v", $"part")
        .as[(Long, Double, Int)].collect().toSet
      assert(got == Set((1L, 10.0, 1), (9L, 9.0, 2), (4L, 4.0, 3)),
        s"got $got")
      assert(files(3) == p3Before, "out-of-scope partition was rewritten")
    } finally spark.sql("DROP TABLE IF EXISTS nmbs_del")
  }

  test("WHEN NOT MATCHED BY SOURCE UPDATE marks vanished rows without " +
    "touching matched or inserted ones") {
    val loc = tmpDir("nmbs2") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS nmbs_upd")
    spark.sql(s"""CREATE TABLE nmbs_upd (k BIGINT, v DOUBLE, alive BOOLEAN)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, 1.0, true), (2L, 2.0, true), (3L, 3.0, true))
        .toDF("k", "v", "alive").write.mode("append").insertInto("nmbs_upd")
      Seq((1L, 10.0)).toDF("k", "v").createOrReplaceTempView("nmbs_upd_src")
      spark.sql("""MERGE INTO nmbs_upd USING nmbs_upd_src s
        ON nmbs_upd.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE AND nmbs_upd.v < 3 THEN
          UPDATE SET alive = false""")
      val got = spark.table("nmbs_upd").as[(Long, Double, Boolean)]
        .collect().toSet
      // k=2 soft-retired; k=3 unmatched but condition false -> untouched
      assert(got == Set((1L, 10.0, true), (2L, 2.0, false), (3L, 3.0, true)),
        s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS nmbs_upd")
  }

  test("NMBS DELETE that empties a partition drops its dir; NMBS-only " +
    "MERGE (no matched/insert clauses) is supported") {
    val loc = tmpDir("nmbs3") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS nmbs_only")
    spark.sql(s"""CREATE TABLE nmbs_only (k BIGINT, part INT)
      USING parquet PARTITIONED BY (part) LOCATION '$loc'""")
    try {
      Seq((1L, 1), (2L, 2)).toDF("k", "part")
        .write.mode("append").insertInto("nmbs_only")
      Seq(Tuple1(2L)).toDF("k").createOrReplaceTempView("nmbs_only_src")
      spark.sql("""MERGE INTO nmbs_only USING nmbs_only_src s
        ON nmbs_only.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      assert(spark.table("nmbs_only").select($"k").as[Long]
        .collect().toSeq == Seq(2L))
      assert(!new java.io.File(s"$loc/part=1").exists(),
        "fully-retired partition dir should be dropped")
    } finally spark.sql("DROP TABLE IF EXISTS nmbs_only")
  }

  test("the full incremental-ingest MERGE shape: matched DELETE+UPDATE " +
    "chain, conditional INSERT, NMBS DELETE — one statement") {
    val loc = tmpDir("chainfull") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS chain_full")
    spark.sql(s"""CREATE TABLE chain_full (k BIGINT, v DOUBLE)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("k", "v")
        .write.mode("append").insertInto("chain_full")
      // k=1: matched, op=del -> deleted; k=2: matched -> updated;
      // k=5: unmatched, op=add -> inserted; k=6: unmatched, op=del ->
      // not inserted; k=3,4: not matched by source -> retired
      Seq((1L, 0.0, "del"), (2L, 20.0, "upd"), (5L, 5.0, "add"),
        (6L, 6.0, "del")).toDF("k", "v", "op")
        .createOrReplaceTempView("chain_full_src")
      spark.sql("""MERGE INTO chain_full USING chain_full_src s
        ON chain_full.k = s.k
        WHEN MATCHED AND s.op = 'del' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED AND s.op <> 'del' THEN INSERT (k, v) VALUES (s.k, s.v)
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      val got = spark.table("chain_full").as[(Long, Double)].collect().toSet
      assert(got == Set((2L, 20.0), (5L, 5.0)), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS chain_full")
  }

  test("MERGE INTO a catalog SNAPSHOT table: multi-clause chain commits " +
    "ONE time-travelable manifest version; NMBS retires vanished rows") {
    val base = tmpDir("snapmerge")
    val cat = "snapm" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    val t = s"$base/lake/t"
    graft.operators.Versioned.commit(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
        .toDF("k", "v"), t) // v0
    Seq((1L, 100.0, "upd"), (2L, 0.0, "del"), (9L, 9.0, "ins"))
      .toDF("k", "v", "op").createOrReplaceTempView("snap_src")
    // k=1 updated, k=2 deleted, k=9 inserted, k=3/4 NOT matched by
    // source -> retired by the NMBS clause when v < 40
    spark.sql(s"""MERGE INTO $cat.lake.t AS T USING snap_src AS S
      ON T.k = S.k
      WHEN MATCHED AND S.op = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = S.v
      WHEN NOT MATCHED AND S.op = 'ins' THEN INSERT (k, v) VALUES (S.k, S.v)
      WHEN NOT MATCHED BY SOURCE AND T.v < 40 THEN DELETE""")
    val got = spark.sql(s"SELECT k, v FROM $cat.lake.t")
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 100.0), (4L, 40.0), (9L, 9.0)), s"got $got")
    // one new version, operation=merge, pre-merge state time-travelable
    assert(graft.operators.Versioned.versions(spark, t) == Seq(0L, 1L))
    assert(graft.operators.Versioned.readMeta(spark, t, 1L)
      .get("operation").contains("merge"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t VERSION AS OF 0")
      .as[Long].head() == 4L)
  }

  test("MERGE INTO a BUCKETED snapshot table keeps the SPJ layout; " +
    "cardinality violations refuse before committing") {
    val base = tmpDir("snapmerge")
    val cat = "snapb" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    val t = s"$base/lake/t"
    graft.operators.Versioned.commitBucketed(
      (1L to 12L).map(k => (k, k * 1.0)).toDF("k", "v"), t, "k", 4)
    Seq((1L, 111.0)).toDF("k", "v").createOrReplaceTempView("snapb_src")
    spark.sql(s"""MERGE INTO $cat.lake.t AS T USING snapb_src AS S
      ON T.k = S.k
      WHEN MATCHED THEN UPDATE SET v = S.v""")
    assert(graft.operators.Versioned.bucketSpec(spark, t)
      .contains(("k", 4)), "merge must re-bucket under the declared spec")
    assert(spark.sql(s"SELECT v FROM $cat.lake.t WHERE k = 1")
      .as[Double].head() == 111.0)
    // duplicate source matches: ANSI cardinality error, no commit
    val vs = graft.operators.Versioned.versions(spark, t)
    Seq((2L, 1.0), (2L, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("snapb_dup")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.lake.t AS T USING snapb_dup AS S
        ON T.k = S.k
        WHEN MATCHED THEN UPDATE SET v = S.v""")
    }
    assert(e.getMessage.contains("cardinality") ||
      e.getCause != null && e.getCause.getMessage.contains("cardinality"),
      e.getMessage)
    assert(graft.operators.Versioned.versions(spark, t) == vs,
      "a refused merge must not commit")
  }

  test("MERGE vs concurrent commits on a snapshot table: out-of-domain " +
    "appends REBASE into the commit; in-domain appends and touched " +
    "lines refuse loudly") {
    import graft.operators.Versioned
    val base = tmpDir("snapmerge")
    val cat = "snapr" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    val t = s"$base/lake/t"
    Versioned.commit((1L to 4L).map(k => (k, k * 10.0)).toDF("k", "v")
      .coalesce(1), t) // v0
    Seq((1L, 111.0)).toDF("k", "v").createOrReplaceTempView("reb_src")
    def mergeSql(): Unit = spark.sql(
      s"""MERGE INTO $cat.lake.t AS T USING reb_src AS S
        ON T.k = S.k
        WHEN MATCHED THEN UPDATE SET v = S.v""")
    // 1) append OUTSIDE the source key domain (k=500 vs window [1,1]):
    //    the merge must commit WITHOUT recompute, carrying the append
    // thread-guarded: suites run in parallel, and a foreign MERGE's
    // rebase window must not consume (or mis-time) this interleave
    val self = Thread.currentThread()
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Versioned.rebaseTestHook = () => {
      if ((Thread.currentThread() eq self) &&
          fired.compareAndSet(false, true))
        Versioned.commit(Seq((500L, 5.0)).toDF("k", "v").coalesce(1),
          t, "append")
    }
    try mergeSql() finally Versioned.rebaseTestHook = () => ()
    val got = spark.sql(s"SELECT k, v FROM $cat.lake.t")
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 111.0), (2L, 20.0), (3L, 30.0), (4L, 40.0),
      (500L, 5.0)),
      s"the merge AND the interleaved append must both survive: $got")
    assert(Versioned.versions(spark, t) == Seq(0L, 1L, 2L))
    // 2) append INSIDE the key domain (k=1): the appended row is one
    //    the merge would have matched — refuse, never silently rebase
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    Versioned.rebaseTestHook = () => {
      if ((Thread.currentThread() eq self) &&
          fired2.compareAndSet(false, true))
        Versioned.commit(Seq((1L, 9.0)).toDF("k", "v").coalesce(1),
          t, "append")
    }
    val e1 = try intercept[IllegalStateException](mergeSql())
    finally Versioned.rebaseTestHook = () => ()
    assert(e1.getMessage.contains("lost the commit race"))
    // the interleaved append itself must not be lost
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t WHERE k = 1")
      .as[Long].head() == 2L)
    spark.sql(s"DELETE FROM $cat.lake.t WHERE v = 9.0") // restore 1 row
    // 3) a touched base line (concurrent DV delete): stale read → refuse
    val fired3 = new java.util.concurrent.atomic.AtomicBoolean(false)
    Versioned.rebaseTestHook = () => {
      if ((Thread.currentThread() eq self) &&
          fired3.compareAndSet(false, true))
        Versioned.deleteWithDv(spark, t, _ => true,
          org.apache.spark.sql.functions.col("k") === 3L)
    }
    val e2 = try intercept[IllegalStateException](mergeSql())
    finally Versioned.rebaseTestHook = () => ()
    assert(e2.getMessage.contains("lost the commit race"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t WHERE k = 3")
      .as[Long].head() == 0L, "the interleaved DV delete must survive")
  }

  test("unsupported MERGE shapes (nested struct-field assignment) are " +
    "left to Spark's own error, never silently mis-executed") {
    val loc = tmpDir("mergesql3") + "/tgt"
    spark.sql("DROP TABLE IF EXISTS merge_guard")
    spark.sql(s"""CREATE TABLE merge_guard
      (k BIGINT, s STRUCT<a: DOUBLE, b: DOUBLE>)
      USING parquet LOCATION '$loc'""")
    try {
      Seq((1L, 9.0)).toDF("k", "a").createOrReplaceTempView("merge_guard_src")
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO merge_guard USING merge_guard_src
          ON merge_guard.k = merge_guard_src.k
          WHEN MATCHED THEN UPDATE SET s.a = merge_guard_src.a""")
      }
      assert(e.getMessage != null)
      // and the table was not touched
      assert(spark.table("merge_guard").count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS merge_guard")
  }
}
