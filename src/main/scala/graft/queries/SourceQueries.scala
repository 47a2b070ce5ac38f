package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format breadth (SURVEY §2.1 S-family beyond parquet/JDBC):
  * CSV and JSON-lines read paths with explicit schemas, verified by
  * round-tripping a parquet table through the format and comparing
  * against the original via the DuckDB oracle. Staged files are
  * memoized per (JVM, sf dir) — the write is harness setup; the query
  * times the READ path.
  */
object SourceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private val stages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def staged(s: SparkSession, dir: String, table: String,
      format: String): String =
    stages.computeIfAbsent(s"$dir|$table|$format", { _ =>
      val out = java.nio.file.Files.createTempDirectory(s"src_$format")
        .toString + s"/$table"
      val w = t(s, dir, table).coalesce(1).write.mode("overwrite")
      (format match {
        case "csv" => w.option("header", "true")
        case _ => w
      }).format(format).save(out)
      out
    })

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- S13 CSV read with explicit schema (header, quoted fields —
    // commas in n_comment exercise the quote path)
    "s13_csv_roundtrip" -> QueryDef(
      (s, dir) => {
        val schema = t(s, dir, "nation").schema
        s.read.schema(schema).option("header", "true")
          .csv(staged(s, dir, "nation", "csv"))
      },
      Some("SELECT * FROM nation")),

    // ---- S14 JSON-lines read with explicit schema
    "s14_jsonl_roundtrip" -> QueryDef(
      (s, dir) => {
        val schema = t(s, dir, "supplier").schema
        s.read.schema(schema)
          .json(staged(s, dir, "supplier", "json"))
      },
      Some("SELECT * FROM supplier")),

    // ---- S15 ORC read (Spark's second built-in columnar format —
    // vectorized reader, predicate pushdown and column pruning like
    // parquet). DuckDB can't read ORC, so the oracle compares the
    // round-tripped table against the parquet original — any encode/
    // decode divergence (types, nulls, timestamps) breaks the hash.
    "s15_orc_roundtrip" -> QueryDef(
      (s, dir) => {
        val schema = t(s, dir, "customer").schema
        s.read.schema(schema).orc(staged(s, dir, "customer", "orc"))
      },
      Some("SELECT * FROM customer")),

    // ---- VT1 versioned snapshots + time travel (operators.Versioned —
    // the manifest-log discipline the reference gets from Delta):
    // v0 = pre-1997 lineitem, v1 = v0 + 1997 appended, v2 = an
    // unrelated overwrite. Reading each PINNED version back proves
    // historic versions survive later commits; counts are closed-form.
    "vt1_time_travel" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_quantity", $"l_shipdate", $"l_returnflag")
        val table = java.nio.file.Files
          .createTempDirectory("vt1").toString + "/t"
        graft.operators.Versioned.commit(
          li.where($"l_shipdate" < lit("1997-01-01").cast("timestamp")),
          table)
        graft.operators.Versioned.commit(
          li.where($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp")),
          table, "append")
        graft.operators.Versioned.commit(
          li.where($"l_returnflag" === "R"), table, "overwrite")
        Seq(0L, 1L, 2L).map { v =>
          graft.operators.Versioned.read(s, table, Some(v))
            .agg(count(lit(1)).as("n_rows"))
            .select(lit(v.toInt).as("version"), $"n_rows")
        }.reduce(_.unionByName(_))
      },
      Some("""SELECT CAST(0 AS INT) AS version, count(*) AS n_rows
          FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 1, count(*) FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT 2, count(*) FROM lineitem WHERE l_returnflag = 'R'""")),

    // ---- VT2 RESTORE (Delta's roll-back discipline over the same
    // manifest log): v0 = pre-1997 lineitem, v1 = an unrelated
    // overwrite, then SQL `RESTORE … TO VERSION 0` — the LATEST read
    // must equal v0's content again, with the restore recorded as a
    // new commit (proven by version count), not a history rewrite.
    "vt2_restore" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_shipdate", $"l_returnflag")
        val table = java.nio.file.Files
          .createTempDirectory("vt2").toString + "/t"
        graft.operators.Versioned.commit(
          li.where($"l_shipdate" < lit("1997-01-01").cast("timestamp")),
          table)
        graft.operators.Versioned.commit(
          li.where($"l_returnflag" === "R"), table, "overwrite")
        s.sql(s"RESTORE '$table' TO VERSION 0")
        graft.operators.Versioned.read(s, table)
          .agg(count(lit(1)).as("n_rows"),
            lit(graft.operators.Versioned.versions(s, table).size)
              .as("n_versions"))
      },
      Some("""SELECT count(*) AS n_rows, 3 AS n_versions
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'""")),

    // ---- VT3 DSv2 catalog read path (sources.GraftCatalog): the same
    // manifest-log table read through Spark's NATIVE time-travel SQL —
    // `graft_vt3.lake.li VERSION AS OF 0` and the latest read, counts
    // closed-form. The catalog + staged table are memoized per
    // (JVM, sf dir): the catalog manager caches the plugin instance at
    // first use, so the root conf must stay stable across bench passes.
    "vt3_catalog_read" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rootDir = stages.computeIfAbsent(s"$dir|vt3|catalog", { _ =>
          val r = java.nio.file.Files.createTempDirectory("vt3").toString
          val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
          graft.operators.Versioned.commit(
            li.where($"l_shipdate" < lit("1997-01-01").cast("timestamp")),
            s"$r/lake/li")
          graft.operators.Versioned.commit(
            li.where($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp")),
            s"$r/lake/li", "append")
          r
        })
        // catalog name carries the sf-dir hash: the catalog manager
        // caches the plugin per NAME at first use, so a second sf dir
        // in the same session must resolve to its own catalog instance
        val cat = "graft_vt3_" + graft.operators.SnapshotScan.pathToken(dir)
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        s.sql(s"""SELECT CAST(0 AS INT) AS version, count(*) AS n_rows
            FROM $cat.lake.li VERSION AS OF 0
          UNION ALL SELECT 1, count(*) FROM $cat.lake.li""")
      },
      Some("""SELECT CAST(0 AS INT) AS version, count(*) AS n_rows
          FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 1, count(*) FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1998-01-01'""")),

    // ---- VT4 DSv2 catalog SQL WRITES (the other half of vt3): CTAS
    // from the source table, INSERT INTO append, INSERT OVERWRITE
    // re-snapshot — each lands as one atomic manifest commit, then the
    // result plus the surviving pre-overwrite history is read back
    // through the same catalog. Staged per (JVM, sf dir) like vt3 (the
    // writes must happen exactly once per process).
    "vt4_catalog_write" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cat = "graft_vt4_" + graft.operators.SnapshotScan.pathToken(dir)
        val rootDir = stages.computeIfAbsent(s"$dir|vt4|root", { _ =>
          java.nio.file.Files.createTempDirectory("vt4").toString
        })
        // conf re-set every invocation (cheap, idempotent) — like vt3,
        // the catalog instance is cached per NAME at first use
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        stages.computeIfAbsent(s"$dir|vt4|writes", { _ =>
          t(s, dir, "nation").select($"n_nationkey", $"n_name")
            .createOrReplaceTempView("vt4_src")
          // CTAS = v0+v1 (create + insert); INSERT INTO = v2;
          // INSERT OVERWRITE = v3
          s.sql(s"""CREATE TABLE $cat.lake.n AS
              SELECT n_nationkey, n_name FROM vt4_src""")
          s.sql(s"""INSERT INTO $cat.lake.n
              SELECT n_nationkey + 1000, n_name FROM vt4_src""")
          s.sql(s"""INSERT OVERWRITE $cat.lake.n
              SELECT n_nationkey, n_name FROM vt4_src
              WHERE n_nationkey < 10""")
          "done"
        })
        s.sql(s"""SELECT 'latest' AS state, count(*) AS n_rows
            FROM $cat.lake.n
          UNION ALL SELECT 'pre_overwrite', count(*)
            FROM $cat.lake.n VERSION AS OF 2""")
      },
      Some("""SELECT 'latest' AS state, count(*) AS n_rows
          FROM nation WHERE n_nationkey < 10
        UNION ALL
        SELECT 'pre_overwrite', 2 * count(*) FROM nation""")),

    // ---- CF1 change feed (Delta-CDF-lite over the same manifest log):
    // three appends (pre-1997 / 1997 / 1998), then `changes(0, 2)` must
    // be EXACTLY the rows of the two later appends — the incremental
    // feed a downstream consumer tails, whose read cost tracks the
    // delta (only the added segments are opened), never the table.
    "cf1_change_feed" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
        val table = java.nio.file.Files
          .createTempDirectory("cf1").toString + "/t"
        def slice(lo: String, hi: String) =
          li.where($"l_shipdate" >= lit(lo).cast("timestamp") &&
            $"l_shipdate" < lit(hi).cast("timestamp"))
        graft.operators.Versioned.commit(
          li.where($"l_shipdate" < lit("1997-01-01").cast("timestamp")),
          table)
        graft.operators.Versioned.commit(
          slice("1997-01-01", "1998-01-01"), table, "append")
        graft.operators.Versioned.commit(
          slice("1998-01-01", "1999-01-01"), table, "append")
        graft.operators.Versioned.changes(s, table, 0L, 2L)
          .groupBy(year($"l_shipdate").as("yr"))
          .agg(count(lit(1)).as("n_rows"))
      },
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS yr,
          count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY 1""")),

    // ---- CF2 ROW-LEVEL change feed over COW DML (Delta-CDF
    // semantics where cf1 is file-level): per-year segments, then a
    // DELETE of 1997, an UPDATE of pre-1996, and a re-append of the
    // 1997 slice. `rowChanges` reconstructs each commit's row deltas
    // by diffing its replaced segments against their replacements —
    // carried rows (both files and rows-within-rewritten-files)
    // cancel, so a downstream consumer sees exactly the deleted rows
    // as `delete`, the updated rows as `update_preimage`/
    // `update_postimage` pairs, and the appended rows as `insert`,
    // at a diff cost tracking the rewritten segments, never the
    // table. Staged once per (JVM, sf dir) — DML must run exactly
    // once; re-invocations re-read the committed history, which is
    // immutable. Output: exact integer cents (BIGINT).
    "cf2_row_cdf" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val table = stages.computeIfAbsent(s"$dir|cf2|cdf", { _ =>
          val td = java.nio.file.Files
            .createTempDirectory("cf2").toString + "/t"
          val li = t(s, dir, "lineitem")
            .select($"l_orderkey", $"l_quantity", $"l_shipdate")
          (1995 to 2001).foreach { y =>
            graft.operators.Versioned.commit(
              li.where(year($"l_shipdate") === y), td,
              if (y == 1995) "overwrite" else "append")
          } // v0..v6
          s.sql(s"""DELETE FROM '$td'
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'""") // v7
          s.sql(s"""UPDATE '$td' SET l_quantity = l_quantity + 100
            WHERE l_shipdate < TIMESTAMP '1996-01-01'""") // v8
          graft.operators.Versioned.commit(
            li.where(year($"l_shipdate") === 1997), td, "append") // v9
          td
        })
        graft.operators.Versioned.rowChanges(s, table, 6L, 9L)
          .groupBy($"_change_type".as("change_type"),
            year($"l_shipdate").as("yr"))
          .agg(count(lit(1)).as("n_rows"),
            graft.functions.Exact.sumExact(
              graft.functions.Exact.cents($"l_quantity"))
              .cast("long").as("qty_cents"))
      },
      Some("""WITH y1997 AS (
          SELECT l_quantity FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'),
        pre1996 AS (
          SELECT l_quantity FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1996-01-01')
        SELECT 'delete' AS change_type, 1997 AS yr,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
              AS qty_cents
          FROM y1997
        UNION ALL
        SELECT 'update_preimage', 1995, CAST(count(*) AS BIGINT),
            CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
          FROM pre1996
        UNION ALL
        SELECT 'update_postimage', 1995, CAST(count(*) AS BIGINT),
            CAST(sum(CAST(round(l_quantity*100) AS BIGINT) + 10000)
              AS BIGINT)
          FROM pre1996
        UNION ALL
        SELECT 'insert', 1997, CAST(count(*) AS BIGINT),
            CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
          FROM y1997""")),

    // ---- VT5 copy-on-write DML (Versioned.rewrite + StatsPruner):
    // one segment per ship year, then a DELETE of 1997 and an UPDATE
    // of pre-1993 rows — each statement scopes its rewrite through the
    // manifest's per-file stats, carrying every other year's segment
    // forward verbatim (the Delta DELETE/UPDATE discipline; at 100 TB
    // the rewrite cost tracks the matched year, never the table). The
    // read-back aggregate proves both statements' row-level semantics;
    // staged per (JVM, sf dir) because DML mutates — the statements
    // must run exactly once per process, and re-invocations (bench's
    // second pass) read the already-mutated table. Output: exact
    // integer quantity cents (BIGINT), engine-version-proof.
    "vt5_cow_dml" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val table = stages.computeIfAbsent(s"$dir|vt5|dml", { _ =>
          val td = java.nio.file.Files
            .createTempDirectory("vt5").toString + "/t"
          val li = t(s, dir, "lineitem")
            .select($"l_orderkey", $"l_quantity", $"l_shipdate")
          // the synthetic testdata ships 1995–2001 (NOT TPC-H's
          // 1992–1998); the segments must cover every row or the
          // read-back diverges from the oracle's whole-table view
          (1995 to 2001).foreach { y =>
            graft.operators.Versioned.commit(
              li.where(year($"l_shipdate") === y), td,
              if (y == 1995) "overwrite" else "append")
          }
          s.sql(s"""DELETE FROM '$td'
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'""")
          s.sql(s"""UPDATE '$td' SET l_quantity = l_quantity + 100
            WHERE l_shipdate < TIMESTAMP '1996-01-01'""")
          td
        })
        graft.operators.Versioned.read(s, table).agg(
          count(lit(1)).as("n_rows"),
          graft.functions.Exact.sumExact(
            graft.functions.Exact.cents($"l_quantity"))
            .cast("long").as("qty_cents"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(round(l_quantity*100) AS BIGINT)
            + CASE WHEN l_shipdate < TIMESTAMP '1996-01-01'
              THEN 10000 ELSE 0 END) AS BIGINT) AS qty_cents
        FROM lineitem
        WHERE NOT (l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01')""")),

    // ---- VT7 deletion-vector (merge-on-read) DELETE: per-year
    // segments, then a whole-year DV delete plus a partial-file DV
    // delete under spark.graft.delete.mode=dv — each commits a
    // row-index sidecar + manifest refs, REWRITING NO SEGMENT (the
    // staging block asserts it: the data-file set is unchanged, the
    // write amplification a one-row GDPR delete must not pay at
    // 100 TB). The read-back aggregate proves the DV overlay skips
    // exactly the deleted rows; DvSpec proves the mechanics
    // (stacking, OPTIMIZE folding, catalog fallback, vacuum sweep).
    // Output: exact integer cents (BIGINT).
    "vt7_dv_delete" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val table = stages.computeIfAbsent(s"$dir|vt7|dv", { _ =>
          val td = java.nio.file.Files
            .createTempDirectory("vt7").toString + "/t"
          val li = t(s, dir, "lineitem")
            .select($"l_orderkey", $"l_quantity", $"l_shipdate")
          (1995 to 2001).foreach { y =>
            graft.operators.Versioned.commit(
              li.where(year($"l_shipdate") === y), td,
              if (y == 1995) "overwrite" else "append")
          }
          val filesBefore =
            graft.operators.Versioned.versionFiles(s, td).toSet
          s.conf.set("spark.graft.delete.mode", "dv")
          try {
            s.sql(s"""DELETE FROM '$td'
              WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                AND l_shipdate < TIMESTAMP '1999-01-01'""")
            s.sql(s"""DELETE FROM '$td'
              WHERE l_orderkey % 7 = 0
                AND l_shipdate >= TIMESTAMP '1999-01-01'
                AND l_shipdate < TIMESTAMP '2000-01-01'""")
          } finally s.conf.unset("spark.graft.delete.mode")
          require(graft.operators.Versioned.versionFiles(s, td).toSet
            == filesBefore,
            "DV deletes must not rewrite or add data segments")
          td
        })
        graft.operators.Versioned.read(s, table).agg(
          count(lit(1)).as("n_rows"),
          graft.functions.Exact.sumExact(
            graft.functions.Exact.cents($"l_quantity"))
            .cast("long").as("qty_cents"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
            AS qty_cents
        FROM lineitem
        WHERE NOT (l_shipdate >= TIMESTAMP '1998-01-01'
            AND l_shipdate < TIMESTAMP '1999-01-01')
          AND NOT (l_orderkey % 7 = 0
            AND l_shipdate >= TIMESTAMP '1999-01-01'
            AND l_shipdate < TIMESTAMP '2000-01-01')""")),

    // ---- VT8 deletion-vector (merge-on-read) UPDATE: per-year orders
    // segments, then `UPDATE … SET o_totalprice = o_totalprice + 5
    // WHERE year = 1997` under spark.graft.update.mode=dv — matched
    // rows are DV-deleted from their segment and their post-images
    // appended as ONE fresh segment in the same commit (the staging
    // block asserts every pre-existing data file survives untouched).
    // The read-back aggregate proves exactly the matched rows changed
    // and nothing was lost or duplicated. Output: exact integer cents
    // (BIGINT).
    "vt8_dv_update" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val table = stages.computeIfAbsent(s"$dir|vt8|dvu", { _ =>
          val td = java.nio.file.Files
            .createTempDirectory("vt8").toString + "/t"
          val o = t(s, dir, "orders")
            .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
          (1995 to 2001).foreach { y =>
            graft.operators.Versioned.commit(
              o.where(year($"o_orderdate") === y), td,
              if (y == 1995) "overwrite" else "append")
          }
          val filesBefore =
            graft.operators.Versioned.versionFiles(s, td).toSet
          s.conf.set("spark.graft.update.mode", "dv")
          try s.sql(s"""UPDATE '$td'
              SET o_totalprice = o_totalprice + 5
              WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01'""")
          finally s.conf.unset("spark.graft.update.mode")
          require(filesBefore.subsetOf(
            graft.operators.Versioned.versionFiles(s, td).toSet),
            "DV update must append post-images without rewriting " +
              "any pre-existing segment")
          td
        })
        graft.operators.Versioned.read(s, table).agg(
          count(lit(1)).as("n_rows"),
          graft.functions.Exact.sumExact(
            graft.functions.Exact.cents($"o_totalprice"))
            .cast("long").as("price_cents"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)
            + CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01'
              THEN 500 ELSE 0 END) AS BIGINT) AS price_cents
        FROM orders""")),

    // ---- VT9 additive schema evolution via DDL (ALTER TABLE ADD
    // COLUMN as a commit): base orders snapshot, ADD COLUMN, then an
    // INSERT filling the new column for a slice — existing rows read
    // NULL through the mergeSchema union, new rows carry values, and
    // time travel to before the DDL must NOT see the column (proven
    // in-query by a require on the pinned-version schema). Output:
    // exact integer counts/cents.
    "vt9_add_column" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cat = "vt9cat" + math.abs(dir.hashCode).toString
        val table = stages.computeIfAbsent(s"$dir|vt9|addcol", { _ =>
          val root = java.nio.file.Files
            .createTempDirectory("vt9").toString
          s.conf.set(s"spark.sql.catalog.$cat",
            classOf[graft.sources.GraftCatalog].getName)
          s.conf.set(s"spark.sql.catalog.$cat.root", root)
          val td = s"$root/lake/t"
          graft.operators.Versioned.commit(
            t(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
            td) // v0
          s.sql(s"ALTER TABLE $cat.lake.t ADD COLUMN bonus_cents BIGINT")
          s.sql(s"""INSERT INTO $cat.lake.t
            SELECT o_orderkey + 20000000, o_totalprice,
                   CAST(o_orderkey % 1000 AS BIGINT)
            FROM $cat.lake.t VERSION AS OF 0
            WHERE o_orderkey % 11 = 0""")
          require(!graft.operators.Versioned
            .read(s, td, Some(0L)).columns.contains("bonus_cents"),
            "time travel to before the DDL must not see the column")
          td
        })
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root",
          table.stripSuffix("/lake/t"))
        s.sql(s"""SELECT count(*) AS n_rows,
            CAST(count(bonus_cents) AS BIGINT) AS n_filled,
            CAST(sum(bonus_cents) AS BIGINT) AS bonus_total
          FROM $cat.lake.t""")
      },
      Some("""SELECT
          CAST(count(*) + sum(CASE WHEN o_orderkey % 11 = 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_filled,
          CAST(sum(CASE WHEN o_orderkey % 11 = 0
            THEN o_orderkey % 1000 ELSE 0 END) AS BIGINT) AS bonus_total
        FROM orders""")),

    // ---- VT10 column mapping (ALTER TABLE RENAME/DROP COLUMN as
    // metadata-only commits over stable physical names): base orders
    // snapshot with three columns, RENAME amount_cents->price_cents,
    // DROP the cust column, then an INSERT under the NEW name — reads
    // resolve the logical view, time travel to v0 reads the old names
    // (proven in-query by requires), and zero data files move for
    // either DDL. Output: exact integer counts/cents.
    "vt10_rename_column" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cat = "vt10cat" + math.abs(dir.hashCode).toString
        val table = stages.computeIfAbsent(s"$dir|vt10|colmap", { _ =>
          val root = java.nio.file.Files
            .createTempDirectory("vt10").toString
          s.conf.set(s"spark.sql.catalog.$cat",
            classOf[graft.sources.GraftCatalog].getName)
          s.conf.set(s"spark.sql.catalog.$cat.root", root)
          val td = s"$root/lake/t"
          graft.operators.Versioned.commit(
            t(s, dir, "orders").select($"o_orderkey",
              graft.functions.Exact.cents($"o_totalprice")
                .as("amount_cents"),
              $"o_custkey".as("cust")),
            td) // v0
          val files0 = graft.operators.Versioned.versionFiles(s, td).toSet
          s.sql(s"ALTER TABLE $cat.lake.t RENAME COLUMN amount_cents " +
            "TO price_cents")
          s.sql(s"ALTER TABLE $cat.lake.t DROP COLUMN cust")
          require(graft.operators.Versioned.versionFiles(s, td).toSet ==
            files0, "RENAME/DROP must move zero data files")
          s.sql(s"""INSERT INTO $cat.lake.t
            SELECT o_orderkey + 30000000, amount_cents + 1
            FROM $cat.lake.t VERSION AS OF 0
            WHERE o_orderkey % 13 = 0""")
          require(graft.operators.Versioned.read(s, td, Some(0L))
            .columns.toSeq == Seq("o_orderkey", "amount_cents", "cust"),
            "time travel must read the pre-rename names")
          require(graft.operators.Versioned.read(s, td)
            .columns.toSeq == Seq("o_orderkey", "price_cents"),
            "the latest view must be renamed and drop-hidden")
          td
        })
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root",
          table.stripSuffix("/lake/t"))
        s.sql(s"""SELECT count(*) AS n_rows,
            CAST(sum(price_cents) AS BIGINT) AS total_cents
          FROM $cat.lake.t""")
      },
      Some("""SELECT
          CAST(count(*) + sum(CASE WHEN o_orderkey % 13 = 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
            + sum(CASE WHEN o_orderkey % 13 = 0
              THEN CAST(round(o_totalprice*100) AS BIGINT) + 1
              ELSE 0 END) AS BIGINT) AS total_cents
        FROM orders""")),

    // ---- VT11 zero-copy shallow clone: DV-delete a slice on the
    // source, CLONE it (one manifest write, no data copied — proven
    // by a require on the clone's data dir), then COW-DELETE another
    // slice on the CLONE only. The clone must see the source's
    // deletion vectors and its own delete; the source must see
    // neither the clone's delete nor any file change. Output: exact
    // integer counts/cents from both tables in one row.
    "vt11_shallow_clone" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val V = graft.operators.Versioned
        val roots = stages.computeIfAbsent(s"$dir|vt11|clone", { _ =>
          val root = java.nio.file.Files
            .createTempDirectory("vt11").toString
          val src = s"$root/src"; val dst = s"$root/dst"
          V.commit(
            t(s, dir, "orders").select($"o_orderkey",
              graft.functions.Exact.cents($"o_totalprice")
                .as("price_cents")).repartition(4), src)
          V.deleteWithDv(s, src, _ => true, $"o_orderkey" % 7 === 0)
          val srcFiles = V.versionFiles(s, src).toSet
          s.sql(s"CLONE '$src' TO '$dst'")
          require(!new java.io.File(s"$dst/data").exists(),
            "a shallow clone must copy zero data segments")
          s.sql(s"DELETE FROM '$dst' WHERE o_orderkey % 5 = 0")
          require(V.versionFiles(s, src).toSet == srcFiles,
            "the clone's DML must not touch one source file")
          root
        })
        val srcDf = V.read(s, s"$roots/src")
        val dstDf = V.read(s, s"$roots/dst")
        dstDf.agg(count(lit(1)).as("clone_rows"),
            sum($"price_cents").cast("long").as("clone_cents"))
          .crossJoin(srcDf.agg(count(lit(1)).as("src_rows")))
      },
      Some("""SELECT
          CAST(sum(CASE WHEN o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0
            THEN 1 ELSE 0 END) AS BIGINT) AS clone_rows,
          CAST(sum(CASE WHEN o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0
            THEN CAST(round(o_totalprice*100) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS clone_cents,
          CAST(sum(CASE WHEN o_orderkey % 7 <> 0
            THEN 1 ELSE 0 END) AS BIGINT) AS src_rows
        FROM orders""")),

    // ---- VT12 in-place CONVERT: a plain parquet landing dir becomes
    // a snapshot table referencing its own files (zero rewrites —
    // proven by a byte-identity require), then a stats-scoped DELETE
    // runs on it like any native table. Output: exact counts/cents.
    "vt12_convert" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val V = graft.operators.Versioned
        val table = stages.computeIfAbsent(s"$dir|vt12|convert", { _ =>
          val root = java.nio.file.Files
            .createTempDirectory("vt12").toString
          val landing = s"$root/landing"
          t(s, dir, "orders").select($"o_orderkey",
            graft.functions.Exact.cents($"o_totalprice")
              .as("price_cents"))
            .repartition(4).write.parquet(landing)
          val fs = new org.apache.hadoop.fs.Path(landing)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          def bytes() = fs.listStatus(
            new org.apache.hadoop.fs.Path(landing))
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map(st => st.getPath.getName -> st.getLen).toMap
          val before = bytes()
          s.sql(s"CONVERT '$landing' TO GRAFT")
          require(bytes() == before,
            "CONVERT must not touch one data byte")
          s.sql(s"DELETE FROM '$landing' WHERE o_orderkey % 9 = 0")
          landing
        })
        V.read(s, table)
          .agg(count(lit(1)).as("n_rows"),
            sum($"price_cents").cast("long").as("total_cents"))
      },
      Some("""SELECT
          CAST(sum(CASE WHEN o_orderkey % 9 <> 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN o_orderkey % 9 <> 0
            THEN CAST(round(o_totalprice*100) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS total_cents
        FROM orders""")),

    // ---- VT13 write-time schema enforcement: a type-conflicting
    // append (STRING cents onto an INT table) is REFUSED before any
    // segment lands — proven by requires inside the stage — and the
    // opt-in widening path (int -> long via spark.graft.schema.widen)
    // commits a declared-schema carrier instead of rewriting the
    // narrow committed files. The final read aggregates BOTH halves
    // (pre-widen int files + post-widen long files) under the wide
    // schema; the oracle recomputes the same split from orders. The
    // pre-fix behavior (append anything, poison the next read) cannot
    // pass this: either the bad append would land (count too high) or
    // the mixed-width read would throw.
    "vt13_schema_enforcement" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val V = graft.operators.Versioned
        val table = stages.computeIfAbsent(s"$dir|vt13|enforce", { _ =>
          val td = java.nio.file.Files
            .createTempDirectory("vt13").toString + "/t"
          val orders = t(s, dir, "orders").select($"o_orderkey",
            graft.functions.Exact.cents($"o_totalprice").as("cents"))
          // v0: the even half, deliberately narrow (int key+cents)
          V.commit(orders.where($"o_orderkey" % 2 === 0)
            .select($"o_orderkey".cast("int").as("k"),
              $"cents".cast("int").as("cents")).repartition(2), td)
          // a STRING append must refuse with the named error and
          // commit NOTHING
          val versionsBefore = V.versions(s, td)
          val refused = try {
            V.commit(Seq((1, "oops")).toDF("k", "cents"), td, "append")
            false
          } catch { case _: graft.operators.SchemaConflict => true }
          require(refused, "a string-onto-int append must refuse")
          require(V.versions(s, td) == versionsBefore,
            "a refused append must not commit")
          // widen opt-in: the odd half appends as BIGINT — the table
          // widens via a schema carrier, no committed file rewritten
          val filesBefore = V.versionFiles(s, td).toSet
          s.conf.set(graft.operators.SchemaEnforce.WidenConf, "true")
          try V.commit(orders.where($"o_orderkey" % 2 =!= 0)
              .select($"o_orderkey".cast("long").as("k"),
                $"cents".cast("long").as("cents")).repartition(2),
              td, "append")
          finally s.conf.unset(graft.operators.SchemaEnforce.WidenConf)
          require(V.versionFiles(s, td).toSet
            .intersect(filesBefore) == filesBefore,
            "widening must not rewrite committed files")
          require(V.schemaCarrier(s, td).isDefined,
            "the widened table must carry a declared schema")
          td
        })
        V.read(s, table).agg(
          count(lit(1)).as("n_rows"),
          sum($"cents").cast("long").as("total_cents"),
          max($"k").cast("long").as("max_k"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
            AS total_cents,
          CAST(max(o_orderkey) AS BIGINT) AS max_k
        FROM orders""")),

    // ---- VT14 bloom point-lookup skipping: orders lands as four
    // ROUND-ROBIN segments (every file spans the whole key range, so
    // manifest min/max cannot prune an interior equality), then a
    // bloom index on the key. Staged requires PROVE the skipping with
    // plan file counts (sources.ScanProbe): the same interior-key
    // lookup opens all 4 files before the index and at most 2 after
    // (1 true + fpp-bounded slack), with identical results. The final
    // answer is a max-key lookup aggregate mirrored closed-form.
    "vt14_bloom_lookup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val V = graft.operators.Versioned
        val cat = "graft_vt14_" + graft.operators.SnapshotScan.pathToken(dir)
        val rootDir = stages.computeIfAbsent(s"$dir|vt14", { _ =>
          val r = java.nio.file.Files.createTempDirectory("vt14").toString
          val td = s"$r/lake/t"
          val orders = t(s, dir, "orders").select($"o_orderkey".as("k"),
            graft.functions.Exact.cents($"o_totalprice").as("cents"))
          (0 to 3).foreach { i =>
            V.commit(orders.where(pmod($"k", lit(4)) === i).coalesce(1),
              td, if (i == 0) "overwrite" else "append")
          }
          s.conf.set(s"spark.sql.catalog.$cat",
            classOf[graft.sources.GraftCatalog].getName)
          s.conf.set(s"spark.sql.catalog.$cat.root", r)
          // an interior key that exists (first key at/above the median)
          val med = orders.agg(
            percentile_approx($"k", lit(0.5), lit(100))).head().getLong(0)
          val probe = orders.where($"k" >= med).agg(min($"k"))
            .head().getLong(0)
          def lookup() =
            s.sql(s"SELECT cents FROM $cat.lake.t WHERE k = $probe")
          val pre = lookup()
          val preRows = pre.collect().toSeq
          require(graft.sources.ScanProbe.scannedFiles(pre).contains(4),
            "pre-index: min/max must be powerless on interleaved keys")
          // fpp 1e-3 so the ≤2-files require is deterministic in
          // practice (at 0.03 a double false positive is ~0.2% —
          // a driver gate must not be a coin flip)
          V.declareBloomIndex(s, td, Seq("k"), fpp = 0.001)
          val post = lookup()
          require(post.collect().toSeq == preRows,
            "bloom pruning must never change an answer")
          val n = graft.sources.ScanProbe.scannedFiles(post)
          require(n.exists(_ <= 2),
            s"post-index: the lookup must open at most 2 of 4 files, got $n")
          r
        })
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        s.sql(s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(cents) AS BIGINT) AS total_cents
          FROM $cat.lake.t
          WHERE k = (SELECT max(k) FROM $cat.lake.t)""")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
            AS total_cents
        FROM orders
        WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders)""")),

    // ---- VT6 metadata-only aggregates (sources.ManifestAggregates):
    // a filterless global COUNT/COUNT(col)/MIN/MAX over a catalog
    // snapshot table is answered from the manifest's per-file stats —
    // the plan is a one-row LocalTableScan, zero data files opened
    // (proven in StatsPruningSpec; at 100 TB this is Delta's
    // "metadata-only count": one manifest read instead of a
    // million-split scan). The driver check proves the stats-computed
    // figures equal the oracle's full-scan figures across three
    // segments, a NULL-bearing column, and a timestamp bound (compared
    // as day-grained epoch seconds — BIGINT, engine-version-proof).
    "vt6_meta_agg" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cat = "graft_vt6_" + graft.operators.SnapshotScan.pathToken(dir)
        val rootDir = stages.computeIfAbsent(s"$dir|vt6|root", { _ =>
          val r = java.nio.file.Files.createTempDirectory("vt6").toString
          val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate",
            when($"l_orderkey" % 3 === 0, $"l_orderkey").as("k3"))
          def cut(y: String) = lit(s"$y-01-01").cast("timestamp")
          graft.operators.Versioned.commit(
            li.where($"l_shipdate" < cut("1997")), s"$r/lake/mt")
          graft.operators.Versioned.commit(
            li.where($"l_shipdate" >= cut("1997") &&
              $"l_shipdate" < cut("1999")), s"$r/lake/mt", "append")
          graft.operators.Versioned.commit(
            li.where($"l_shipdate" >= cut("1999")), s"$r/lake/mt", "append")
          r
        })
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        s.sql(s"""SELECT count(*) AS n_rows, count(k3) AS n_k3,
            min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
            CAST(CAST(max(l_shipdate) AS TIMESTAMP) AS LONG) AS max_ship_s
          FROM $cat.lake.mt""")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(CASE WHEN l_orderkey % 3 = 0 THEN 1 END) AS BIGINT)
            AS n_k3,
          CAST(min(l_orderkey) AS BIGINT) AS min_ok,
          CAST(max(l_orderkey) AS BIGINT) AS max_ok,
          CAST(epoch(max(l_shipdate)) AS BIGINT) AS max_ship_s
        FROM lineitem"""))

    // ---- SPJ1 storage-partitioned join: lineitem and orders committed
    // co-bucketed (commitBucketed, 8 buckets on the order key), then
    // joined through the catalog. The scans report
    // KeyGroupedPartitioning via the catalog's V2 bucket function, so
    // the join runs with ZERO shuffle on either side (plan-proved in
    // SpjSpec; the oracle proves the VALUES). At 100 TB the write-time
    // shuffle is paid once, every later fact-fact join is co-located —
    // the single biggest join cost at scale.
    , "spj1_bucketed_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cat = "graft_spj_" + graft.operators.SnapshotScan.pathToken(dir)
        val rootDir = stages.computeIfAbsent(s"$dir|spj|root", { _ =>
          val r = java.nio.file.Files.createTempDirectory("spj").toString
          graft.operators.Versioned.commitBucketed(
            t(s, dir, "lineitem").select($"l_orderkey", $"l_quantity",
              $"l_extendedprice"),
            s"$r/lake/li", "l_orderkey", 8)
          graft.operators.Versioned.commitBucketed(
            t(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
            s"$r/lake/ord", "o_orderkey", 8)
          r
        })
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        // exact-integer money (Exact.cents convention: round then cast)
        s.sql(s"""SELECT l_orderkey % 10 AS grp,
            count(*) AS n, sum(l_quantity) AS qty,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS price_c,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS total_c
          FROM $cat.lake.li JOIN $cat.lake.ord ON l_orderkey = o_orderkey
          GROUP BY 1""")
      },
      Some("""SELECT CAST(l_orderkey % 10 AS BIGINT) AS grp,
          count(*) AS n, sum(l_quantity) AS qty,
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            AS price_c,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS total_c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1"""))

    // ---- SPJ2 bucketed grouped aggregate: the same KeyGrouped report
    // satisfies ClusteredDistribution, so a groupBy on the bucket key
    // pre-aggregates entirely within buckets — no exchange before the
    // per-key aggregate (SpjSpec plan-proof). The query folds the
    // per-key sums to a compact closed-form row the oracle recomputes.
    , "spj2_bucketed_agg" -> QueryDef(
      (s, dir) => {
        val cat = "graft_spj_" + graft.operators.SnapshotScan.pathToken(dir)
        // reuse spj1's staged lake (stages map is idempotent per sf dir)
        val rootDir = stages.get(s"$dir|spj|root") match {
          case null =>
            import s.implicits._
            stages.computeIfAbsent(s"$dir|spj|root", { _ =>
              val r = java.nio.file.Files.createTempDirectory("spj").toString
              graft.operators.Versioned.commitBucketed(
                t(s, dir, "lineitem").select($"l_orderkey", $"l_quantity",
                  $"l_extendedprice"),
                s"$r/lake/li", "l_orderkey", 8)
              graft.operators.Versioned.commitBucketed(
                t(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
                s"$r/lake/ord", "o_orderkey", 8)
              r
            })
          case r => r
        }
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        s.sql(s"""SELECT count(*) AS n_keys, sum(qty) AS total_qty,
            max(qty) AS max_qty
          FROM (SELECT l_orderkey, sum(l_quantity) AS qty
                FROM $cat.lake.li GROUP BY l_orderkey)""")
      },
      Some("""SELECT count(*) AS n_keys, sum(qty) AS total_qty,
          max(qty) AS max_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS qty
              FROM lineitem GROUP BY l_orderkey)"""))

    // ---- SPJ3 partially-clustered storage-partitioned join: lineitem
    // committed in TWO bucketed appends (two files per bucket), joined
    // under spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
    // — the skew answer for co-bucketed joins: a hot bucket's splits
    // stay separate tasks and the other side's matching partition is
    // replicated across them, instead of one straggler task per bucket
    // (r6 made the scan report per-split partitions so this conf
    // actually bites; SpjSpec plan-proves zero shuffles + split-level
    // task counts). Child session scopes the conf away from
    // concurrently-running queries.
    , "spj3_partial_clustered_join" -> QueryDef(
      (s, dir) => {
        val c = s.newSession()
        c.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        c.conf.set(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        c.conf.set("spark.sql.sources.v2.bucketing" +
          ".partiallyClusteredDistribution.enabled", "true")
        import c.implicits._
        val cat = "graft_pcd_" + graft.operators.SnapshotScan.pathToken(dir)
        val rootDir = stages.computeIfAbsent(s"$dir|spj3|root", { _ =>
          val r = java.nio.file.Files.createTempDirectory("spj3").toString
          val li = t(c, dir, "lineitem")
            .select($"l_orderkey", $"l_quantity")
          // quantity split cuts across keys: every bucket gets rows
          // from both segment files
          graft.operators.Versioned.commitBucketed(
            li.where($"l_quantity" <= 25), s"$r/lake/li", "l_orderkey", 8)
          graft.operators.Versioned.commitBucketed(
            li.where($"l_quantity" > 25), s"$r/lake/li", "l_orderkey", 8,
            "append")
          graft.operators.Versioned.commitBucketed(
            t(c, dir, "orders").select($"o_orderkey", $"o_totalprice"),
            s"$r/lake/ord", "o_orderkey", 8)
          r
        })
        c.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        c.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        c.sql(s"""SELECT l_orderkey % 7 AS grp, count(*) AS n,
            sum(l_quantity) AS qty,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS total_c
          FROM $cat.lake.li JOIN $cat.lake.ord ON l_orderkey = o_orderkey
          GROUP BY 1""")
      },
      Some("""SELECT CAST(l_orderkey % 7 AS BIGINT) AS grp, count(*) AS n,
          sum(l_quantity) AS qty,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS total_c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1"""))

    // ---- SPJ4 bucket-pruned point lookup: equality/IN on the bucket
    // key reaches only the buckets the literals hash to, so the scan
    // plans 1-3 of 8 bucket files BEFORE stats are consulted (SpjSpec
    // proves the planned file list; this query proves the VALUES).
    // The 100 TB shape: a point lookup on a 1024-bucket fact table
    // reads ~0.1% of its files.
    , "spj4_bucket_pruned_lookup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cat = "graft_spj_" + graft.operators.SnapshotScan.pathToken(dir)
        val rootDir = stages.computeIfAbsent(s"$dir|spj|root", { _ =>
          val r = java.nio.file.Files.createTempDirectory("spj").toString
          graft.operators.Versioned.commitBucketed(
            t(s, dir, "lineitem").select($"l_orderkey", $"l_quantity",
              $"l_extendedprice"),
            s"$r/lake/li", "l_orderkey", 8)
          graft.operators.Versioned.commitBucketed(
            t(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
            s"$r/lake/ord", "o_orderkey", 8)
          r
        })
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
        s.sql(s"""SELECT o_orderkey,
            CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
          FROM $cat.lake.ord
          WHERE o_orderkey IN (1, 33, 65) ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders WHERE o_orderkey IN (1, 33, 65)
        ORDER BY o_orderkey"""))
  )
}
