package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / predicate / aggregation / set / window inventory
  * (SURVEY.md §2.2 P1–P12, §2.4 A1–A9, §2.5 W1–W2, §2.6 SET1–SET2),
  * each grounded in the construct the reference issues, re-expressed
  * over the driver testdata tables.
  *
  * Numeric policy for oracle parity (r4, graft.functions.Exact):
  * money is EXACT INTEGERS end to end — 2-dp values become BIGINT
  * cents, products/sums stay integral (decimal(20,0) accumulator for
  * 100-TB headroom), and ONE final int→double conversion + IEEE
  * division produces the compared column. Never a DECIMAL-typed
  * output, never an uncast oracle integer sum, never an
  * order-sensitive raw double sum: each of those diverged across
  * oracle engine versions in rounds 2-3. Integer-valued doubles
  * (quantities, counts) sum exactly below 2^53 and need no cents
  * device. Statistical aggregates (stddev/corr) compare as
  * `round(double, k)` of identical inputs.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- flagship: TPC-H Q1-style pricing summary (A1-family grouped agg).
    // Map-side partial aggregation + 6-group result: shuffles ~nothing at
    // any scale; the scan prunes to 7 of 11 lineitem columns. Money is
    // exact integers end to end (graft.functions.Exact): quantities are
    // integral, prices 2-dp, discounts/taxes 2-dp points, so every sum
    // is an integer total rescaled ONCE — no summation-order noise, no
    // rounding ties, identical on any engine version.
    "q1_pricing_summary" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.functions.Exact
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(round($"l_quantity", 0).cast("long")).cast("double")
              .as("sum_qty"),
            Exact.dollars(Exact.sumExact(Exact.cents($"l_extendedprice")),
              100L).as("sum_base_price"),
            Exact.dollars(Exact.sumExact(
              Exact.revenueE4($"l_extendedprice", $"l_discount")), 10000L)
              .as("sum_disc_price"),
            Exact.dollars(Exact.sumExact(
              Exact.revenueE4($"l_extendedprice", $"l_discount") *
                (lit(100L) + Exact.cents($"l_tax"))), 1000000L)
              .as("sum_charge"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
          / 100.0 AS sum_base_price,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
          * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
          / 10000.0 AS sum_disc_price,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
          * (100 - CAST(round(l_discount * 100) AS BIGINT))
          * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE)
          / 1000000.0 AS sum_charge,
        count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // ---- P1 column projection (Ingest:93 `SELECT config_name, config_value`)
    "p1_projection" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "nation").select($"n_name", $"n_regionkey")
      },
      Some("SELECT n_name, n_regionkey FROM nation")),

    // ---- P2 SELECT * pass-through (Ingest:185)
    "p2_select_star" -> QueryDef(
      (s, dir) => t(s, dir, "region").select("*"),
      Some("SELECT * FROM region")),

    // ---- P3 .select().where() chain (Ingest:133-139)
    "p3_select_where" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").select($"c_custkey", $"c_name")
          .where($"c_mktsegment" === "BUILDING")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'")),

    // ---- P4 equality predicate (Ingest:73)
    "p4_eq_predicate" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").where($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_totalprice")
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'")),

    // ---- P5 IN-list predicate (Ingest:95)
    "p5_in_list" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .where($"p_brand".isin("Brand#12", "Brand#23"))
          .select($"p_partkey", $"p_brand")
      },
      Some("SELECT p_partkey, p_brand FROM part WHERE p_brand IN ('Brand#12','Brand#23')")),

    // ---- P6 boolean flag predicate (Ingest:74 `is_active = TRUE`)
    "p6_bool_flag" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .where(($"l_returnflag" === "R") === lit(true))
          .select($"l_orderkey", $"l_linenumber")
      },
      Some("SELECT l_orderkey, l_linenumber FROM lineitem WHERE (l_returnflag = 'R') = TRUE")),

    // ---- P7 empty-string sentinel count (Ingest:133-135)
    "p7_empty_sentinel" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").where($"text" === "")
          .agg(count(lit(1)).as("cnt"))
      },
      Some("SELECT count(*) AS cnt FROM documents WHERE text = ''")),

    // ---- P8 compound conjunction (Ingest:151-153)
    "p8_compound" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .where($"l_returnflag" === "R" && $"l_linestatus" === "F" &&
            $"l_quantity" > 30)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity > 30""")),

    // ---- P9 watermark range predicate (Ingest:272-283): COALESCE(cols) >=
    // CAST(ts). Pushed to the parquet scan (PushedFilters) exactly as the
    // reference pushes it into the PostgreSQL query string.
    "p9_watermark_range" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .where(coalesce($"l_shipdate") >=
            lit("1999-06-01 00:00:00").cast("timestamp"))
          .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        WHERE COALESCE(l_shipdate) >= CAST('1999-06-01 00:00:00' AS TIMESTAMP)""")),

    // ---- P10 date-part chunk filter (Ingest:257-266, month-arity variant)
    "p10_chunk_filter" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .where(year(coalesce($"l_shipdate")) === 1996 &&
            month(coalesce($"l_shipdate")) === 3)
          .groupBy(dayofmonth(coalesce($"l_shipdate")).as("day"))
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT CAST(day(COALESCE(l_shipdate)) AS INT) AS day, count(*) AS cnt
        FROM lineitem
        WHERE year(COALESCE(l_shipdate)) = 1996 AND month(COALESCE(l_shipdate)) = 3
        GROUP BY 1""")),

    // ---- P11 case-insensitive match (Ingest:389, Config:114)
    "p11_case_insensitive" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "nation")
          .where(lower($"n_name") === lower(lit("Nation_7")))
          .select($"n_nationkey", $"n_name")
      },
      Some("SELECT n_nationkey, n_name FROM nation WHERE lower(n_name) = lower('Nation_7')")),

    // ---- P12 null guards (Ingest:78,155-157,464)
    "p12_null_guard" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .where($"props".isNotNull && $"value".isNotNull)
          .select($"event_id", $"event_type")
      },
      Some("SELECT event_id, event_type FROM events WHERE props IS NOT NULL AND value IS NOT NULL")),

    // ---- A1 chunk probe: grouped count HAVING above limit (Ingest:319,233)
    "a1_chunk_probe_above" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy(year(coalesce($"l_shipdate")).as("year"))
          .agg(count(lit(1)).as("cnt"))
          .where($"cnt" > 8800)
      },
      Some("""SELECT CAST(year(COALESCE(l_shipdate)) AS INT) AS year, count(*) AS cnt
        FROM lineitem GROUP BY 1 HAVING count(*) > 8800""")),

    // ---- A2 chunk probe below limit (Ingest:234,237). The reference drops
    // count==limit between its > and < branches; we emit on <= in the real
    // planner (ChunkPlanner) and keep this probe faithful to the reference.
    "a2_chunk_probe_below" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy(year(coalesce($"l_shipdate")).as("year"))
          .agg(count(lit(1)).as("cnt"))
          .where($"cnt" < 8800)
      },
      Some("""SELECT CAST(year(COALESCE(l_shipdate)) AS INT) AS year, count(*) AS cnt
        FROM lineitem GROUP BY 1 HAVING count(*) < 8800""")),

    // ---- A3 per-day counts, no HAVING (Ingest:239)
    "a3_day_counts" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .where(year(coalesce($"l_shipdate")) === 1997 &&
            month(coalesce($"l_shipdate")) === 6)
          .groupBy(dayofmonth(coalesce($"l_shipdate")).as("day"))
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT CAST(day(COALESCE(l_shipdate)) AS INT) AS day, count(*) AS cnt
        FROM lineitem
        WHERE year(COALESCE(l_shipdate)) = 1997 AND month(COALESCE(l_shipdate)) = 6
        GROUP BY 1""")),

    // ---- A4 DISTINCT projection of a date part (Ingest:209-211)
    "a4_distinct_years" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .select(year(coalesce($"l_shipdate")).as("year")).distinct()
      },
      Some("SELECT DISTINCT CAST(year(COALESCE(l_shipdate)) AS INT) AS year FROM lineitem")),

    // ---- A5 global count (Ingest:469)
    "a5_global_count" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem")),

    // ---- A6 global MAX over COALESCE (Ingest:350-355)
    "a6_max_coalesce" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").agg(max(coalesce($"l_shipdate")).as("maxdate"))
      },
      Some("SELECT max(COALESCE(l_shipdate)) AS maxdate FROM lineitem")),

    // ---- A7 + F4: derived-table agg with the 80-hour late-data lag
    // (Ingest:350 `DATEADD(hour,-80,maxdate)` over a MAX subquery)
    "a7_lagged_watermark" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .agg(max(coalesce($"l_shipdate")).as("maxdate"))
          .select(($"maxdate" - expr("INTERVAL 80 HOURS")).as("last_load"))
      },
      Some("""SELECT maxdate - INTERVAL 80 HOUR AS last_load
        FROM (SELECT max(COALESCE(l_shipdate)) AS maxdate FROM lineitem) x""")),

    // ---- A8 MERGE upsert decomposition (Ingest:373-415): state rows
    // (pre-1997 watermarks) merged with update rows (1997+) — WHEN MATCHED
    // takes the update, WHEN NOT MATCHED keeps/inserts. Expressed as the
    // full-outer-join Delta's MERGE lowers to; keys shuffle-partition both
    // sides so it scales linearly.
    "a8_merge_upsert" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val state = o.where(year($"o_orderdate") < 1997)
          .groupBy($"o_custkey").agg(max($"o_orderdate").as("ts"))
          .select($"o_custkey".as("k"), $"ts")
        val updates = o.where(year($"o_orderdate") >= 1997)
          .groupBy($"o_custkey").agg(max($"o_orderdate").as("ts"))
          .select($"o_custkey".as("k"), $"ts")
        state.as("s").join(updates.as("u"), $"s.k" === $"u.k", "full_outer")
          .select(coalesce($"u.k", $"s.k").as("k"),
            coalesce($"u.ts", $"s.ts").as("last_load"))
      },
      Some("""WITH state AS (
          SELECT o_custkey AS k, max(o_orderdate) AS ts FROM orders
          WHERE year(o_orderdate) < 1997 GROUP BY 1),
        updates AS (
          SELECT o_custkey AS k, max(o_orderdate) AS ts FROM orders
          WHERE year(o_orderdate) >= 1997 GROUP BY 1)
        SELECT COALESCE(u.k, s.k) AS k, COALESCE(u.ts, s.ts) AS last_load
        FROM state s FULL OUTER JOIN updates u ON s.k = u.k""")),

    // ---- A9 [EXT] rollup (free via Spark, SURVEY §2.4 A9)
    "a9_rollup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(round(sum($"l_quantity"), 2).as("sum_qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // ---- A10 [EXT] exact count-distinct
    "a10_count_distinct" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .agg(countDistinct($"l_partkey").as("n_parts"))
      },
      Some("SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem")),

    // ---- SET1 UNION with dedup (Ingest:119-131 — SQL UNION deduplicates;
    // Spark union is UNION ALL, so .distinct() preserves the semantics)
    "set1_union_distinct" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").select($"c_nationkey".as("nk"))
          .union(t(s, dir, "supplier").select($"s_nationkey".as("nk")))
          .distinct()
      },
      Some("""SELECT c_nationkey AS nk FROM customer
        UNION SELECT s_nationkey AS nk FROM supplier""")),

    // ---- SET2 [EXT] INTERSECT / EXCEPT
    "set2_intersect" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").select($"c_nationkey".as("nk"))
          .intersect(t(s, dir, "supplier").select($"s_nationkey".as("nk")))
      },
      Some("""SELECT c_nationkey AS nk FROM customer
        INTERSECT SELECT s_nationkey AS nk FROM supplier""")),
    "set3_except" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").select($"c_custkey".as("k"))
          .except(t(s, dir, "events").select($"user_id".as("k")))
      },
      Some("""SELECT c_custkey AS k FROM customer
        EXCEPT SELECT user_id AS k FROM events""")),

    // ---- W1 LIMIT 1 made deterministic (Ingest:75 is unsorted LIMIT 1 —
    // SURVEY §2.5 mandates a deterministic tiebreak for the oracle)
    "w1_limit_one" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .select($"o_orderkey", $"o_totalprice")
          .limit(1)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1""")),

    // ---- W2 [EXT] top-k per group via row_number (SURVEY §2.5)
    "w2_topk_per_group" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal".desc, $"c_custkey".asc)
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .where($"rn" <= 3)
          .select($"c_mktsegment", $"c_custkey", $"c_acctbal", $"rn")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rn AS INT) AS rn FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
            row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer) t WHERE rn <= 3""")),

    // ---- W3 [EXT] running sum window (partitioned, fully tiebroken)
    "w3_running_sum" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            round(sum($"l_quantity").over(w), 2).as("running_qty"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
        round(sum(l_quantity) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        FROM lineitem"""))
  )
}
