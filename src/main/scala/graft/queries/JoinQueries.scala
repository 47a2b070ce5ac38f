package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join inventory (SURVEY.md §2.3 J1–J4). The reference's only join-shaped
  * operation is the MERGE match (`Ingest:387-394`); the standard join
  * surface is declared per SURVEY §2.3 so a reference user keeps full
  * query capability.
  *
  * Scale notes baked into each plan:
  *  - J1 is a fact-fact equi-join: both sides shuffle-hash/sort-merge on
  *    the join key; AQE handles skew splits at runtime.
  *  - J2 broadcasts the dimension tables (nation 25 rows, region 5 rows)
  *    — zero shuffle of the fact side, exactly what the reference's
  *    "broadcast join avoided via chunking" (README.md:33) should have
  *    been on a modern runtime.
  *  - J4 (as-of) deliberately avoids the O(n·m) non-equi join: one
  *    shuffle by key, one per-key sort, last-non-null window — the plan
  *    that still works when events is 100 TB.
  */
object JoinQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- J1 equi inner join, fact-to-fact, grouped revenue
    "j1_inner_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("cnt"),
            // Revenue compared as an exact-integer sum rescaled once to
            // double — the only money form that hashes identically under
            // every oracle engine version (see graft.functions.Exact:
            // round-3 showed decimal-typed outputs are not portable).
            Exact.dollars(Exact.sumExact(
              Exact.revenueE4($"l_extendedprice", $"l_discount")), 10000L)
              .as("revenue"))
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
          * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
          / 10000.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority""")),

    // ---- J2 broadcast dimension join chain (customer ⋈ nation ⋈ region)
    "j2_broadcast_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, dir, "region")),
            $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT r_name, count(*) AS cnt
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""")),

    // ---- J3a left outer (MERGE WHEN NOT MATCHED side, Ingest:390-394)
    "j3a_left_outer" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("n_orders"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey""")),

    // ---- J3b left semi = EXISTS (MERGE WHEN MATCHED)
    "j3b_left_semi" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // ---- J3c left anti = NOT EXISTS (customers with no events — the
    // events.user_id key space covers only a prefix of custkeys)
    "j3c_left_anti" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "events"), $"c_custkey" === $"user_id", "left_anti")
          .select($"c_custkey", $"c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)""")),

    // ---- J4 [EXT] as-of join: for each 'purchase' event, the latest
    // 'click' by the same user at ts' <= ts (the watermark comparison
    // pattern of Ingest:280 generalized to event time). Implemented as
    // union + keyed window with last(_, ignoreNulls) — a single shuffle
    // by user_id, no non-equi join, no broadcast of the big side.
    "j4_asof_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
        val clicks = e.where($"event_type" === "click")
          .select($"user_id", $"ts", lit(null).cast("long").as("event_id"),
            $"ts".as("click_ts"), lit(0).as("tag"))
        val purchases = e.where($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id",
            lit(null).cast("timestamp").as("click_ts"), lit(1).as("tag"))
        // ties: tag 0 (click) sorts before tag 1 (purchase) at equal ts,
        // so a same-instant click is visible to the purchase (<= semantics)
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"tag".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.union(purchases)
          .withColumn("asof_ts", last($"click_ts", ignoreNulls = true).over(w))
          .where($"tag" === 1)
          .select($"event_id", $"user_id", $"ts", $"asof_ts")
      },
      Some("""SELECT e.event_id, e.user_id, e.ts,
          (SELECT max(e2.ts) FROM events e2
           WHERE e2.user_id = e.user_id AND e2.event_type = 'click'
             AND e2.ts <= e.ts) AS asof_ts
        FROM events e WHERE e.event_type = 'purchase'""")),

    // ---- J6 [EXT] null-safe equi join (<=>): NULL keys match each
    // other — the semantics plain `=` silently drops. Both sides derive
    // nullable keys from events.value (NULL where value is NULL).
    "j6_null_safe_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
        // floor() before the int cast: Spark's double→int cast truncates
        // while DuckDB's rounds — floor is identical in both engines
        val a = e.select((floor($"value").cast("int") % 10).as("k"))
          .groupBy($"k").agg(count(lit(1)).as("na"))
        val b = e.select((floor($"value").cast("int") % 7).as("k"))
          .groupBy($"k").agg(count(lit(1)).as("nb"))
        a.join(b, a("k") <=> b("k"))
          .select(a("k").as("k"), $"na", $"nb")
      },
      Some("""WITH a AS (
          SELECT CAST(floor(value) AS INT) % 10 AS k, count(*) AS na
          FROM events GROUP BY 1),
        b AS (
          SELECT CAST(floor(value) AS INT) % 7 AS k, count(*) AS nb
          FROM events GROUP BY 1)
        SELECT a.k, na, nb FROM a JOIN b
        ON a.k IS NOT DISTINCT FROM b.k""")),

    // ---- J7 [EXT] blocked fuzzy join (entity resolution): part-name
    // pairs within edit distance 2, BLOCKED on the name's noun token so
    // the pair space is per-block, never names × names. The plan is an
    // equi HASH join on the block key with levenshtein as a post-join
    // filter — the standard blocking-recall tradeoff (cross-block pairs
    // are not candidates), mirrored identically by the oracle. Dedup
    // BEFORE pairing (DISTINCT names) is the scale move: pair count is
    // driven by distinct entities, not corpus rows. At 100 TB the same
    // plan holds with a cheaper block key (phonetic code / length
    // bucket) tuned to bound the largest block.
    "j7_fuzzy_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // coalesce to "" so single-token names behave like DuckDB's
        // split_part (empty string, joinable) instead of Spark's NULL
        // (row silently dropped) — TPC-H p_name always has 5 tokens,
        // but the query must stay oracle-identical on arbitrary data
        val names = t(s, dir, "part").select($"p_name").distinct()
          .withColumn("block", coalesce(split($"p_name", " ")(1), lit("")))
        val a = names.select($"block", $"p_name".as("name_a"))
        val b = names.select($"block", $"p_name".as("name_b"))
        a.join(b, Seq("block"))
          .where($"name_a" < $"name_b" &&
            levenshtein($"name_a", $"name_b") <= 2)
          .select($"name_a", $"name_b",
            levenshtein($"name_a", $"name_b").cast("int").as("dist"))
      },
      Some("""WITH names AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
          CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM names a JOIN names b
          ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
        WHERE a.p_name < b.p_name
          AND levenshtein(a.p_name, b.p_name) <= 2""")),

    // ---- J8 [EXT] as-of join with TOLERANCE (pandas merge_asof
    // tolerance= semantics): each purchase matches the latest same-user
    // click at or before it, but only within a 1-hour staleness bound —
    // older matches become NULL, not silently-stale joins. Same
    // union+keyed-window plan as j4 (one shuffle on user_id, no
    // non-equi blowup); the bound is a post-window null-out, so the
    // tolerance costs nothing extra at 100 TB.
    "j8_asof_tolerance" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
        val clicks = e.where($"event_type" === "click")
          .select($"user_id", $"ts", lit(null).cast("long").as("event_id"),
            $"ts".as("click_ts"), lit(0).as("tag"))
        val purchases = e.where($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id",
            lit(null).cast("timestamp_ntz").as("click_ts"), lit(1).as("tag"))
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"tag".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.union(purchases)
          .withColumn("raw_asof", last($"click_ts", ignoreNulls = true).over(w))
          .where($"tag" === 1)
          .select($"event_id", $"user_id", $"ts",
            when($"raw_asof" >= $"ts" - expr("INTERVAL 1 HOUR"), $"raw_asof")
              .as("asof_ts"))
      },
      Some("""SELECT e.event_id, e.user_id, e.ts,
          (SELECT max(e2.ts) FROM events e2
           WHERE e2.user_id = e.user_id AND e2.event_type = 'click'
             AND e2.ts <= e.ts AND e2.ts >= e.ts - INTERVAL 1 HOUR) AS asof_ts
        FROM events e WHERE e.event_type = 'purchase'"""))
  )
}
