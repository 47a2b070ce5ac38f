package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-4 analytics: the remaining classic decision-support shapes the
  * earlier waves didn't cover — national market share (q8), profit by
  * nation/year (q9), waiting-supplier multi-correlation (q21), and
  * global-sales anti-join with a scalar-subquery threshold (q22).
  * Faithful variants on the testdata's star schema: there is no
  * partsupp table and lineitem carries no receipt/commit dates, so q9
  * books revenue without supply cost and q21 defines "late" as shipping
  * >60 days after the order date. All four are fully oracle-checked.
  *
  * Scale shapes: every dimension join (nation, region, part filter,
  * supplier) broadcasts; only fact-fact joins (lineitem ⋈ orders) and
  * the final groupBys shuffle. q21's classic EXISTS/NOT-EXISTS double
  * correlation is decorrelated into ONE per-order aggregate joined
  * back — two shuffles total instead of two extra fact-fact joins.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Q8 national market share: NATION_3's share of PROMO-part
    // revenue sold into ASIA, per order year. Share = exact-integer
    // revenue sums (graft.functions.Exact) divided as doubles, rounded
    // once — identical IEEE inputs, so identical quotients everywhere.
    "q8_market_share" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val supNation = broadcast(t(s, dir, "nation"))
          .select($"n_nationkey".as("sn_key"), $"n_name".as("sn_name"))
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part").where($"p_type" === "PROMO")),
            $"l_partkey" === $"p_partkey")
          .join(t(s, dir, "orders").where(
            $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp")),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(broadcast(t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, dir, "region")),
            $"n_regionkey" === $"r_regionkey")
          .where($"r_name" === "ASIA")
          .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .join(supNation, $"s_nationkey" === $"sn_key")
          .groupBy(year($"o_orderdate").as("o_year"))
          .agg(round(
            Exact.sumExact(when($"sn_name" === "NATION_3",
              Exact.revenueE4($"l_extendedprice", $"l_discount"))
              .otherwise(lit(0L))).cast("double") /
              Exact.sumExact(Exact.revenueE4($"l_extendedprice",
                $"l_discount")).cast("double"),
            6).as("mkt_share"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
          round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
              THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
              ELSE 0 END) AS DOUBLE) /
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS DOUBLE), 6) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY year(o_orderdate)""")),

    // ---- Q9 product-type profit by supplier nation and order year
    // (no partsupp in the schema: profit = discounted revenue)
    "q9_profit" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .where($"p_name".like("%widget%"))),
            $"l_partkey" === $"p_partkey")
          .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(t(s, dir, "nation")),
            $"s_nationkey" === $"n_nationkey")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
          .agg(Exact.dollars(Exact.sumExact(
            Exact.revenueE4($"l_extendedprice", $"l_discount")), 10000L)
            .as("profit"))
      },
      Some("""SELECT n_name AS nation,
          CAST(year(o_orderdate) AS INT) AS o_year,
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
            / 10000.0 AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, year(o_orderdate)""")),

    // ---- Q21 waiting suppliers: on finished multi-supplier orders,
    // suppliers who were the ONLY one to ship late (>60 days after the
    // order date). The classic EXISTS (another supplier) + NOT EXISTS
    // (another late supplier) double correlation is decorrelated into a
    // single per-order aggregate — n_supp and n_late_supp — joined back
    // to the late lines: one fact-fact aggregate instead of two more
    // lineitem self-joins, the shape that survives 100 TB.
    "q21_waiting_supplier" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // The per-order (n_supp, n_late_supp) counts ride a WINDOW over
        // the same l_orderkey partitioning instead of a separate
        // aggregate joined back (optimization r19, guide §2.4): the
        // aggregate+self-join form scanned AND shuffled the
        // lineitem⋈orders fact twice (Exchange ×2 + Expand + SMJ —
        // see plans/r19/q21_waiting_supplier_before.txt); the window
        // form establishes the l_orderkey partitioning ONCE. Same
        // values: size(collect_set(x)) ≡ count(DISTINCT x) per
        // partition (both drop nulls), per-order supplier sets are
        // tiny (≤7), and the surviving rows — the late lines of
        // qualifying orders — are identical.
        val l = t(s, dir, "lineitem")
          .join(t(s, dir, "orders").where($"o_orderstatus" === "F"),
            $"l_orderkey" === $"o_orderkey")
          .withColumn("late",
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"l_orderkey")
        l.withColumn("n_supp", size(collect_set($"l_suppkey").over(w)))
          .withColumn("n_late_supp",
            size(collect_set(when($"late", $"l_suppkey")).over(w)))
          .where($"late" && $"n_supp" > 1 && $"n_late_supp" === 1)
          .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_name")
          .agg(countDistinct($"l_orderkey").as("numwait"))
          .orderBy($"numwait".desc, $"s_name".asc)
          .limit(20)
      },
      Some("""WITH l AS (
          SELECT l_orderkey, l_suppkey,
            l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        per_order AS (
          SELECT l_orderkey AS po_orderkey,
            count(DISTINCT l_suppkey) AS n_supp,
            count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
          FROM l GROUP BY l_orderkey)
        SELECT s_name, count(DISTINCT l_orderkey) AS numwait
        FROM l
        JOIN per_order ON l_orderkey = po_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE late AND n_supp > 1 AND n_late_supp = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC LIMIT 20""")),

    // ---- Q22 global sales opportunity: well-funded customers (above
    // the average positive balance — a broadcast scalar subquery) in
    // selected nations with no order since 1999 (anti join against the
    // distinct recent-customer set). Every customer here HAS historic
    // orders, so the recency cut is what makes the anti side real.
    "q22_global_sales" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
          .where($"c_nationkey".isin(1, 3, 5, 7, 9, 11, 13))
        // "above average" decided on exact integers with the division
        // multiplied out (bal > tot/n  ⇔  bal_cents·n > tot_cents):
        // no double division, so no engine-version rounding at the
        // threshold boundary; the sums stay a broadcast scalar.
        val posStats = cust.where($"c_acctbal" > 0)
          .agg(sum(Exact.cents($"c_acctbal").cast("decimal(20,0)"))
            .as("__tot_cents"), count(lit(1)).as("__n_pos"))
        val recent = t(s, dir, "orders")
          .where($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
          .select($"o_custkey").distinct()
        cust.crossJoin(broadcast(posStats))
          .where(Exact.cents($"c_acctbal").cast("decimal(20,0)") *
            $"__n_pos" > $"__tot_cents")
          .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_nationkey".cast("int").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            Exact.dollars(Exact.sumExact(Exact.cents($"c_acctbal")), 100L)
              .as("totacctbal"))
      },
      Some("""WITH pos AS (
          SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS tot_cents,
            count(*) AS n_pos
          FROM customer
          WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        SELECT CAST(c_nationkey AS INT) AS cntrycode,
          count(*) AS numcust,
          CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
            / 100.0 AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND CAST(round(c_acctbal * 100) AS BIGINT)
            * (SELECT n_pos FROM pos) > (SELECT tot_cents FROM pos)
          AND NOT EXISTS (SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey"""))
  )
}
