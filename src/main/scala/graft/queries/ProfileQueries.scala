package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Profile

/** Data-profiling surface: `operators.Profile` declared with a DuckDB
  * mirror (one UNION ALL branch per column, same null/distinct/min/max
  * arithmetic, min/max cast to VARCHAR on both sides).
  */
object ProfileQueries {

  private val stages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

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
          WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)""")),

    // ---- CK2 commit-time invariants (the write-path gate CK1's
    // admission QUERY cannot be): NOT NULL + CHECK rules are declared
    // on a snapshot table built from orders, a NULL-key append and a
    // violating DV UPDATE are REFUSED atomically (proven by requires —
    // versions unchanged, no sidecar), then the clean half appends and
    // a gated SQL UPDATE lands. The final aggregate can only match the
    // oracle if exactly the clean writes committed and both refusals
    // left nothing behind.
    "ck2_invariant_gate" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.functions._
        val V = graft.operators.Versioned
        val table = stages.computeIfAbsent(s"$dir|ck2", { _ =>
          val td = java.nio.file.Files
            .createTempDirectory("ck2").toString + "/t"
          val orders = Tables(s, dir, "orders").select(
            $"o_orderkey".as("k"),
            graft.functions.Exact.cents($"o_totalprice").as("cents"))
          V.commit(orders.where($"k" % 2 === 0).repartition(2), td)
          V.addInvariants(s, td, Seq(
            graft.operators.Invariants.NotNull("k"),
            graft.operators.Invariants.CheckRule("cents_pos",
              "cents >= 0")))
          // a NULL-key append refuses and commits NOTHING
          val vs = V.versions(s, td)
          val dirty = orders.where($"k" % 2 =!= 0).unionByName(
            Seq((null: java.lang.Long, 5L)).toDF("k", "cents"))
          val refused =
            try { V.commit(dirty, td, "append"); false }
            catch { case _: graft.operators.InvariantViolation => true }
          require(refused, "a NULL-key append must refuse")
          require(V.versions(s, td) == vs, "a refusal must not commit")
          // a DV UPDATE whose post-images violate refuses atomically
          val dvRefused =
            try {
              V.updateWithDv(s, td, _ => true, $"k" % 4 === 0,
                df => df.withColumn("cents", lit(-1L)))
              false
            } catch { case _: graft.operators.InvariantViolation => true }
          require(dvRefused && V.versions(s, td) == vs &&
            V.dvDeletedCounts(s, td).isEmpty,
            "a violating DV update must leave no sidecar, no version")
          // the clean half appends; a gated SQL UPDATE lands
          V.commit(orders.where($"k" % 2 =!= 0).repartition(2),
            td, "append")
          s.sql(s"UPDATE '$td' SET cents = cents + 1 WHERE k % 100 = 0")
          td
        })
        V.read(s, table).agg(
          count(lit(1)).as("n_rows"),
          sum($"cents").cast("long").as("total_cents"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
            + sum(CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS total_cents
        FROM orders"""))
  )
}
