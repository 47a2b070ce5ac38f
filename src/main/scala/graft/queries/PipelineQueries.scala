package graft.queries

import graft.{QueryDef, Tables}
import graft.plan.ChunkPlanner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control-plane operators exposed as declared queries (SURVEY.md §2.8).
  * The full pipeline (ConfigStore → planner → writer → watermark commit)
  * is exercised end-to-end in ScalaTest; these queries verify its
  * data-plane pieces against the DuckDB oracle.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Chunk-plan oracle limit: at sf0.01 (~60k lineitem rows, ~8.8k/year)
    * 700 forces the full year→quarter→month→day descent. */
  private val Limit = 700L

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- C5 recursive chunk planner, single-pass (Ingest:310-340).
    // Emit on cnt<=limit, descend on cnt>limit; day chunks unconditional.
    "c5_chunk_plan" -> QueryDef(
      (s, dir) =>
        ChunkPlanner.planDF(t(s, dir, "lineitem"), Seq("l_shipdate"), Limit),
      Some(s"""WITH base AS (
          SELECT CAST(year(COALESCE(l_shipdate)) AS INT) AS y,
                 CAST(quarter(COALESCE(l_shipdate)) AS INT) AS q,
                 CAST(month(COALESCE(l_shipdate)) AS INT) AS m,
                 CAST(day(COALESCE(l_shipdate)) AS INT) AS d,
                 count(*) AS cnt
          FROM lineitem GROUP BY 1,2,3,4),
        years AS (SELECT y, CAST(sum(cnt) AS BIGINT) AS cnt FROM base GROUP BY 1),
        quarters AS (SELECT y, q, CAST(sum(cnt) AS BIGINT) AS cnt FROM base GROUP BY 1,2),
        months AS (SELECT y, q, m, CAST(sum(cnt) AS BIGINT) AS cnt FROM base GROUP BY 1,2,3),
        days AS (SELECT y, q, m, d, CAST(sum(cnt) AS BIGINT) AS cnt FROM base GROUP BY 1,2,3,4)
        SELECT y AS year, CAST(NULL AS INT) AS quarter, CAST(NULL AS INT) AS month,
               CAST(NULL AS INT) AS day, cnt FROM years WHERE cnt <= $Limit
        UNION ALL
        SELECT q.y, q.q, NULL, NULL, q.cnt
        FROM quarters q JOIN years yy ON q.y = yy.y
        WHERE yy.cnt > $Limit AND q.cnt <= $Limit
        UNION ALL
        SELECT m.y, m.q, m.m, NULL, m.cnt
        FROM months m
        JOIN quarters qq ON m.y = qq.y AND m.q = qq.q
        JOIN years yy ON m.y = yy.y
        WHERE yy.cnt > $Limit AND qq.cnt > $Limit AND m.cnt <= $Limit
        UNION ALL
        SELECT dd.y, dd.q, dd.m, dd.d, dd.cnt
        FROM days dd
        JOIN months mm ON dd.y = mm.y AND dd.q = mm.q AND dd.m = mm.m
        JOIN quarters qq ON dd.y = qq.y AND dd.q = qq.q
        JOIN years yy ON dd.y = yy.y
        WHERE yy.cnt > $Limit AND qq.cnt > $Limit AND mm.cnt > $Limit""")),

    // ---- C5 adjunct: union-of-chunks == filtered source (the ScalaCheck
    // partition property, here as an oracle-checked aggregate): total rows
    // covered by the plan equals the table count.
    "c5_chunk_cover" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        ChunkPlanner.planDF(t(s, dir, "lineitem"), Seq("l_shipdate"), Limit)
          .agg(sum($"cnt").cast("long").as("covered"))
      },
      Some("SELECT count(*) AS covered FROM lineitem"))
  )
}
