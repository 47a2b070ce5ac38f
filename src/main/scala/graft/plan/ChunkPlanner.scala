package graft.plan

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One planned load chunk: a year with optionally finer quarter/month/day
  * bounds. `None` at a level means "not split at that level".
  * Mirrors the reference's recursive year→quarter→month→day descent
  * (`PostgresToDataLake_Ingestion_Notebook.py:310-340`). */
final case class ChunkKey(
    year: Int,
    quarter: Option[Int] = None,
    month: Option[Int] = None,
    day: Option[Int] = None,
    rows: Long = 0L,
    nullKey: Boolean = false) {

  /** The chunk's scan predicate over the watermark expression — the P10
    * date-part filter family (`Ingest:257-266`). The dedicated NULL
    * chunk matches rows whose watermark is entirely NULL: every other
    * chunk's `year(ts) === y` is null-rejecting, so without it those
    * rows would silently vanish from every chunk write and the plan
    * would no longer cover the table. */
  def predicate(ts: Column): Column =
    if (nullKey) ts.isNull
    else {
      val base = org.apache.spark.sql.functions.year(ts) === year
      val q = quarter.map(org.apache.spark.sql.functions.quarter(ts) === _)
      val m = month.map(org.apache.spark.sql.functions.month(ts) === _)
      val d = day.map(dayofmonth(ts) === _)
      Seq(q, m, d).flatten.foldLeft(base)(_ && _)
    }
}

/** Recursive time-chunk planner (SURVEY.md §2.8 C5 — the reference's
  * flagship control operator, `Ingest:310-340` + helpers `:204-267`).
  *
  * The reference probes counts per level with a *separate Spark job per
  * probe*, re-reading the source O(levels × chunks) times. This planner
  * runs ONE distributed job — a grouped count at (year, quarter, month,
  * day) granularity: a single scan with partial aggregation, whose
  * result is bounded by calendar cardinality (≤ 366 rows per year of
  * data span, independent of row count — 50 years of 100 TB is still
  * < 20k rows). The level totals and the descend/emit recursion then
  * run on the collected counts in pure Scala: no joins, no extra
  * shuffles, unit-testable without a SparkSession.
  *
  * Semantics: descend into a level when its count is STRICTLY greater
  * than `limit`; emit a chunk when count <= limit. (The reference's
  * `>` / `<` branch pair drops count == limit entirely — `Ingest:233-237`;
  * we close that hole on the `<=` side and document it here.) Day-level
  * chunks are emitted unconditionally, as in the reference (days are
  * never re-probed).
  */
object ChunkPlanner {

  /** One leaf of the count cube: (year, quarter, month, day) -> rows.
    * `y == NullYear` marks rows whose watermark columns are all NULL. */
  final case class DayCount(y: Int, q: Int, m: Int, d: Int, cnt: Long)

  /** Sentinel grouping key for all-NULL watermark rows (no calendar
    * parts exist for them, so they can never descend below one chunk). */
  val NullYear: Int = Int.MinValue

  /** Pure planning recursion over the collected count cube. All-NULL
    * watermark rows become one dedicated chunk (predicate `ts IS NULL`),
    * emitted regardless of `limit` — there is no finer calendar level to
    * descend into, and dropping them would break the cover property. */
  def planChunks(counts: Seq[DayCount], limit: Long): Seq[ChunkKey] = {
    val (nullCounts, dated) = counts.partition(_.y == NullYear)
    val nullChunk =
      if (nullCounts.isEmpty) Seq.empty
      else Seq(ChunkKey(NullYear, rows = nullCounts.map(_.cnt).sum,
        nullKey = true))
    val chunks = nullChunk ++ dated.groupBy(_.y).toSeq.flatMap { case (y, inYear) =>
      val yTotal = inYear.map(_.cnt).sum
      if (yTotal <= limit) Seq(ChunkKey(y, rows = yTotal))
      else inYear.groupBy(_.q).toSeq.flatMap { case (q, inQ) =>
        val qTotal = inQ.map(_.cnt).sum
        if (qTotal <= limit) Seq(ChunkKey(y, Some(q), rows = qTotal))
        else inQ.groupBy(_.m).toSeq.flatMap { case (m, inM) =>
          val mTotal = inM.map(_.cnt).sum
          if (mTotal <= limit) Seq(ChunkKey(y, Some(q), Some(m), rows = mTotal))
          else inM.map(dc =>
            ChunkKey(y, Some(q), Some(m), Some(dc.d), rows = dc.cnt))
        }
      }
    }
    chunks.sortBy(c => (c.year, c.quarter.getOrElse(0), c.month.getOrElse(0),
      c.day.getOrElse(0)))
  }

  /** The one distributed probe: count cube at day granularity. */
  def countCube(df: DataFrame, watermarkCols: Seq[String]): Seq[DayCount] = {
    val ts = coalesce(watermarkCols.map(col): _*)
    df.groupBy(year(ts).as("y"), quarter(ts).as("q"),
        month(ts).as("m"), dayofmonth(ts).as("d"))
      .agg(count(lit(1)).as("cnt"))
      .collect().toSeq
      .map(r =>
        if (r.isNullAt(0)) DayCount(NullYear, 0, 0, 0, r.getLong(4))
        else DayCount(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getLong(4)))
  }

  def plan(df: DataFrame, watermarkCols: Seq[String], limit: Long): Seq[ChunkKey] =
    planChunks(countCube(df, watermarkCols), limit)

  private val planSchema = StructType(Seq(
    StructField("year", IntegerType, nullable = true),
    StructField("quarter", IntegerType, nullable = true),
    StructField("month", IntegerType, nullable = true),
    StructField("day", IntegerType, nullable = true),
    StructField("cnt", LongType, nullable = false)))

  /** Plan as a DataFrame (driver-contract / oracle shape):
    * (year INT?, quarter INT?, month INT?, day INT?, cnt BIGINT).
    * The NULL-watermark chunk surfaces as an all-NULL calendar row. */
  def planDF(df: DataFrame, watermarkCols: Seq[String], limit: Long): DataFrame = {
    val rows = plan(df, watermarkCols, limit).map(c =>
      Row(if (c.nullKey) null else Int.box(c.year),
        c.quarter.map(Int.box).orNull, c.month.map(Int.box).orNull,
        c.day.map(Int.box).orNull, c.rows))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      planSchema)
  }
}
