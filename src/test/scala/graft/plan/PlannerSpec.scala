package graft.plan

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.time.LocalDate

class WatermarkResolverSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("CreatedDate", TimestampType),
    StructField("LastModifiedDate", TimestampType),
    StructField("note_modified", StringType),   // wrong type → excluded
    StructField("shipdate", TimestampType),     // wrong prefix → excluded
    StructField("MergeDate", DateType),
    StructField("registration_ts", TimestampType)))

  test("config list wins over inference") {
    assert(WatermarkResolver.resolve(Some("a, b ,c"), schema) == Seq("a", "b", "c"))
  }
  test("empty config falls back to inference") {
    assert(WatermarkResolver.resolve(Some("  "), schema) ==
      WatermarkResolver.infer(schema))
  }
  test("inference: prefix match on timestamp cols, merge prefix on date cols") {
    assert(WatermarkResolver.infer(schema) ==
      Seq("CreatedDate", "LastModifiedDate", "MergeDate", "registration_ts"))
  }
  test("config key shape matches the reference's {task}_{table}_watermarks") {
    assert(WatermarkResolver.configKey("UrgentCare", "Visit") ==
      "urgentcare_visit_watermarks")
  }
}

class PathPlannerSpec extends SparkSpec {
  private val d = LocalDate.of(2026, 8, 12)
  test("schema.table shape") {
    val p = PathPlanner.resolve("clinic.Visit", "/lake", d)
    assert(p.table == "Visit")
    assert(p.filePath == "/lake/visit/2026/08/12")
    assert(p.selectAllQuery == """SELECT * FROM clinic."Visit"""")
  }
  test("task__table shape strips the task tag") {
    val p = PathPlanner.resolve("urgentcare__Status", "/lake/", d)
    assert(p.table == "Status")
    assert(p.filePath == "/lake/status/2026/08/12")
    assert(p.filterQueryTable == """public."Status"""")
  }
  test("bare table defaults to public schema") {
    val p = PathPlanner.resolve("Hospital", "/lake", d)
    assert(p.selectAllQuery == """SELECT * FROM public."Hospital"""")
  }
}

class ChunkPlannerSpec extends SparkSpec {
  import ChunkPlanner._

  private def dc(y: Int, m: Int, d: Int, n: Long) =
    DayCount(y, (m - 1) / 3 + 1, m, d, n)

  test("small year emits a single year chunk") {
    val plan = planChunks(Seq(dc(2020, 1, 1, 10), dc(2020, 7, 2, 5)), 100)
    assert(plan == Seq(ChunkKey(2020, rows = 15)))
  }
  test("count == limit is emitted, not dropped (reference bug closed)") {
    val plan = planChunks(Seq(dc(2020, 1, 1, 100)), 100)
    assert(plan == Seq(ChunkKey(2020, rows = 100)))
  }
  test("oversize year descends; oversize month emits days unconditionally") {
    val counts = Seq(dc(2020, 1, 1, 80), dc(2020, 1, 2, 80), // Q1 = 160 > 100
      dc(2020, 4, 1, 50))                                    // Q2 = 50
    val plan = planChunks(counts, 100)
    assert(plan == Seq(
      ChunkKey(2020, Some(1), Some(1), Some(1), 80),
      ChunkKey(2020, Some(1), Some(1), Some(2), 80),
      ChunkKey(2020, Some(2), rows = 50)))
  }

  test("all-NULL watermark rows become a dedicated ts-IS-NULL chunk " +
    "(cover preserved end-to-end)") {
    import org.apache.spark.sql.functions.{col, coalesce}
    import spark.implicits._
    // pure planner level: null group emits one chunk regardless of limit
    val plan = planChunks(
      Seq(DayCount(NullYear, 0, 0, 0, 7), dc(2020, 1, 1, 10)), 5)
    assert(plan.head == ChunkKey(NullYear, rows = 7, nullKey = true))
    // end-to-end on a frame with NULL timestamps: countCube must not NPE,
    // and the union of chunk predicates must cover every row exactly once
    val df = Seq(
      (1L, Some("2020-01-01 10:00:00")), (2L, None), (3L, None),
      (4L, Some("2020-06-01 10:00:00"))
    ).toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    val chunks = ChunkPlanner.plan(df, Seq("ts"), limit = 1)
    assert(chunks.exists(_.nullKey))
    assert(chunks.map(_.rows).sum == 4)
    val ts = coalesce(col("ts"))
    val covered = chunks.map(c => df.where(c.predicate(ts)).count()).sum
    assert(covered == 4, s"chunks must cover NULL-ts rows, got $covered")
  }

  test("property: chunks partition the input (cover all rows, no overlap)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val merged = Seq.fill(rnd.nextInt(120))(
          dc(2019 + rnd.nextInt(3), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28),
            1L + rnd.nextInt(500)))
        .groupBy(c => (c.y, c.q, c.m, c.d))
        .map { case ((y, q, m, d), cs) => DayCount(y, q, m, d, cs.map(_.cnt).sum) }
        .toSeq
      val limit = 50L + rnd.nextInt(950)
      val plan = planChunks(merged, limit)
      assert(plan.map(_.rows).sum == merged.map(_.cnt).sum,
        s"cover failed at limit=$limit")
      merged.foreach { c =>
        val owners = plan.count(k => k.year == c.y &&
          k.quarter.forall(_ == c.q) && k.month.forall(_ == c.m) &&
          k.day.forall(_ == c.d))
        assert(owners == 1, s"day $c owned by $owners chunks (limit=$limit)")
      }
    }
  }

  test("planDF matches plan on real data") {
    val df = graft.Tables(spark, sfDir, "lineitem")
    val fromDF = planDF(df, Seq("l_shipdate"), 700).collect()
    val direct = plan(df, Seq("l_shipdate"), 700)
    assert(fromDF.length == direct.size)
    assert(direct.map(_.rows).sum == df.count())
  }
}
