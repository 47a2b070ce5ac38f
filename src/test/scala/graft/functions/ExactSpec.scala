package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact-money contract behind every compared revenue column
  * (graft.functions.Exact): integer-cents arithmetic must equal
  * BigDecimal ground truth on arbitrary 2-dp money values — including
  * the magnitudes where double arithmetic drifts — and the final
  * double rescale must be the unique IEEE value of the exact total. */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("revenueE4 sum equals BigDecimal ground truth on random 2-dp " +
    "money (ScalaCheck), including >2^53-cent totals") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // 2-dp money up to 10^8 dollars, discounts 0.00-0.99
    val moneyGen = Gen.chooseNum(0L, 9999999999L).map(_ / 100.0)
    val discGen = Gen.chooseNum(0, 99).map(_ / 100.0)
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(moneyGen, discGen))
    val prop = Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("price", "disc")
      val got = df.agg(Exact.dollars(Exact.sumExact(
        Exact.revenueE4($"price", $"disc")), 10000L)).head().getDouble(0)
      // ground truth in exact BigDecimal, converted to double once
      val truth = rows.map { case (p, d) =>
        (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
          (BigDecimal(1) -
            BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      }.sum.toDouble
      got == truth
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("cents recovers the integer exactly across magnitudes, " +
    "including values whose double repr sits just below the integer") {
    // cents-as-long ground truth, converted through double once — the
    // exact shape of the testdata's 2-dp money columns
    val centCases = Seq(1L, 29L, 267L, 12345L, 999999999L, 1234499L,
      9999999999L)
    val df = centCases.map(_ / 100.0).toDF("m")
    val got = df.select(Exact.cents($"m")).as[Long].collect().toSeq
    assert(got == centCases, s"$got vs $centCases")
  }

  test("sumExact survives totals past Long.MaxValue (the 100 TB " +
    "accumulator headroom)") {
    // per-row e4 term ~1e12 fits a long; 20M rows total ~2e19 does NOT
    // — the decimal(20,0)-input accumulator must carry it exactly
    val n = 20000000L
    val df = spark.range(n)
      .select(lit(99999999.99).as("price"), lit(0.00).as("disc"))
    val total = df.agg(Exact.sumExact(
      Exact.revenueE4($"price", $"disc"))).head().getDecimal(0)
    assert(BigDecimal(total) == BigDecimal(999999999900L) * n)
    assert(BigDecimal(total) > BigDecimal(Long.MaxValue))
  }
}
