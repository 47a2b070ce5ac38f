package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{Parameters, check}

/** The change feed's defining invariant, property-tested over random
  * operation histories: for ANY committed sequence of append / COW
  * delete / COW update / DV delete / DV update / OPTIMIZE /
  * overwrite, applying the change rows of (from, to] to the multiset
  * of snapshot `from` must reproduce snapshot `to` exactly —
  * inserts and postimages added, deletes and preimages removed,
  * nothing else. This is what makes the feed consumable: a downstream
  * replica folding the rows converges to the table. */
class RowCdfPropertySpec extends SparkSpec {
  import spark.implicits._

  private type RowKV = (Int, String)

  sealed trait Op
  private case class Append(rows: Seq[RowKV]) extends Op
  private case class CowDelete(m: Int, r: Int) extends Op
  private case class CowUpdate(m: Int, r: Int) extends Op
  private case class DvDelete(m: Int, r: Int) extends Op
  private case class DvUpdate(m: Int, r: Int) extends Op
  private case object Optimize extends Op
  private case class Overwrite(rows: Seq[RowKV]) extends Op

  private val genRows: Gen[Seq[RowKV]] = for {
    n <- Gen.choose(1, 5)
    ks <- Gen.listOfN(n, Gen.choose(1, 40))
  } yield ks.map(k => (k, s"v$k"))

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> genRows.map(Append),
    2 -> Gen.zip(Gen.choose(2, 4), Gen.choose(0, 3)).map {
      case (m, r) => CowDelete(m, r % m) },
    2 -> Gen.zip(Gen.choose(2, 4), Gen.choose(0, 3)).map {
      case (m, r) => CowUpdate(m, r % m) },
    2 -> Gen.zip(Gen.choose(2, 4), Gen.choose(0, 3)).map {
      case (m, r) => DvDelete(m, r % m) },
    2 -> Gen.zip(Gen.choose(2, 4), Gen.choose(0, 3)).map {
      case (m, r) => DvUpdate(m, r % m) },
    1 -> Gen.const(Optimize),
    1 -> genRows.map(Overwrite))

  private def run(t: String, op: Op): Unit = op match {
    case Append(rows) =>
      Versioned.commit(rows.toDF("k", "v").coalesce(1), t, "append")
    case CowDelete(m, r) =>
      Versioned.rewrite(spark, t, _ => true, col("k") % m === r,
        df => df.where(!(col("k") % m === r)),
        Map("operation" -> "delete"))
    case CowUpdate(m, r) =>
      Versioned.rewrite(spark, t, _ => true, col("k") % m === r,
        df => df.withColumn("v",
          when(col("k") % m === r, concat(col("v"), lit("u")))
            .otherwise(col("v"))),
        Map("operation" -> "update"))
    case DvDelete(m, r) =>
      Versioned.deleteWithDv(spark, t, _ => true, col("k") % m === r)
    case DvUpdate(m, r) =>
      Versioned.updateWithDv(spark, t, _ => true, col("k") % m === r,
        df => df.withColumn("v", concat(col("v"), lit("U"))))
    case Optimize =>
      spark.sql(s"OPTIMIZE '$t' COMPACT")
    case Overwrite(rows) =>
      Versioned.commit(rows.toDF("k", "v").coalesce(1), t, "overwrite")
  }

  private def multiset(rows: Seq[RowKV]): Map[RowKV, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  private def snapshot(t: String, v: Long): Seq[RowKV] =
    Versioned.read(spark, t, Some(v)).select($"k", $"v")
      .as[RowKV].collect().toSeq

  test("property: change rows of (from, to] transform snapshot(from) " +
    "into snapshot(to) exactly, over random operation histories") {
    val genOps = Gen.listOfN(5, genOp)
    val prop = Prop.forAll(genRows, genOps) { (init, ops) =>
      val t = tmpDir("cdfprop") + "/t"
      Versioned.commit(init.toDF("k", "v").coalesce(1), t)
      ops.foreach(run(t, _))
      val last = Versioned.versions(spark, t).last
      // both the full range and an interior range must reconstruct
      Seq((0L, last), (last / 2, last)).forall { case (from, to) =>
        val changes = Versioned.rowChanges(spark, t, from, to)
          .select($"k", $"v", col(Versioned.ChangeTypeCol))
          .as[(Int, String, String)].collect().toSeq
        val add = changes.collect {
          case (k, v, ct) if ct == "insert" || ct == "update_postimage" =>
            (k, v) }
        val remove = changes.collect {
          case (k, v, ct) if ct == "delete" || ct == "update_preimage" =>
            (k, v) }
        val recon = remove.foldLeft(
          multiset(snapshot(t, from) ++ add).toSeq.toMap) { (m, r) =>
          m.get(r) match {
            case Some(1) => m - r
            case Some(c) => m.updated(r, c - 1)
            case None => m // would fail the equality below
          }
        }
        val want = multiset(snapshot(t, to))
        val ok = recon == want
        if (!ok) println(s"MISMATCH ($from,$to): recon=$recon want=$want " +
          s"changes=$changes ops=$ops init=$init")
        ok
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
