package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables(spark, sfDir, "lineitem")
    .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")

  test("interleave places each column's bits on its own stride") {
    val df = Seq((3L, 1L)).toDF("a", "b")
      .select(Clustering.interleave(Seq($"a", $"b"), 2).as("z"))
    // a=0b11 -> z bits 0,2; b=0b01 -> z bit 1  =>  z = 0b0111 = 7
    assert(df.head().getLong(0) == 7L)
  }

  test("property: interleave is a bijection on bucket tuples (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // reference deinterleave: bit b of column i sits at z-bit b*n + i
    def deinterleave(z: Long, n: Int, bits: Int): Seq[Long] =
      (0 until n).map { i =>
        (0 until bits).map(b => ((z >> (b * n + i)) & 1L) << b).sum
      }
    val gen = for {
      n <- Gen.choose(2, 4)
      bits <- Gen.choose(1, 6)
      tuples <- Gen.listOfN(20, Gen.listOfN(n, Gen.choose(0L, (1L << bits) - 1)))
    } yield (n, bits, tuples)
    val prop = Prop.forAll(gen) { case (n, bits, tuples) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(tuples.map(org.apache.spark.sql.Row.fromSeq), 2),
        org.apache.spark.sql.types.StructType((0 until n).map(i =>
          org.apache.spark.sql.types.StructField(s"c$i",
            org.apache.spark.sql.types.LongType))))
      val zs = df.select(Clustering.interleave(
          (0 until n).map(i => org.apache.spark.sql.functions.col(s"c$i")), bits)
          .as("z"))
        .collect().map(_.getLong(0))
      zs.zip(tuples).forall { case (z, t) =>
        deinterleave(z, n, bits) == t.toSeq
      } :| s"n=$n bits=$bits"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("z-order clustering preserves content exactly") {
    val out = tmpDir("zorder") + "/li"
    Clustering.clusterWrite(li, Seq("l_orderkey", "l_partkey"), out, files = 8)
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("both clustered columns get small per-file spans; a linear sort " +
    "leaves the second column unprunable") {
    val zDir = tmpDir("zspan") + "/z"
    val linDir = tmpDir("zspan") + "/lin"
    Clustering.clusterWrite(li, Seq("l_orderkey", "l_partkey"), zDir, files = 8)
    // the single-column alternative: range-sort by l_orderkey only
    li.repartitionByRange(8, $"l_orderkey")
      .sortWithinPartitions("l_orderkey")
      .write.parquet(linDir)

    val zOrder = Clustering.avgFileSpan(spark, zDir, "l_orderkey")
    val zPart = Clustering.avgFileSpan(spark, zDir, "l_partkey")
    val linOrder = Clustering.avgFileSpan(spark, linDir, "l_orderkey")
    val linPart = Clustering.avgFileSpan(spark, linDir, "l_partkey")

    // linear sort: first column near-perfectly clustered, second column's
    // per-file range is the whole domain (no file ever skippable)
    assert(linOrder < 0.3, s"linear sort should cluster l_orderkey: $linOrder")
    assert(linPart > 0.85, s"linear sort should NOT cluster l_partkey: $linPart")
    // z-order: BOTH columns' spans bounded well below the full domain
    assert(zOrder < 0.7, s"z-order l_orderkey span: $zOrder")
    assert(zPart < 0.7, s"z-order l_partkey span: $zPart")
    assert(math.max(zOrder, zPart) < linPart,
      s"worst z-span ${math.max(zOrder, zPart)} must beat linear's $linPart")
  }

  test("a range predicate on the second column touches fewer files on " +
    "the z-ordered layout") {
    val zDir = tmpDir("zprune") + "/z"
    val linDir = tmpDir("zprune") + "/lin"
    Clustering.clusterWrite(li, Seq("l_orderkey", "l_partkey"), zDir, files = 8)
    li.repartitionByRange(8, $"l_orderkey")
      .sortWithinPartitions("l_orderkey")
      .write.parquet(linDir)

    // a ~10% band of the l_partkey domain
    val Array(lo, hi) = li.stat.approxQuantile("l_partkey",
      Array(0.45, 0.55), 0.001)
    val pred = $"l_partkey".between(lo, hi)
    val zTouched = Clustering.filesTouched(spark, zDir, pred)
    val linTouched = Clustering.filesTouched(spark, linDir, pred)
    // linear layout scatters the band across every file; z-order confines
    // it to the curve cells intersecting the band
    assert(linTouched == 8, s"linear: $linTouched")
    assert(zTouched < linTouched, s"z-order touched $zTouched of $linTouched")
  }
}
