package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The TRUE product-quantization expressions (PqExpressions): the
  * codegen'd DataFrame path must agree with the interpreted
  * nullSafeEval path and with a straightforward Scala reference
  * implementation, refusals must be loud, and the null conventions
  * must match the similarity family's (null/zero-norm ranks nothing).
  */
class PqExprSpec extends SparkSpec {
  import spark.implicits._

  // 2 subspaces x 2 dims, 3 centroids per subspace — small enough to
  // hand-verify. flat[(s*k + c)*subDim + d].
  private val numSub = 2
  private val k = 3
  private val subDim = 2
  private val flat: Array[Double] = Array(
    // subspace 0: (0,0), (1,0), (0,1)
    0, 0, 1, 0, 0, 1,
    // subspace 1: (2,2), (-1,0), (0,-1)
    2, 2, -1, 0, 0, -1)

  private def refEncode(v: Array[Float]): Array[Int] =
    Array.tabulate(numSub) { s =>
      (0 until k).minBy { c =>
        val base = (s * k + c) * subDim
        (0 until subDim).map { d =>
          val x = v(s * subDim + d).toDouble - flat(base + d)
          x * x
        }.sum
      }
    }

  private def reconstruct(codes: Array[Int]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, s) =>
      val base = (s * k + c) * subDim
      (0 until subDim).map(d => flat(base + d))
    }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  private val sqnorms: Array[Double] = Array.tabulate(numSub * k) { i =>
    (0 until subDim).map { d => val x = flat(i * subDim + d); x * x }.sum
  }

  test("pq_encode (codegen) matches the Scala reference argmin on " +
    "random vectors, binary and int forms agree, null in null out") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(40)(Array.fill(4)(rnd.nextFloat() * 4 - 2))
    val df = (vecs.map(Option(_)) :+ Option.empty[Array[Float]])
      .toDF("v")
    val rows = df.select(
      PqExpressions.pqEncode($"v", numSub, k, subDim, flat).as("bin"),
      PqExpressions.pqEncode($"v", numSub, k, subDim, flat,
        asInts = true).as("ints")).collect()
    vecs.zip(rows).foreach { case (v, r) =>
      val expect = refEncode(v)
      val bin = r.getAs[Array[Byte]]("bin").map(_ & 0xFF)
      val ints = r.getSeq[Int](1)
      assert(bin.toSeq == expect.toSeq, s"${v.toSeq}")
      assert(ints == expect.toSeq, s"${v.toSeq}")
    }
    assert(rows.last.isNullAt(0) && rows.last.isNullAt(1))
  }

  test("pq_encode interpreted path (nullSafeEval) equals codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val v = Array.fill(4)(rnd.nextFloat() * 4 - 2)
      val lit = Literal.create(new GenericArrayData(v),
        ArrayType(FloatType, containsNull = false))
      val interp = PqExpressions
        .PqEncode(lit, numSub, k, subDim, flat).eval(null)
        .asInstanceOf[Array[Byte]].map(_ & 0xFF)
      assert(interp.toSeq == refEncode(v).toSeq, s"${v.toSeq}")
    }
  }

  test("pq_encode refuses a wrong-dim vector loudly (both paths) — " +
    "a silent truncation would code a prefix of the space") {
    val df = Seq(Array(1f, 2f, 3f)).toDF("v") // dim 3, trained at 4
    val e = intercept[Exception] {
      df.select(PqExpressions.pqEncode($"v", numSub, k, subDim, flat))
        .collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("dim") || e.getCause != null &&
        e.getCause.getMessage.contains("dim")))
  }

  test("pq_approx_cosine equals cos(q, reconstruction) computed in " +
    "Scala; wrong-length codes and zero-norm queries go null") {
    val rnd = new scala.util.Random(13)
    val pairs = Seq.fill(30)((
      Array.fill(4)(rnd.nextFloat() * 4 - 2),
      Array.fill(4)(rnd.nextFloat() * 4 - 2)))
    val df = pairs.toDF("v", "q")
    val got = df.select(
      PqExpressions.pqApproxCosine(
        PqExpressions.pqEncode($"v", numSub, k, subDim, flat),
        $"q", numSub, k, subDim, flat, sqnorms).as("a"))
      .collect().map(r => r.getDouble(0))
    pairs.zip(got).foreach { case ((v, q), a) =>
      val expect = cos(reconstruct(refEncode(v)), q.map(_.toDouble))
      assert(math.abs(a - expect) < 1e-12, s"$a vs $expect")
    }
    // wrong-length codes → null (defensive backstop)
    val bad = Seq((Array[Byte](1), Array(1f, 0f, 0f, 0f))).toDF("c", "q")
    assert(bad.select(PqExpressions.pqApproxCosine($"c", $"q",
      numSub, k, subDim, flat, sqnorms)).head().isNullAt(0))
    // zero-norm query → null
    val zq = Seq((Array(1f, 0f, 0f, 0f), Array(0f, 0f, 0f, 0f)))
      .toDF("v", "q")
    assert(zq.select(PqExpressions.pqApproxCosine(
      PqExpressions.pqEncode($"v", numSub, k, subDim, flat),
      $"q", numSub, k, subDim, flat, sqnorms)).head().isNullAt(0))
  }

  test("pq_adc_cosine (per-query LUT) equals pq_approx_cosine on the " +
    "same rows — the two probe scorers cannot drift") {
    val rnd = new scala.util.Random(17)
    val q = Array.fill(4)(rnd.nextFloat() * 2 - 1)
    val lut = Array.tabulate(numSub * k) { i =>
      val s = i / k
      (0 until subDim).map(d =>
        q(s * subDim + d).toDouble * flat(i * subDim + d)).sum
    }
    val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
    val vecs = Seq.fill(30)(Array.fill(4)(rnd.nextFloat() * 4 - 2))
    val df = vecs.toDF("v")
      .withColumn("c",
        PqExpressions.pqEncode($"v", numSub, k, subDim, flat))
    val viaAdc = df.select(PqExpressions.pqAdc($"c", numSub, k, lut,
      sqnorms, qn)).collect().map(_.getDouble(0))
    val viaApprox = df
      .withColumn("q", lit(q))
      .select(PqExpressions.pqApproxCosine($"c", $"q", numSub, k,
        subDim, flat, sqnorms)).collect().map(_.getDouble(0))
    viaAdc.zip(viaApprox).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$a vs $b")
    }
  }

  test("pq_train_step (fused encode+accumulate aggregate) equals the " +
    "explode+groupBy mean update it replaced (optimization r19)") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(200)(Array.fill(4)(rnd.nextFloat() * 4 - 2))
    val df = vecs.toDF("v").repartition(7) // multi-partition merge path
    // fused form: one aggregate row of (sums, counts)
    val st = df.agg(PqExpressions.pqTrainStep($"v", numSub, k, subDim,
      flat).as("st")).head().getStruct(0)
    val sums = st.getSeq[Double](0)
    val counts = st.getSeq[Long](1)
    // reference form: the pre-r19 posexplode + groupBy(s, c, sp) avg
    val codes = PqExpressions.pqEncode($"v", numSub, k, subDim, flat,
      asInts = true)
    val ref = df
      .select(codes.as("__c"), posexplode($"v").as(Seq("pos", "x")))
      .select(($"pos" / subDim).cast("int").as("s"),
        ($"pos" % subDim).as("sp"),
        element_at($"__c", ($"pos" / subDim).cast("int") + 1).as("c"),
        $"x")
      .groupBy($"s", $"c", $"sp")
      .agg(avg($"x".cast("double")).as("m"), count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2).toInt),
        (r.getDouble(3), r.getLong(4))))
      .toMap
    for (s <- 0 until numSub; c <- 0 until k) {
      val cell = s * k + c
      val refN = ref.get((s, c, 0)).map(_._2).getOrElse(0L)
      assert(counts(cell) == refN, s"count mismatch at cell ($s,$c)")
      for (d <- 0 until subDim if refN > 0) {
        val mean = sums(cell * subDim + d) / counts(cell)
        val refMean = ref((s, c, d))._1
        assert(math.abs(mean - refMean) <=
          1e-12 * math.max(1.0, math.abs(refMean)),
          s"mean mismatch at ($s,$c,$d): $mean vs $refMean")
      }
    }
    // null rows contribute nothing (the sample filters nulls, but the
    // aggregate must not NPE if one slips through a future caller)
    val withNull = vecs.map(Option(_)).toDF("v")
      .union(Seq(Option.empty[Array[Float]]).toDF("v"))
    val st2 = withNull.agg(PqExpressions.pqTrainStep($"v", numSub, k,
      subDim, flat).as("st")).head().getStruct(0)
    assert(st2.getSeq[Long](1).sum == counts.sum)
  }

  test("shape refusals: bad codebook length, k > 256, zero-norm ADC " +
    "query refuse at construction") {
    intercept[IllegalArgumentException] {
      PqExpressions.requireShape(2, 3, 2, new Array[Double](5))
    }
    intercept[IllegalArgumentException] {
      PqExpressions.requireShape(2, 300, 2, new Array[Double](2 * 300 * 2))
    }
    intercept[IllegalArgumentException] {
      PqExpressions.pqAdc(lit(Array[Byte](0, 0)), numSub, k,
        new Array[Double](numSub * k), sqnorms, 0.0)
    }
  }
}
