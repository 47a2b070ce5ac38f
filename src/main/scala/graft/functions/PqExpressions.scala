package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions for TRUE product quantization (public
  * algorithm — Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011): a dim-D vector is split into
  * `numSub` contiguous subvectors of `subDim = D / numSub` dims, each
  * quantized independently to the nearest of `k ≤ 256` per-subspace
  * centroids (L2), and stored as ONE BYTE per subvector — `D·4 /
  * numSub`× compression vs float32 (e.g. 16× at D=64, numSub=16),
  * against the int8 scalar scheme's fixed 4×. Probing uses ASYMMETRIC
  * distance: the query stays full-precision and is compared against
  * the reconstruction v̂ = concat(centroid(s, code_s)).
  *
  * Why custom Expressions (SURVEY §2.10, the [[CosineSimilarity]]
  * rationale): the codes are BinaryType — one raw byte per subvector,
  * the whole point of the layout — and no built-in function family
  * indexes into binary; any higher-order composition would also be
  * CodegenFallback in the index build's hot loop. All three compile
  * to tight primitive loops inside WholeStageCodegen; interp ≡ codegen
  * parity is pinned by PqExprSpec.
  *
  * The codebooks ride each expression as a FLATTENED double array
  * (`flat[(s*k + c)*subDim + d]`) — numSub·k·subDim doubles,
  * driver-sized by construction (≤ 256 entries per subspace), embedded
  * via a codegen reference object exactly like [[HyperplaneBucket]]'s
  * plane matrix.
  */
object PqExpressions {

  private[graft] def requireShape(numSub: Int, k: Int, subDim: Int,
      flat: Array[Double]): Unit = {
    require(numSub > 0 && subDim > 0, s"bad PQ shape ($numSub, $subDim)")
    require(k > 0 && k <= 256,
      s"PQ codebook k=$k must fit one unsigned byte (1..256)")
    require(flat.length == numSub * k * subDim,
      s"flat codebooks length ${flat.length} != $numSub*$k*$subDim")
  }

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def vecTypeOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Encode a vector to its PQ codes. `asInts = false` (storage form)
    * emits BinaryType — numSub raw bytes; `asInts = true` (training
    * form) emits array<int> of the same code values, the shape the
    * Lloyd mean-update can `element_at`/group on. A vector whose dim
    * is not numSub·subDim REFUSES loudly at execution — truncating
    * like the cosine would emit codes for a PREFIX of the space and
    * corrupt the index silently. */
  case class PqEncode(child: Expression, numSub: Int, k: Int,
      subDim: Int, flat: Array[Double], asInts: Boolean = false)
      extends UnaryExpression {

    PqExpressions.requireShape(numSub, k, subDim, flat)

    override def dataType: DataType =
      if (asInts) ArrayType(IntegerType, containsNull = false)
      else BinaryType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "pq_encode"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (vecTypeOk(child)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float>/array<double> input, " +
          s"got ${child.dataType.catalogString}")
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = numSub * subDim
      if (v.numElements() != dim) throw new IllegalArgumentException(
        s"pq_encode got a vector of dim ${v.numElements()} where the " +
          s"codebooks were trained at dim $dim ($numSub x $subDim) — " +
          "re-train or fix the frame")
      val f = isFloatArr(child)
      val out = new Array[Byte](numSub)
      var s = 0
      while (s < numSub) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val base = (s * k + c) * subDim
          var d2 = 0.0
          var d = 0
          while (d < subDim) {
            val x = (if (f) v.getFloat(s * subDim + d).toDouble
              else v.getDouble(s * subDim + d)) - flat(base + d)
            d2 += x * x
            d += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        out(s) = best.toByte
        s += 1
      }
      if (asInts)
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          out.map(b => b & 0xFF))
      else out
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val get = if (isFloatArr(child)) "getFloat" else "getDouble"
        val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
        val s = ctx.freshName("s"); val c = ctx.freshName("c")
        val d = ctx.freshName("d"); val x = ctx.freshName("x")
        val d2 = ctx.freshName("d2"); val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        val base = ctx.freshName("base")
        val out = ctx.freshName("out")
        val emit =
          if (asInts) {
            val ints = ctx.freshName("ints")
            s"""int[] $ints = new int[$numSub];
               for (int $s = 0; $s < $numSub; $s++)
                 $ints[$s] = $out[$s] & 0xFF;
               ${ev.value} =
                 new org.apache.spark.sql.catalyst.util.GenericArrayData($ints);"""
          } else s"${ev.value} = $out;"
        s"""
          if ($v.numElements() != ${numSub * subDim})
            throw new IllegalArgumentException(
              "pq_encode got a vector of dim " + $v.numElements() +
              " where the codebooks were trained at dim " +
              "${numSub * subDim} ($numSub x $subDim) — re-train or " +
              "fix the frame");
          byte[] $out = new byte[$numSub];
          for (int $s = 0; $s < $numSub; $s++) {
            int $best = 0;
            double $bestD = Double.MAX_VALUE;
            for (int $c = 0; $c < $k; $c++) {
              int $base = ($s * $k + $c) * $subDim;
              double $d2 = 0.0;
              for (int $d = 0; $d < $subDim; $d++) {
                double $x = ((double) $v.$get($s * $subDim + $d))
                  - $flatRef[$base + $d];
                $d2 += $x * $x;
              }
              if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
            }
            $out[$s] = (byte) $best;
          }
          $emit
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Asymmetric approximate cosine of a PQ code row against a
    * PER-ROW query vector (the batch probe's shape): cos(q, v̂) where
    * v̂ = concat(centroid(s, code_s)) — reconstructed on the fly from
    * the reference-object codebooks, never materialized. `sqnorms`
    * precomputes ‖centroid(s,c)‖² per (s,c) so ‖v̂‖² is numSub adds.
    * Null when either side is null, the reconstruction or the query
    * has zero norm (nothing to rank — the float path's null-cosine
    * convention), or the query's dim does not match (the batch probes
    * refuse wrong-dim rows loudly BEFORE this runs — requireDimCol —
    * so a null here is the defensive backstop, not the API). */
  case class PqApproxCosine(left: Expression, right: Expression,
      numSub: Int, k: Int, subDim: Int, flat: Array[Double],
      sqnorms: Array[Double]) extends BinaryExpression {

    PqExpressions.requireShape(numSub, k, subDim, flat)
    require(sqnorms.length == numSub * k,
      s"sqnorms length ${sqnorms.length} != $numSub*$k")

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_approx_cosine"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (left.dataType == BinaryType && vecTypeOk(right))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary codes, array<float|double> " +
          s"query), got ${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[Array[Byte]]
      val q = b.asInstanceOf[ArrayData]
      val f = isFloatArr(right)
      if (codes.length != numSub ||
        q.numElements() != numSub * subDim) return null
      var dot = 0.0; var nv = 0.0; var nq = 0.0
      var s = 0
      while (s < numSub) {
        val c = codes(s) & 0xFF
        val base = (s * k + c) * subDim
        nv += sqnorms(s * k + c)
        var d = 0
        while (d < subDim) {
          val qi = if (f) q.getFloat(s * subDim + d).toDouble
            else q.getDouble(s * subDim + d)
          dot += qi * flat(base + d)
          nq += qi * qi
          d += 1
        }
        s += 1
      }
      if (nv == 0.0 || nq == 0.0) null
      else java.lang.Double.valueOf(
        dot / (math.sqrt(nv) * math.sqrt(nq)))
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val get = if (isFloatArr(right)) "getFloat" else "getDouble"
        val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
        val sqRef = ctx.addReferenceObj("pqSq", sqnorms, "double[]")
        val s = ctx.freshName("s"); val c = ctx.freshName("c")
        val d = ctx.freshName("d"); val base = ctx.freshName("base")
        val dot = ctx.freshName("dot"); val nv = ctx.freshName("nv")
        val nq = ctx.freshName("nq"); val qi = ctx.freshName("qi")
        s"""
          if ($a.length != $numSub ||
              $b.numElements() != ${numSub * subDim}) {
            ${ev.isNull} = true;
          } else {
            double $dot = 0.0; double $nv = 0.0; double $nq = 0.0;
            for (int $s = 0; $s < $numSub; $s++) {
              int $c = $a[$s] & 0xFF;
              int $base = ($s * $k + $c) * $subDim;
              $nv += $sqRef[$s * $k + $c];
              for (int $d = 0; $d < $subDim; $d++) {
                double $qi = (double) $b.$get($s * $subDim + $d);
                $dot += $qi * $flatRef[$base + $d];
                $nq += $qi * $qi;
              }
            }
            if ($nv == 0.0 || $nq == 0.0) {
              ${ev.isNull} = true;
            } else {
              ${ev.value} =
                $dot / (java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($nq));
            }
          }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Asymmetric-distance (ADC) approximate cosine against a SINGLE
    * query via a per-query LOOKUP TABLE — the classic PQ probe:
    * `dotLut[s*k + c] = dot(q_s, centroid(s, c))` is computed ONCE
    * driver-side (numSub·k doubles), and each candidate costs numSub
    * table adds instead of a dim-D dot product — at dim 1024 /
    * numSub 64 that is 16× less arithmetic per scanned code row,
    * on top of the layout's 16–32× less IO. `sqnorms` as in
    * [[PqApproxCosine]]; `qNorm` = ‖q‖ (the caller refuses a
    * zero-norm query before building the LUT). Null for a
    * wrong-length code row or a zero-norm reconstruction. */
  case class PqAdc(child: Expression, numSub: Int, k: Int,
      dotLut: Array[Double], sqnorms: Array[Double], qNorm: Double)
      extends UnaryExpression {

    require(k > 0 && k <= 256, s"k=$k must fit one unsigned byte")
    require(dotLut.length == numSub * k && sqnorms.length == numSub * k,
      s"LUT lengths (${dotLut.length}, ${sqnorms.length}) != $numSub*$k")
    require(qNorm > 0.0, "zero-norm query ranks nothing — refuse " +
      "before building the ADC table")

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_adc_cosine"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary codes, got " +
          child.dataType.catalogString)
    }

    override def nullSafeEval(input: Any): Any = {
      val codes = input.asInstanceOf[Array[Byte]]
      if (codes.length != numSub) return null
      var dot = 0.0; var nv = 0.0
      var s = 0
      while (s < numSub) {
        val i = s * k + (codes(s) & 0xFF)
        dot += dotLut(i)
        nv += sqnorms(i)
        s += 1
      }
      if (nv == 0.0) null
      else java.lang.Double.valueOf(dot / (math.sqrt(nv) * qNorm))
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val lutRef = ctx.addReferenceObj("pqLut", dotLut, "double[]")
        val sqRef = ctx.addReferenceObj("pqSq", sqnorms, "double[]")
        val s = ctx.freshName("s"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val nv = ctx.freshName("nv")
        s"""
          if ($a.length != $numSub) {
            ${ev.isNull} = true;
          } else {
            double $dot = 0.0; double $nv = 0.0;
            for (int $s = 0; $s < $numSub; $s++) {
              int $i = $s * $k + ($a[$s] & 0xFF);
              $dot += $lutRef[$i];
              $nv += $sqRef[$i];
            }
            if ($nv == 0.0) {
              ${ev.isNull} = true;
            } else {
              ${ev.value} = $dot / (java.lang.Math.sqrt($nv) * $qNorm);
            }
          }
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** One fused Lloyd training step: encode each vector (the PqEncode
    * argmin against the CURRENT codebooks) and accumulate per-cell
    * subvector sums + counts in a single aggregation buffer —
    * `struct(sums: array<double>[numSub·k·subDim], counts:
    * array<long>[numSub·k])`, from which the driver derives the new
    * per-cell means (sum/count; empty cells keep their previous
    * centroid).
    *
    * Optimization r19 (guide §1.2 step 1 — remove passes/volume): the
    * original mean-update materialized int codes per row, posexploded
    * every vector to `dim` rows (64× row volume at dim 64 — 16.7M
    * rows at the default training cap) and hash-aggregated them by
    * (sub, code, subpos); that one job measured 0.75 s per training
    * call at sf0.1 in a clean window. This form folds each row into a
    * fixed numSub·k·(subDim+1)-sized buffer in one tight pass — no
    * explode, no code materialization, and the shuffle is one partial
    * state per partition instead of a row stream. The arithmetic is
    * unchanged: identical argmin, identical float→double element
    * casts, per-partition sequential double sums merged once (the
    * same partial-aggregation tree the grouped avg used).
    *
    * Wrong-dim vectors throw exactly like PqEncode — silently
    * skipping them would train on a prefix of the space. */
  case class PqTrainStep(child: Expression, numSub: Int, k: Int,
      subDim: Int, flat: Array[Double],
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends org.apache.spark.sql.catalyst.expressions.aggregate
        .TypedImperativeAggregate[PqTrainState] with UnaryLike {

    PqExpressions.requireShape(numSub, k, subDim, flat)

    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sums",
          ArrayType(DoubleType, containsNull = false), nullable = false),
        org.apache.spark.sql.types.StructField("counts",
          ArrayType(org.apache.spark.sql.types.LongType,
            containsNull = false), nullable = false)))
    override def nullable: Boolean = false
    override def prettyName: String = "pq_train_step"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (vecTypeOk(child)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float>/array<double> input, " +
          s"got ${child.dataType.catalogString}")
    }

    override def createAggregationBuffer(): PqTrainState =
      PqTrainState(new Array[Double](numSub * k * subDim),
        new Array[Long](numSub * k))

    override def update(buf: PqTrainState,
        input: org.apache.spark.sql.catalyst.InternalRow): PqTrainState = {
      val any = child.eval(input)
      if (any == null) return buf // null rows contribute nothing
      val v = any.asInstanceOf[ArrayData]
      val dim = numSub * subDim
      if (v.numElements() != dim) throw new IllegalArgumentException(
        s"pq_train_step got a vector of dim ${v.numElements()} where " +
          s"the codebooks were trained at dim $dim ($numSub x $subDim)")
      val f = isFloatArr(child)
      var s = 0
      while (s < numSub) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val base = (s * k + c) * subDim
          var d2 = 0.0
          var d = 0
          while (d < subDim) {
            val x = (if (f) v.getFloat(s * subDim + d).toDouble
              else v.getDouble(s * subDim + d)) - flat(base + d)
            d2 += x * x
            d += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        val cell = s * k + best
        buf.counts(cell) += 1
        val sbase = cell * subDim
        var d = 0
        while (d < subDim) {
          buf.sums(sbase + d) +=
            (if (f) v.getFloat(s * subDim + d).toDouble
             else v.getDouble(s * subDim + d))
          d += 1
        }
        s += 1
      }
      buf
    }

    override def merge(a: PqTrainState, b: PqTrainState): PqTrainState = {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
      a
    }

    override def eval(buf: PqTrainState): Any =
      org.apache.spark.sql.catalyst.InternalRow(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.sums),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.counts))

    override def serialize(buf: PqTrainState): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(
        8 * buf.sums.length + 8 * buf.counts.length)
      buf.sums.foreach(bb.putDouble)
      buf.counts.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): PqTrainState = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val sums = new Array[Double](numSub * k * subDim)
      var i = 0
      while (i < sums.length) { sums(i) = bb.getDouble(); i += 1 }
      val counts = new Array[Long](numSub * k)
      i = 0
      while (i < counts.length) { counts(i) = bb.getLong(); i += 1 }
      PqTrainState(sums, counts)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): PqTrainStep =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): PqTrainStep =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Mutable accumulation state of [[PqTrainStep]]. */
  final case class PqTrainState(sums: Array[Double], counts: Array[Long])

  // shorthand so PqTrainStep can extend UnaryLike cleanly
  private type UnaryLike =
    org.apache.spark.sql.catalyst.trees.UnaryLike[Expression]

  // ---- Column-level entry points (Spark 4 Column <-> Expression
  // bridge, the CosineSimilarity idiom) ----

  def pqTrainStep(vec: Column, numSub: Int, k: Int, subDim: Int,
      flat: Array[Double]): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(PqTrainStep(GraftShims.toExpression(vec),
      numSub, k, subDim, flat)
      .toAggregateExpression())
  }

  def pqEncode(vec: Column, numSub: Int, k: Int, subDim: Int,
      flat: Array[Double], asInts: Boolean = false): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(PqEncode(GraftShims.toExpression(vec),
      numSub, k, subDim, flat, asInts))
  }

  def pqApproxCosine(codes: Column, query: Column, numSub: Int, k: Int,
      subDim: Int, flat: Array[Double], sqnorms: Array[Double]): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(PqApproxCosine(GraftShims.toExpression(codes),
      GraftShims.toExpression(query), numSub, k, subDim, flat, sqnorms))
  }

  def pqAdc(codes: Column, numSub: Int, k: Int, dotLut: Array[Double],
      sqnorms: Array[Double], qNorm: Double): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(PqAdc(GraftShims.toExpression(codes),
      numSub, k, dotLut, sqnorms, qNorm))
  }
}
