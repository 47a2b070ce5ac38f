package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** One fused Lloyd refinement step for the IVF codebook
  * ([[graft.operators.Similarity.buildCodebook]]): assign each vector
  * to its nearest centroid by cosine (exactly [[CosineSimilarity]]'s
  * arithmetic — double accumulation in index order, first centroid
  * wins ties, zero-norm on either side contributes nothing) and
  * accumulate per-cell element sums + row counts into one
  * fixed-size buffer: `struct(sums: array<double>[n·dim], counts:
  * array<long>[n])`, from which the caller derives the per-cell mean
  * vectors (cells with zero rows keep their previous centroid).
  *
  * Optimization r19 (guide §1.2 step 1 — [[PqExpressions.PqTrainStep]]
  * is the sibling): the original mean-update ran the codegen'd assign
  * pass, posexploded every vector to `dim` rows and hash-aggregated
  * them by (list, pos) — dim× row volume plus a grouped shuffle per
  * refinement iteration, on every sim-family query that refines its
  * codebook. This form folds each row once; the shuffle is one
  * partial state per partition and the collect is ONE row. The
  * resulting means are sum/count over exactly the rows the grouped
  * avg averaged.
  */
case class IvfTrainStep(child: Expression, cents: Array[Array[Double]],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[IvfTrainState]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(cents.nonEmpty, "empty codebook")
  private val dim = cents.head.length
  require(cents.forall(_.length == dim), "ragged codebook")
  /** ‖centroid‖² per cell, precomputed once — the per-row cosine then
    * costs one dot product per cell (the assign pass re-derived the
    * centroid norm per row per cell; values are identical because
    * sqrt(ny) of a fixed centroid is a pure function of its bits). */
  private lazy val centNorms: Array[Double] = cents.map { c =>
    var ny = 0.0; var i = 0
    while (i < c.length) { ny += c(i) * c(i); i += 1 }
    math.sqrt(ny)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "ivf_train_step"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float>/array<double> input, " +
          s"got ${other.catalogString}")
    }
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): IvfTrainState =
    IvfTrainState(new Array[Double](cents.length * dim),
      new Array[Long](cents.length))

  override def update(buf: IvfTrainState,
      input: InternalRow): IvfTrainState = {
    val any = child.eval(input)
    if (any == null) return buf
    val v = any.asInstanceOf[ArrayData]
    // wrong-dim vectors throw exactly like PqTrainStep — a shorter
    // vector would add to only the prefix of its cell's sums while
    // counts increment once, silently dragging the trailing dims of
    // the mean toward zero (r19 ADVICE); the codebook-build invariant
    // (seeds come from the same corpus) makes the check free
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"ivf_train_step got a vector of dim ${v.numElements()} where " +
        s"the codebook is dim $dim — training on a prefix of the space")
    val f = isFloat
    // assignment = argmax cosine, FIRST max wins ties (the
    // array_position discipline of the assign pass); a zero-norm row
    // or centroid yields a null cosine there, i.e. no candidate here
    var best = -1
    var bestScore = 0.0
    var c = 0
    while (c < cents.length) {
      {
        val cent = cents(c)
        val n = math.min(v.numElements(), cent.length)
        var dot = 0.0; var nx = 0.0
        var i = 0
        while (i < n) {
          val xi = if (f) v.getFloat(i).toDouble else v.getDouble(i)
          dot += xi * cent(i); nx += xi * xi
          i += 1
        }
        // the cosine truncates to the shorter operand, so the centroid
        // norm must cover only the compared prefix — the precomputed
        // full norm applies exactly when dims match (the codebook-
        // build invariant); same bits as CosineSimilarity either way
        val cn =
          if (n == cent.length) centNorms(c)
          else {
            var ny = 0.0; var i2 = 0
            while (i2 < n) { ny += cent(i2) * cent(i2); i2 += 1 }
            math.sqrt(ny)
          }
        if (nx != 0.0 && cn != 0.0) {
          val score = dot / (math.sqrt(nx) * cn)
          if (best < 0 || score > bestScore) { best = c; bestScore = score }
        }
      }
      c += 1
    }
    if (best >= 0) {
      buf.counts(best) += 1
      val base = best * dim
      val n = math.min(v.numElements(), dim)
      var i = 0
      while (i < n) {
        buf.sums(base + i) +=
          (if (f) v.getFloat(i).toDouble else v.getDouble(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: IvfTrainState, b: IvfTrainState): IvfTrainState = {
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
    a
  }

  override def eval(buf: IvfTrainState): Any =
    InternalRow(new GenericArrayData(buf.sums),
      new GenericArrayData(buf.counts))

  override def serialize(buf: IvfTrainState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 * buf.sums.length + 8 * buf.counts.length)
    buf.sums.foreach(bb.putDouble)
    buf.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): IvfTrainState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sums = new Array[Double](cents.length * dim)
    var i = 0
    while (i < sums.length) { sums(i) = bb.getDouble(); i += 1 }
    val counts = new Array[Long](cents.length)
    i = 0
    while (i < counts.length) { counts(i) = bb.getLong(); i += 1 }
    IvfTrainState(sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): IvfTrainStep =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): IvfTrainStep =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Mutable accumulation state of [[IvfTrainStep]]. */
final case class IvfTrainState(sums: Array[Double], counts: Array[Long])

object IvfTrainStep {
  /** Column-level entry point (the [[CosineSimilarity]] bridge). */
  def apply(vec: Column, cents: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(
      new IvfTrainStep(GraftShims.toExpression(vec), cents)
        .toAggregateExpression())
  }
}
