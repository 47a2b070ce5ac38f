package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: random-hyperplane LSH bucket — the sign
  * pattern of `planes.length` dot products packed into a long.
  *
  * Why a custom Expression (SURVEY §2.10, same rationale as
  * [[CosineSimilarity]]): the higher-order composition in
  * `VectorFunctions.hyperplaneBucketHof` evaluates one
  * `aggregate(zip_with(...))` PER PLANE per row — every one of them
  * CodegenFallback, allocating a zipped array and boxing each lambda
  * application, and breaking the whole-stage-codegen span of the index
  * build. This compiles to one tight nested primitive loop (planes ×
  * dim) inside WholeStageCodegen — the index-build scan over a 100 TB
  * corpus stays entirely in generated code. Semantics are identical
  * (same dot-product accumulation order; strict `> 0` sign test),
  * verified in HyperplaneExprSpec against the composition.
  *
  * The plane matrix is a fixed per-index constant (deterministic seed),
  * embedded via a codegen reference object, not serialized per row.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63,
    "bucket bits must fit a positive long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_bucket"

  /** Analysis-time gate (same rationale as [[CosineSimilarity]]):
    * a non-float/double array child would read garbage dot products
    * and bucket the whole index wrongly with no error. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType |
        org.apache.spark.sql.types.DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float>/array<double> input, " +
          s"got ${other.catalogString}")
    }
  }

  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val f = isFloatArray
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val n = math.min(v.numElements(), w.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        d += (if (f) v.getFloat(i).toDouble else v.getDouble(i)) * w(i)
        i += 1
      }
      if (d > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val get = if (isFloatArray) "getFloat" else "getDouble"
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      s"""
        long $bucket = 0L;
        for (int $p = 0; $p < $planesRef.length; $p++) {
          double[] $w = $planesRef[$p];
          int $n = java.lang.Math.min($v.numElements(), $w.length);
          double $d = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $d += ((double) $v.$get($i)) * $w[$i];
          }
          if ($d > 0) $bucket |= (1L << $p);
        }
        ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Column-level entry point (Spark 4: Column <-> Expression bridge). */
  def apply(vec: Column, planes: Seq[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(
      HyperplaneBucket(GraftShims.toExpression(vec), planes.toArray))
  }
}
