package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity between two
  * ArrayType(FloatType) columns, accumulated in double.
  *
  * Why a custom Expression (SURVEY §2.10 / builder preference (b)): the
  * built-in composition `aggregate(zip_with(a,b,_*_),…)` is correct but
  * every higher-order function is CodegenFallback — per row it allocates
  * a zipped array, boxes each lambda application, and breaks the
  * whole-stage-codegen span of the ANN scan. This expression compiles to
  * a tight primitive loop inside WholeStageCodegen (doGenCode below), so
  * a 100 TB brute-force/LSH scan stays in generated code. Semantics are
  * identical to VectorFunctions.cosine (same double accumulation order),
  * verified in CosineExprSpec against both that and the DuckDB oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  /** Analysis-time gate: a wrong-typed child (say a quantized
    * array<int>) would otherwise read misaligned bytes via getDouble
    * and flow plausible-looking garbage through the whole ANN scan. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Supports array<float> and array<double> children (mixed OK). */
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloatArray(left); val rf = isFloatArray(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getL = if (isFloatArray(left)) "getFloat" else "getDouble"
      val getR = if (isFloatArray(right)) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.$getL($i);
          double $yi = (double) $b.$getR($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        if ($nx == 0.0 || $ny == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point (Spark 4: Column <-> Expression is
    * private[sql]; bridged via GraftShims). */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(
      CosineSimilarity(GraftShims.toExpression(a), GraftShims.toExpression(b)))
  }
}
