package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the `numHashes` MinHash minima of an
  * array<long> of base hashes, in ONE pass.
  *
  * Why custom (builder preference (b)): the composed form —
  * `array((0 until k).map(i => array_min(transform(hs, h =>
  * xxhash64(lit(i), h)))))` — walks the array k times through
  * interpreted higher-order lambdas with per-element boxing; measured
  * ~15 s for 5k docs x ~150 shingles x 16 members at sf0.1. This
  * expression is a primitive double loop in generated code.
  *
  * Hash family: member j applies the splitmix64 finalizer (public
  * domain, Steele et al., JDK SplittableRandom) to `h + seed_j` —
  * non-monotone (a modulus-free linear family would pick the same min
  * shingle for every member and collapse the signature), and Java's
  * wrapping arithmetic makes it ANSI-safe by construction.
  */
case class MinHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhashes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> of shingle hashes, " +
          s"got ${other.catalogString}")
    }
  }

  private lazy val seeds: Array[Long] = {
    val rnd = new scala.util.Random(0x5eed)
    Array.fill(numHashes)(rnd.nextLong())
  }

  @inline private def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val z = mix(h + seeds(j))
        if (z < mins(j)) mins(j) = z
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val n = ctx.freshName("n")
      s"""
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          for (int $j = 0; $j < $numHashes; $j++) {
            long $z = $h + $seedsRef[$j];
            $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
            $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
            $z = $z ^ ($z >>> 31);
            if ($z < $mins[$j]) $mins[$j] = $z;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashes {
  def apply(hashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(MinHashes(GraftShims.toExpression(hashes), numHashes))
  }
}
