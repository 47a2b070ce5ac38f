package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression fusing the whole MinHash signature
  * pipeline — word-shingle construction, xxhash64, and the `numHashes`
  * splitmix64 minima — into ONE generated loop over the token array.
  *
  * Why fused (builder preference (b), same rationale as [[MinHashes]]):
  * the staged form materializes a distinct-shingle array via
  * `transform(sequence(...), concat_ws(...))` and hashes it via
  * `transform(_, xxhash64)` — both higher-order functions are
  * CodegenFallback, so every row pays two interpreted array
  * materializations with per-element boxing before the native
  * [[MinHashes]] even runs. Here each shingle is built (same
  * `UTF8String.concatWs` the built-in uses), hashed with the same
  * xxhash64 (seed 42, `XXH64.hashUnsafeBytes` — bit-identical to
  * Spark's `xxhash64()`), folded into the minima, and discarded —
  * nothing intermediate is allocated per row beyond one k-slot parts
  * buffer.
  *
  * Signature parity with the staged pipeline is exact: same shingle
  * strings, same base hash, same seed family as [[MinHashes]]
  * (splitmix64 over seed 0x5eed), and MinHash minima are insensitive
  * to the `array_distinct` the staged form applies (duplicate shingles
  * cannot change a minimum). Verified in ShingleMinHashSpec.
  */
case class ShingleMinHashes(child: Expression, shingleSize: Int,
    numHashes: Int) extends UnaryExpression {

  require(shingleSize >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhashes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> of tokens, " +
          s"got ${other.catalogString}")
    }
  }

  private lazy val seeds: Array[Long] = {
    val rnd = new scala.util.Random(0x5eed) // MUST match MinHashes' family
    Array.fill(numHashes)(rnd.nextLong())
  }

  @inline private def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val parts = new Array[UTF8String](shingleSize)
    val cnt = n - (shingleSize - 1)
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < shingleSize) {
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      val sh = UTF8String.concatWs(Space, parts: _*)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
      var m = 0
      while (m < numHashes) {
        val z = mix(h + seeds(m))
        if (z < mins(m)) mins(m) = z
        m += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("shingleMinhashSeeds", seeds, "long[]")
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val parts = ctx.freshName("parts")
      val sp = ctx.freshName("sp")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val sh = ctx.freshName("sh")
      val cnt = ctx.freshName("cnt")
      s"""
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        $utf8[] $parts = new $utf8[$shingleSize];
        $utf8 $sp = $utf8.fromString(" ");
        int $cnt = $a.numElements() - ${shingleSize - 1};
        for (int $i = 0; $i < $cnt; $i++) {
          for (int $j = 0; $j < $shingleSize; $j++) {
            $parts[$j] = $a.getUTF8String($i + $j);
          }
          $utf8 $sh = $utf8.concatWs($sp, $parts);
          long $h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes($sh.getBaseObject(), $sh.getBaseOffset(),
              $sh.numBytes(), 42L);
          for (int $m = 0; $m < $numHashes; $m++) {
            long $z = $h + $seedsRef[$m];
            $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
            $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
            $z = $z ^ ($z >>> 31);
            if ($z < $mins[$m]) $mins[$m] = $z;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleMinHashes {
  def apply(tokens: Column, shingleSize: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.toColumn(ShingleMinHashes(
      GraftShims.toExpression(tokens), shingleSize, numHashes))
  }
}
