package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * the higher-order built-ins (`zip_with`, `aggregate`) per SURVEY §2.10
  * — codegen-compatible, no UDF, accumulating in double.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash-family) LSH bucket for ANN search: the
    * sign pattern of `planes.size` dot products packed into a long.
    * Planes are fixed per index build, so the bucket id is a pure
    * shuffle key — a 100 TB index partitions/bucket-prunes on it.
    * Delegates to the native codegen'd [[HyperplaneBucket]] expression
    * (the HOF composition below is CodegenFallback — kept only as the
    * semantic reference for HyperplaneExprSpec). */
  def hyperplaneBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    HyperplaneBucket(vec, planes)

  /** Higher-order-function reference implementation of
    * [[hyperplaneBucket]] — identical semantics, interpreted (every
    * aggregate/zip_with is CodegenFallback). Spec-only. */
  def hyperplaneBucketHof(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = aggregate(
        zip_with(vec, lit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic unit-free pseudo-random planes (fixed seed — index
    * identity must be stable across runs and executors). */
  def makePlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
