package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (builder guidance: "salting for skew, AQE
  * for runtime re-plan"). AQE's skew-join handling covers sort-merge
  * joins automatically; these cover the two cases it doesn't:
  * skewed AGGREGATION keys, and skewed joins where one side must be
  * replicated.
  *
  * Both are pure plan transforms — no custom physical operators — so
  * they compose with codegen/AQE as usual.
  */
object Skew {

  /** Two-phase aggregation over a skewed group key: first aggregate on
    * (key, salt) — spreading one hot key over `buckets` reducers —
    * then aggregate the partials. Correct for any associative partial
    * aggregate (sum/count/min/max); the caller supplies both phases.
    *
    * At 1000 executors a single hot key otherwise serializes the whole
    * stage on one reducer; salting bounds per-reducer load at
    * total/buckets.
    */
  def saltedAgg(df: DataFrame, key: Column, buckets: Int)(
      partial: Seq[(Column, String)], merge: Seq[(Column, String)]): DataFrame = {
    // The group column keeps the caller's name (schema-only resolution,
    // no job), so the salted result is drop-in schema-compatible with
    // the plain groupBy it replaces.
    val keyName = df.select(key).schema.head.name
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy(key.as(keyName), col("__salt"))
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    phase1.groupBy(col(keyName))
      .agg(merge.head._1.as(merge.head._2),
        merge.tail.map { case (c, n) => c.as(n) }: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side: left rows get a random-ish salt in [0, buckets); right rows
    * are replicated `buckets` times; the join key becomes (key, salt).
    * One hot left key now lands on `buckets` different reducers.
    *
    * Right-side replication costs |right| × buckets rows — use when
    * the right side is too big to broadcast outright but small enough
    * to replicate (the classic mid-size dimension with a hot key).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))
        .cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight,
      leftKey === rightKey && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
