package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-example assembly: documents are
  * concatenated in a deterministic global order and chunked into
  * fixed-token-budget packs (the standard concat-then-chunk shape for
  * LLM pretraining batches). The core primitive is a GLOBAL exclusive
  * prefix sum of per-document token counts — which must NOT be
  * expressed as `sum().over(Window.orderBy(...))` with no partitioning:
  * that plan collapses to a single-partition sort (Spark even warns) and
  * is the canonical 100 TB scale-killer.
  *
  * Distributed shape instead: range-shuffle on the order key, local
  * prefix sums per range, plus a per-range base offset computed from
  * the ≤`numRanges` subtotals (a control-plane-sized driver reduce,
  * broadcast back). Two shuffles total, no global sort, identical
  * result to the single-partition window.
  */
object Packing {

  /** Adds `tok_offset`: the exclusive running sum of `sizeCol` in
    * ascending `orderCol` order. `orderCol` must be unique (it defines
    * the global concatenation order); `sizeCol` must be non-negative. */
  def withOffsets(df: DataFrame, sizeCol: String, orderCol: String,
      numRanges: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // MATERIALIZED once (eager localCheckpoint): the ranged frame
    // feeds two jobs — the subtotal collect below and the caller's
    // action — and RangePartitioner's boundaries come from SAMPLING
    // seeded per execution. Re-executing the plan could land boundary
    // rows in a neighboring range, silently breaking base(pid)+local
    // == global-prefix. Small tests (sample == full data) never see
    // it; only the materialization makes the two jobs agree at scale.
    val ranged = df.repartitionByRange(numRanges, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // per-range subtotals — ≤ numRanges rows, a control-plane collect
    val totals = ranged.groupBy("__pid")
      .agg(sum(col(sizeCol).cast("long")).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases = (0 until numRanges)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
    val baseDf = (0 until numRanges).map(p => (p, bases(p)))
      .toDF("__pid", "__base")
    // ranges hold ascending orderCol spans in ascending pid order, so
    // base(pid) + local exclusive prefix == the global exclusive prefix
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    ranged
      .withColumn("__local",
        sum(col(sizeCol).cast("long")).over(w) - col(sizeCol).cast("long"))
      .join(broadcast(baseDf), "__pid")
      .withColumn("tok_offset", col("__base") + col("__local"))
      .drop("__pid", "__local", "__base")
  }

  /** Pack assignment under a fixed token `budget`: each document's
    * span is [tok_offset, tok_offset + size); `pack_id` is the pack its
    * first token lands in, `packs_spanned` how many consecutive packs
    * the document crosses (concat-then-chunk splits long documents at
    * pack boundaries rather than leaving slack). floor() on doubles is
    * exact here — offsets are integers far below 2^53. */
  def assignPacks(df: DataFrame, sizeCol: String, orderCol: String,
      budget: Long, numRanges: Int = 64): DataFrame =
    withOffsets(df, sizeCol, orderCol, numRanges)
      // integer DIV, not floor(a / b): the double division is only
      // exact below 2^53 total tokens — DIV stays exact at any corpus
      // size (offsets are non-negative, so DIV == floor division)
      .withColumn("pack_id", expr(s"tok_offset DIV $budget"))
      // size-0 docs span exactly the ONE pack holding their offset:
      // the last-token formula would give 0 on a pack boundary and
      // hit DIV's truncate-toward-zero (not floor) at offset 0
      .withColumn("packs_spanned",
        when(col(sizeCol).cast("long") === 0L, lit(1))
          .otherwise((expr(
            s"(tok_offset + CAST(${sizeCol} AS BIGINT) - 1) DIV $budget")
            - col("pack_id") + 1).cast("int")))
}
