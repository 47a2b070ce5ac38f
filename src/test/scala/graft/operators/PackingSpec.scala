package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("distributed prefix sum equals the sequential cumsum") {
    val sizes = Seq.tabulate(97)(i => (i.toLong, ((i * 37) % 11 + 1).toLong))
    val df = sizes.toDF("id", "n")
    val got = Packing.withOffsets(df, "n", "id", numRanges = 7)
      .select($"id", $"tok_offset").as[(Long, Long)].collect().toMap
    var acc = 0L
    sizes.foreach { case (id, n) =>
      assert(got(id) == acc, s"offset of $id"); acc += n
    }
  }

  test("pack assignment splits spanning docs at budget boundaries") {
    // budget 10: doc sizes 4,4,4 -> offsets 0,4,8; third doc spans packs 0-1
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("id", "n")
    val got = Packing.assignPacks(df, "n", "id", budget = 10L, numRanges = 2)
      .select($"id", $"pack_id", $"packs_spanned")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L, 1), (2L, 0L, 1), (3L, 0L, 2)))
  }

  test("zero-size docs span exactly ONE pack, boundary-aligned or not") {
    // budget 10: sizes 10,0,5,0 -> offsets 0,10,10,15; both empty docs
    // sit differently (one ON a boundary) and both must span 1
    val df = Seq((1L, 10L), (2L, 0L), (3L, 5L), (4L, 0L)).toDF("id", "n")
    val got = Packing.assignPacks(df, "n", "id", budget = 10L, numRanges = 2)
      .select($"id", $"pack_id", $"packs_spanned")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L, 1), (2L, 1L, 1), (3L, 1L, 1),
      (4L, 1L, 1)))
    // and a size-0 doc at offset 0 (the DIV-truncation edge) spans 1
    val zf = Seq((1L, 0L), (2L, 3L)).toDF("id", "n")
    val z = Packing.assignPacks(zf, "n", "id", budget = 10L, numRanges = 1)
      .select($"id", $"packs_spanned").as[(Long, Int)].collect().toMap
    assert(z(1L) == 1)
  }

  test("plan is range-partitioned, never a single-partition global sort") {
    val df = spark.range(1000).toDF("id").withColumn("n", lit(3L))
    val out = Packing.withOffsets(df, "n", "id", numRanges = 6)
    // The window must require hashpartitioning(__pid), satisfied by the
    // range shuffle — never SinglePartition (the global-window plan).
    // AQE may still COALESCE tiny shuffles at test scale; that's data-
    // size-driven and fine — the forbidden shape is the single-partition
    // DISTRIBUTION REQUIREMENT, which no data size escapes.
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "plan contains a SinglePartition exchange:\n" + plan)
  }
}
