package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join (builder guidance: "repartition/bucketing
  * for co-located joins"): writing both fact tables bucketed by the
  * join key lets Spark join them with NO shuffle exchange — at 100 TB
  * the dominant cost of a fact-fact join. Asserted on the physical
  * plan, not just the row counts. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // warehouse.dir is static per-session; tables land in the default
    // ./spark-warehouse (gitignored) and are dropped in finally
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // disable auto-broadcast so the join would otherwise shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.Tables(spark, sfDir, "lineitem")
        .select($"l_orderkey", $"l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      graft.Tables(spark, sfDir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join should not shuffle:\n" + plan)

      // and it's still correct
      val expected = graft.Tables(spark, sfDir, "lineitem")
        .join(graft.Tables(spark, sfDir, "orders"),
          $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
