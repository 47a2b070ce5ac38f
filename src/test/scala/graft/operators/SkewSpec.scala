package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** 90% of rows share one hot key. */
  private lazy val skewed = spark.range(0, 20000)
    .select(when($"id" % 10 =!= 0, lit(777L)).otherwise($"id").as("k"),
      ($"id" % 100).cast("double").as("v"))

  test("saltedAgg equals plain agg on skewed keys") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v".cast("decimal(18,2)")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), (r.getDecimal(1), r.getLong(2)))).toMap
    val saltedDf = Skew.saltedAgg(skewed, $"k", buckets = 8)(
      partial = Seq((sum($"v".cast("decimal(18,2)")), "ps"),
        (count(lit(1)), "pc")),
      merge = Seq((sum($"ps"), "s"), (sum($"pc"), "c")))
    val salted = saltedDf.collect()
      .map(r => (r.getLong(0), (r.getDecimal(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(plain(k)._2 == c, s"count mismatch for $k")
      assert(plain(k)._1.compareTo(s) == 0, s"sum mismatch for $k")
    }
  }

  test("saltedJoin equals plain join, and spreads the hot key") {
    // includes the hot key 777 so the skewed side actually joins it
    val dim = spark.range(770, 790).select($"id".as("dk"),
      concat(lit("n"), $"id").as("name"))
    val plain = skewed.join(dim, $"k" === $"dk")
      .groupBy($"name").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(skewed, dim, $"k", $"dk", buckets = 8)
      .groupBy($"name").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }
}
