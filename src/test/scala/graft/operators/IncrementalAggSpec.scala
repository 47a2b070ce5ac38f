package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, tag: String) =
    (1 to n).map(i => (i % 5, s"g${i % 3}", tag, i.toLong))
      .toDF("part", "grp", "tag", "v")
      .withColumn("v", $"v".cast("decimal(20,4)"))

  test("three incremental folds equal a one-shot aggregate exactly") {
    val path = tmpDir("incr") + "/agg"
    val chunks = Seq(rows(40, "a"), rows(25, "b"), rows(33, "c"))
    chunks.foreach(c => IncrementalAgg.upsert(spark, path, c,
      Seq("part", "grp"), "n", Seq("v" -> "sum_v"),
      partitionKeys = Seq("part")))
    val got = spark.read.parquet(path)
      .select($"part".cast("int"), $"grp", $"n", $"sum_v")
      .as[(Int, String, Long, BigDecimal)].collect().toSet
    val want = chunks.reduce(_ unionByName _)
      .groupBy($"part", $"grp")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .select($"part".cast("int"), $"grp", $"n",
        $"sum_v".cast("decimal(30,4)"))
      .as[(Int, String, Long, BigDecimal)].collect().toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4.bigDecimal.stripTrailingZeros)) ==
      want.map(t => (t._1, t._2, t._3, t._4.bigDecimal.stripTrailingZeros)))
  }

  test("a fold that misses a partition leaves its files untouched") {
    val path = tmpDir("incr") + "/agg"
    IncrementalAgg.upsert(spark, path, rows(40, "a"),
      Seq("part", "grp"), "n", Seq("v" -> "sum_v"), Seq("part"))
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def filesOf(p: Int) =
      fs.listStatus(new Path(s"$path/part=$p"))
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSet
    val before = filesOf(3)
    // second chunk only touches part 0 and 1
    val chunk2 = rows(40, "b").where($"part" < 2)
    IncrementalAgg.upsert(spark, path, chunk2,
      Seq("part", "grp"), "n", Seq("v" -> "sum_v"), Seq("part"))
    assert(filesOf(3) == before, "untouched partition was rewritten")
    // touched group really combined: (part 0, g0) = i ∈ {15, 30} in
    // each chunk → 2 + 2 rows after the fold
    val n0 = spark.read.parquet(path)
      .where($"part" === 0 && $"grp" === "g0").select($"n")
      .as[Long].head()
    assert(n0 == 4, s"expected combined count 4, got $n0")
  }

  test("property: ANY chunking of the input folds to the one-shot " +
    "aggregate (count + decimal sum, every group)") {
    // rows are (key, value); a chunking is a list of cut points — the
    // fold order and chunk sizes must never matter
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 6), Gen.choose(-50, 50)))
    val gen = for {
      rs <- rowsGen
      nCuts <- Gen.choose(0, 4)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, rs.size))
    } yield (rs, cuts.sorted)
    val prop = Prop.forAll(gen) { case (rs, cuts) =>
      val path = tmpDir("incrprop") + "/agg"
      val bounds = (0 +: cuts :+ rs.size).distinct.sorted
      val chunks = bounds.zip(bounds.tail)
        .map { case (a, b) => rs.slice(a, b) }
        .filter(_.nonEmpty)
      chunks.foreach { ch =>
        val df = ch.toDF("k", "v")
          .withColumn("v", $"v".cast("decimal(20,2)"))
        IncrementalAgg.upsert(spark, path, df,
          Seq("k"), "n", Seq("v" -> "sum_v"))
      }
      val got = spark.read.parquet(path)
        .select($"k", $"n", $"sum_v".cast("decimal(30,2)"))
        .as[(Int, Long, BigDecimal)].collect()
        .map(t => (t._1, t._2, t._3.bigDecimal.stripTrailingZeros)).toSet
      val want = rs.groupBy(_._1).map { case (k, vs) =>
        (k, vs.size.toLong,
          new java.math.BigDecimal(vs.map(_._2).sum).stripTrailingZeros)
      }.toSet
      got == want
    }
    val res = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("unpartitioned aggregate table folds via staged overwrite") {
    val path = tmpDir("incr") + "/agg"
    Seq(rows(10, "a"), rows(10, "b")).foreach(c =>
      IncrementalAgg.upsert(spark, path, c,
        Seq("grp"), "n", Seq("v" -> "sum_v")))
    val got = spark.read.parquet(path)
      .agg(sum($"n")).as[Long].head()
    assert(got == 20L)
  }

  test("a NULL group key is ONE running group: folds merge it " +
    "null-safely instead of duplicating it per fold") {
    val path = tmpDir("incr") + "/nullkey"
    def chunk(tag: String) =
      Seq((null.asInstanceOf[String], 1L), ("g1", 2L), (null, 3L))
        .toDF("grp", "v").withColumn("v", $"v".cast("decimal(20,4)"))
    IncrementalAgg.upsert(spark, path, chunk("a"),
      Seq("grp"), "n", Seq("v" -> "sum_v"))
    IncrementalAgg.upsert(spark, path, chunk("b"),
      Seq("grp"), "n", Seq("v" -> "sum_v"))
    val rows = spark.read.parquet(path)
      .select($"grp", $"n", $"sum_v".cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.count(_._1 == null) == 1,
      s"the NULL group must stay one merged row, got $rows")
    assert(rows.find(_._1 == null).get == ((null, 4L, 8L)))
    assert(rows.find(_._1 == "g1").get == (("g1", 2L, 4L)))
  }

  test("a crash inside the staged-overwrite commit window self-heals " +
    "on the next fold — history is recovered, never recreated") {
    val path = tmpDir("incr") + "/crash"
    IncrementalAgg.upsert(spark, path, rows(10, "a"),
      Seq("grp"), "n", Seq("v" -> "sum_v"))
    // simulate the crash window: table renamed to the hidden backup,
    // replacement never landed
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bak = new Path(DataMerge.hiddenSibling(path, ".old"))
    assert(fs.rename(new Path(path), bak))
    IncrementalAgg.upsert(spark, path, rows(10, "b"),
      Seq("grp"), "n", Seq("v" -> "sum_v"))
    assert(spark.read.parquet(path).agg(sum($"n")).as[Long].head() == 20L,
      "the fold must RECOVER the backup and merge, not restart from " +
        "the new chunk alone")
  }
}
