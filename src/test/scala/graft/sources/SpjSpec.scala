package graft.sources

import graft.SparkSpec
import graft.operators.Versioned
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over bucketed graft snapshot tables: the
  * write-time shuffle (commitBucketed) buys every subsequent
  * co-bucketed join freedom from BOTH exchanges — asserted on the
  * physical plan, with results checked against the unbucketed join.
  * This is the lake-format counterpart of BucketingSpec's Hive-table
  * proof, on the format that also has time travel / stats skipping. */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // AQE: final plan only materializes after execution
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val adaptive = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          count(a.executedPlan)
        case _ => 0
      }
      val reused = p match {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          count(r.child)
        case _ => 0
      }
      self + adaptive + reused + p.children.map(count).sum +
        p.subqueries.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def freshCat(root: String, tag: String): String = {
    val cat = s"spj_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("co-bucketed fact-fact join runs with zero shuffle exchanges") {
    val root = tmpDir("spj")
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    Versioned.commitBucketed(li, s"$root/lake/li", "l_orderkey", 4)
    Versioned.commitBucketed(ord, s"$root/lake/ord", "o_orderkey", 4)
    val cat = freshCat(root, "a")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$cat.lake.li")
        .join(spark.table(s"$cat.lake.ord"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_quantity", $"o_totalprice")
      assert(shuffles(joined) == 0,
        "co-bucketed join should not shuffle:\n" +
          joined.queryExecution.executedPlan)

      val expected = li.join(ord, $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketed groupBy on the bucket key also avoids the shuffle") {
    val root = tmpDir("spj")
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    Versioned.commitBucketed(li, s"$root/lake/li", "l_orderkey", 4)
    val cat = freshCat(root, "g")
    val agg = spark.table(s"$cat.lake.li")
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
    // KeyGroupedPartitioning satisfies ClusteredDistribution on the key
    assert(shuffles(agg) == 0,
      "bucketed groupBy should not shuffle:\n" +
        agg.queryExecution.executedPlan)
    val expected = li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q")).collect().toSet
    assert(agg.collect().toSet == expected)
  }

  test("skewed bucket keys under partially-clustered distribution: " +
    "zero shuffles, split-level parallelism preserved on the hot bucket") {
    val root = tmpDir("spj")
    // hot key 1L dominates; three append commits → three files per
    // bucket, so the scan plans multiple splits per bucket key
    val hot = (1 to 30000).map(_ => (1L, 1.0))
    val cold = (2L to 200L).map(k => (k, 2.0))
    val factTable = s"$root/lake/fact"
    Seq(hot, cold, hot).zipWithIndex.foreach { case (rows, i) =>
      Versioned.commitBucketed(rows.toDF("k", "v"), factTable, "k", 4,
        if (i == 0) "overwrite" else "append")
    }
    val dim = (1L to 200L).map(k => (k, s"d$k")).toDF("k", "name")
    Versioned.commitBucketed(dim, s"$root/lake/dim", "k", 4)
    val cat = freshCat(root, "pc")

    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val pcKey =
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(pcKey, "true")
      val joined = spark.table(s"$cat.lake.fact")
        .join(spark.table(s"$cat.lake.dim"), "k")
        .select($"k", $"v", $"name")
      assert(shuffles(joined) == 0,
        "partially-clustered co-bucketed join should not shuffle:\n" +
          joined.queryExecution.executedPlan)
      assert(joined.count() == (30000L * 2 + 199))
      // the hot bucket's splits stayed separate tasks: more scan tasks
      // than buckets on at least one side (pre-r6 the batch pre-grouped
      // every bucket into exactly one task, making this conf inert)
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[Int] = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => scans(q.plan)
        case s: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => Seq(s.inputRDD.getNumPartitions)
        case other => other.children.flatMap(scans)
      }
      val scanParts = scans(joined.queryExecution.executedPlan)
      assert(scanParts.nonEmpty && scanParts.exists(_ > 4),
        s"expected split-level tasks beyond the 4 buckets, got $scanParts")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset(pcKey)
    }
  }

  test("SQL INSERT INTO keeps the layout; results stay correct") {
    val root = tmpDir("spj")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    Versioned.commitBucketed(ord.where($"o_orderkey" % 2 === 0),
      s"$root/lake/ord", "o_orderkey", 4)
    val cat = freshCat(root, "i")
    ord.where($"o_orderkey" % 2 === 1).createOrReplaceTempView("spj_odd")
    spark.sql(s"INSERT INTO $cat.lake.ord SELECT * FROM spj_odd")
    assert(Versioned.bucketSpec(spark, s"$root/lake/ord")
      .contains(("o_orderkey", 4)))
    assert(spark.table(s"$cat.lake.ord").count() == ord.count())
    // every file of the appended version still parses a bucket id
    val files = Versioned.versionFiles(spark, s"$root/lake/ord")
    assert(files.nonEmpty && files.forall(f =>
      Versioned.bucketIdOf(f).isDefined))
  }

  test("plain append de-buckets: declaration dropped, scan still correct") {
    val root = tmpDir("spj")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    Versioned.commitBucketed(ord.limit(100), s"$root/lake/ord",
      "o_orderkey", 4)
    Versioned.commit(ord.limit(50), s"$root/lake/ord", "append")
    assert(Versioned.bucketSpec(spark, s"$root/lake/ord").isEmpty)
    val cat = freshCat(root, "d")
    assert(spark.table(s"$cat.lake.ord").count() == 150)
    // the still-bucketed historical version keeps its declaration
    assert(Versioned.bucketSpec(spark, s"$root/lake/ord", Some(0L))
      .contains(("o_orderkey", 4)))
  }

  test("OPTIMIZE preserves the bucket layout: compaction merges per " +
    "bucket, ZORDER clusters within buckets, SPJ survives maintenance") {
    val root = tmpDir("spj")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    val table = s"$root/lake/ord"
    // three bucketed appends → three files per bucket
    Versioned.commitBucketed(ord.where($"o_orderkey" % 3 === 0),
      table, "o_orderkey", 4)
    Versioned.commitBucketed(ord.where($"o_orderkey" % 3 === 1),
      table, "o_orderkey", 4, "append")
    Versioned.commitBucketed(ord.where($"o_orderkey" % 3 === 2),
      table, "o_orderkey", 4, "append")
    assert(Versioned.versionFiles(spark, table).size == 12)

    val res = spark.sql(s"OPTIMIZE '$table' COMPACT").collect()
    assert(res.head.getLong(1) == 12 && res.head.getLong(2) == 4,
      res.mkString)
    // layout survives: declaration intact, every file in a bucket dir
    assert(Versioned.bucketSpec(spark, table).contains(("o_orderkey", 4)))
    assert(spark.read.parquet(
        Versioned.versionFiles(spark, table): _*).count() == ord.count())

    // ZORDER keeps the layout too (clusters within buckets)
    spark.sql(s"OPTIMIZE '$table' ZORDER BY (o_totalprice)").collect()
    assert(Versioned.bucketSpec(spark, table).contains(("o_orderkey", 4)))
    assert(Versioned.read(spark, table).count() == ord.count())

    // and the maintained table still joins with zero exchanges
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    Versioned.commitBucketed(li, s"$root/lake/li", "l_orderkey", 4)
    val cat = freshCat(root, "opt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$cat.lake.li")
        .join(spark.table(s"$cat.lake.ord"),
          $"l_orderkey" === $"o_orderkey")
      assert(shuffles(joined) == 0,
        "post-OPTIMIZE co-bucketed join should not shuffle:\n" +
          joined.queryExecution.executedPlan)
      assert(joined.count() ==
        li.join(ord, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // INTO n FILES is rejected on a bucketed table, not half-honored
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE '$table' COMPACT INTO 2 FILES").collect()
    }
    assert(e.getMessage.contains("bucketed"))
  }

  test("copy-on-write DML preserves the bucket layout: UPDATE and " +
    "DELETE rewrite touched rows into their buckets") {
    val root = tmpDir("spj")
    val table = s"$root/lake/t"
    val df = (1L to 1000L).map(k => (k, k.toDouble)).toDF("k", "v")
    Versioned.commitBucketed(df, table, "k", 4)

    spark.sql(s"UPDATE '$table' SET v = 0.0 WHERE k <= 10").collect()
    assert(Versioned.bucketSpec(spark, table).contains(("k", 4)),
      "UPDATE dropped the bucket declaration")
    val afterUpdate = Versioned.read(spark, table)
    assert(afterUpdate.where($"v" === 0.0).count() == 10)
    assert(afterUpdate.count() == 1000)
    // every file (carried + replacement) still parses a bucket id
    assert(Versioned.versionFiles(spark, table).forall(f =>
      Versioned.bucketIdOf(f).isDefined))

    spark.sql(s"DELETE FROM '$table' WHERE k > 990").collect()
    assert(Versioned.bucketSpec(spark, table).contains(("k", 4)),
      "DELETE dropped the bucket declaration")
    assert(Versioned.read(spark, table).count() == 990)

    // rows rewritten by DML are still in the CORRECT bucket dir: the
    // V2 function and the file placement must agree post-DML
    val expected = Versioned.read(spark, table)
      .withColumn("b", pmod(hash($"k"), lit(4)))
      .select($"k", $"b").as[(Long, Int)].collect().toMap
    Versioned.versionFiles(spark, table).foreach { f =>
      val id = Versioned.bucketIdOf(f).get
      spark.read.parquet(f).select($"k").as[Long].collect()
        .foreach(k => assert(expected(k) == id,
          s"post-DML row k=$k in bucket $id, expected ${expected(k)}"))
    }
  }

  test("RESTORE reinstates the bucket declaration of the restored " +
    "version; restoring a pre-bucketing version honestly drops it") {
    val root = tmpDir("spj")
    val table = s"$root/lake/t"
    val df = (1L to 100L).map(k => (k, k.toDouble)).toDF("k", "v")
    Versioned.commit(df, table)                       // v0: unbucketed
    Versioned.commitBucketed(df, table, "k", 4)       // v1: bucketed
    Versioned.commit(df.limit(10), table)             // v2: plain overwrite
    assert(Versioned.bucketSpec(spark, table).isEmpty)

    spark.sql(s"RESTORE '$table' TO VERSION 1").collect()
    assert(Versioned.bucketSpec(spark, table).contains(("k", 4)),
      "restore of a bucketed version must reinstate the layout contract")
    assert(Versioned.read(spark, table).count() == 100)

    spark.sql(s"RESTORE '$table' TO VERSION 0").collect()
    assert(Versioned.bucketSpec(spark, table).isEmpty,
      "restore of an unbucketed version must not invent a layout")
  }

  test("CREATE TABLE PARTITIONED BY (bucket(n, col)) declares the " +
    "layout from birth and INSERTs inherit it") {
    val root = tmpDir("spj")
    val cat = freshCat(root, "ddl")
    spark.sql(s"CREATE TABLE $cat.lake.t (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    val table = s"$root/lake/t"
    // declared and placement-valid while still EMPTY
    assert(Versioned.bucketSpec(spark, table).contains(("k", 4)))
    assert(spark.table(s"$cat.lake.t").count() == 0)

    spark.sql(s"INSERT INTO $cat.lake.t " +
      "SELECT id AS k, id * 1.0 AS v FROM range(1000)")
    assert(Versioned.bucketSpec(spark, table).contains(("k", 4)))
    assert(spark.table(s"$cat.lake.t").count() == 1000)
    // inserted rows routed by the declared hash
    val expected = spark.range(1000)
      .select($"id", pmod(hash($"id"), lit(4)).as("b"))
      .as[(Long, Int)].collect().toMap
    Versioned.versionFiles(spark, table)
      .filter(f => spark.read.parquet(f).count() > 0)
      .foreach { f =>
        val id = Versioned.bucketIdOf(f).get
        spark.read.parquet(f).select($"k").as[Long].collect()
          .foreach(k => assert(expected(k) == id))
      }
    // the born-bucketed table aggregates on its key with no exchange
    val agg = spark.table(s"$cat.lake.t")
      .groupBy($"k").agg(sum($"v").as("s"))
    assert(shuffles(agg) == 0,
      "bucketed groupBy should not shuffle:\n" +
        agg.queryExecution.executedPlan)
    // non-bucket transforms are rejected, not silently dropped
    intercept[UnsupportedOperationException] {
      spark.sql(s"CREATE TABLE $cat.lake.t2 (k BIGINT, d DATE) " +
        "PARTITIONED BY (days(d))")
    }
  }

  test("bucket pruning: equality/IN on the bucket key plans only the " +
    "reachable buckets' files") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = tmpDir("spj")
    val table = s"$root/lake/t"
    val df = (1L to 4000L).map(k => (k, k.toDouble)).toDF("k", "v")
    Versioned.commitBucketed(df, table, "k", 8)
    assert(Versioned.versionFiles(spark, table).size == 8)
    val cat = freshCat(root, "bp")

    def scanFiles(q: org.apache.spark.sql.DataFrame): Seq[String] = {
      q.collect()
      def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[Seq[String]] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => find(a.executedPlan)
          case q2: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => find(q2.plan)
          case b: BatchScanExec => b.scan match {
            case r: RuntimeSkippingScan => Seq(r.currentFiles)
            case _ => Nil
          }
          case other => other.children.flatMap(find)
        }
      find(q.queryExecution.executedPlan).flatten
    }

    val eq = spark.table(s"$cat.lake.t").where($"k" === 1234L)
    assert(eq.count() == 1)
    val eqFiles = scanFiles(spark.table(s"$cat.lake.t")
      .where($"k" === 1234L).select($"v"))
    assert(eqFiles.size == 1, s"expected 1 bucket file, got $eqFiles")
    val expectedBucket = spark.range(1)
      .select(pmod(hash(lit(1234L)), lit(8))).head().getInt(0)
    assert(Versioned.bucketIdOf(eqFiles.head).contains(expectedBucket))

    val in = spark.table(s"$cat.lake.t")
      .where($"k".isin(10L, 20L, 30L)).select($"k")
    assert(in.as[Long].collect().toSet == Set(10L, 20L, 30L))
    val inFiles = scanFiles(spark.table(s"$cat.lake.t")
      .where($"k".isin(10L, 20L, 30L)))
    assert(inFiles.size <= 3 && inFiles.size < 8, inFiles.toString)

    // >= inSetConversionThreshold (default 10) literals: the optimizer
    // rewrites In to InSet before pushdown — pruning must still engage
    val many = (1L to 11L).toSeq
    val expectedBuckets = spark.createDataset(many)
      .select(pmod(hash($"value"), lit(8))).distinct()
      .collect().map(_.getInt(0)).toSet
    val insetQ = spark.table(s"$cat.lake.t").where($"k".isin(many: _*))
    assert(insetQ.count() == 11)
    val insetFiles = scanFiles(spark.table(s"$cat.lake.t")
      .where($"k".isin(many: _*)))
    assert(insetFiles.flatMap(Versioned.bucketIdOf).toSet == expectedBuckets,
      s"InSet pruning planned $insetFiles, expected buckets $expectedBuckets")

    // a mistyped-literal comparison must NOT misprune: the cast
    // disables bucket pruning and the row is still found
    val castQ = spark.table(s"$cat.lake.t")
      .where($"k" === lit(1234)) // int literal vs bigint column
    assert(castQ.count() == 1)
  }

  test("bucket function matches the write-side layout hash") {
    val root = tmpDir("spj")
    val df = Seq((1L, "a"), (2L, "b"), (42L, "c"), (-7L, "d"))
      .toDF("k", "v")
    Versioned.commitBucketed(df, s"$root/lake/t", "k", 3)
    // recompute each row's bucket with the V2 function and check the
    // file it landed in carries that id
    val bound = GraftBucketFunction.bind(org.apache.spark.sql.types
      .StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
        .ScalarFunction[Integer]]
    val expected = df.withColumn("b", pmod(hash($"k"), lit(3)))
      .select($"k", $"b").as[(Long, Int)].collect().toMap
    expected.foreach { case (k, b) =>
      val viaFn = bound.produceResult(
        new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](3, k)))
      assert(viaFn == b, s"fn($k)=$viaFn, layout=$b")
    }
    // and the physical layout agrees: read each bucket dir, check ids
    val files = Versioned.versionFiles(spark, s"$root/lake/t")
    files.foreach { f =>
      val id = Versioned.bucketIdOf(f).get
      val ks = spark.read.parquet(f).select($"k").as[Long].collect()
      ks.foreach(k => assert(expected(k) == id,
        s"row k=$k in bucket dir $id, expected ${expected(k)}"))
    }
  }
}
