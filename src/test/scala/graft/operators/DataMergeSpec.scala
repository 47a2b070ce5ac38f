package graft.operators

import graft.SparkSpec

class DataMergeSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(path: String): Map[String, Long] = {
    val d = new java.io.File(path)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("upsert: updates win, inserts added, untouched partitions " +
    "keep their exact files") {
    val path = tmpDir("dmerge") + "/t"
    Seq((1L, 10.0, 2020), (2L, 20.0, 2020), (3L, 30.0, 2021))
      .toDF("k", "v", "part")
      .write.partitionBy("part").parquet(path)
    val before2020 = partFiles(s"$path/part=2020")
    assert(before2020.nonEmpty)

    // one matched update (k=3), one insert (k=4), one NEW partition (2022)
    val updates = Seq((3L, 300.0, 2021), (4L, 40.0, 2021), (5L, 50.0, 2022))
      .toDF("k", "v", "part")
    val touched = DataMerge.mergeIntoParquet(spark, path, updates,
      Seq("k"), "part")
    // touched values are reported string-rendered (Spark's own cast —
    // the same form the partition dir names use)
    assert(touched.toSet == Set("2021", "2022"))

    val after = spark.read.parquet(path)
      .select($"k", $"v", $"part".cast("int"))
      .as[(Long, Double, Int)].collect().toSet
    assert(after == Set((1L, 10.0, 2020), (2L, 20.0, 2020),
      (3L, 300.0, 2021), (4L, 40.0, 2021), (5L, 50.0, 2022)))

    // the untouched partition's files are bit-for-bit the same ones —
    // never read, rewritten, or renamed
    assert(partFiles(s"$path/part=2020") == before2020)
  }

  /** Partitions the v1 file index actually hands the scan — the
    * pruning PROOF (an answer-only check can't tell "pruned" from
    * "scanned everything and filtered"). */
  private def plannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in scoped plan"))
    scan.relation.location.listFiles(scan.partitionFilters, Nil).length
  }

  test("a merge touching MANY partitions scopes via an IN-set that " +
    "PRUNES at planning time, not a touched-count-sized literal " +
    "OR-tree — and the result is identical to the literal path") {
    val nParts = DataMerge.TupleFilterMaxLiterals * 3 // half = 96 > threshold
    val path = tmpDir("dmergewide") + "/t"
    (0 until nParts).map(i => (i.toLong, i * 1.0, i))
      .toDF("k", "v", "part")
      .write.partitionBy("part").parquet(path)
    // touch HALF the partitions: the scan must plan only those — the
    // broadcast semi-join alone would list every directory (no DPP
    // through cast/<=>), exactly the shape that breaks at 100k parts
    val updates = (0 until nParts by 2).map(i => (i.toLong, i * 10.0, i))
      .toDF("k", "v", "part")
    val touched = DataMerge.collectTuples(updates, Seq("part"))
    assert(touched.size == nParts / 2 && touched.size >
      DataMerge.TupleFilterMaxLiterals)
    val scoped = DataMerge.scopeToTuples(spark,
      spark.read.parquet(path), Seq("part"), touched)
    assert(plannedPartitions(scoped) == nParts / 2,
      "the over-threshold scope must still prune the file index")
    // single partition column: the IN-set is exact — no join needed
    assert(!scoped.queryExecution.executedPlan.toString.contains("Join"))
    assert(scoped.count() == nParts / 2)
    // end-to-end: the merge itself lands the same answer as ever
    DataMerge.mergeIntoParquet(spark, path, updates, Seq("k"), "part")
    val after = spark.read.parquet(path)
      .select($"k", $"v").as[(Long, Double)].collect().toMap
    assert(after == (0 until nParts)
      .map(i => i.toLong -> (if (i % 2 == 0) i * 10.0 else i * 1.0)).toMap)
    // below the threshold the literal predicate still plans (planning-
    // time directory pruning) — no join node for a 2-tuple scope
    val small = DataMerge.scopeToTuples(spark,
      spark.read.parquet(path), Seq("part"), touched.take(2))
    assert(!small.queryExecution.executedPlan.toString.contains("Join"))
    assert(small.count() == 2)
  }

  test("multi-column over-threshold scope: the per-column IN-sets " +
    "prune to the touched cross product and the broadcast semi-join " +
    "restores tuple exactness") {
    val path = tmpDir("dmergewide2") + "/t"
    // 16x16 grid of (p, q) partitions; touch the DIAGONAL (+ extras to
    // clear the threshold): 80 tuples whose cross product is 16x16
    (for { p <- 0 until 16; q <- 0 until 16 }
      yield (p.toLong * 16 + q, p, q))
      .toDF("k", "p", "q")
      .write.partitionBy("p", "q").parquet(path)
    val diag = (0 until 16).map(i => (i, i))
    val extra = for { p <- 0 until 8; q <- 8 until 16 } yield (p, q)
    val tuples = (diag ++ extra).distinct
    assert(tuples.size > DataMerge.TupleFilterMaxLiterals)
    val touched: Seq[Seq[Any]] =
      tuples.map { case (p, q) => Seq(p.toString, q.toString) }
    val scoped = DataMerge.scopeToTuples(spark,
      spark.read.parquet(path), Seq("p", "q"), touched)
    // pruning: the file index plans at most the cross product (256
    // here, all p x all q — a real merge's touched values rarely span
    // every value of every column), and the join refines to the exact
    // tuple set
    val tree = scoped.queryExecution.executedPlan.toString
    assert(tree.contains("BroadcastHashJoin") ||
      tree.contains("BroadcastNestedLoopJoin"),
      s"multi-column scope past the threshold keeps the refine join:\n$tree")
    assert(scoped.select($"p", $"q").distinct().count() == tuples.size)
    assert(scoped.count() == tuples.size.toLong)
  }

  test("property: merge equals the reference map-merge on random " +
    "targets/updates (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // rows are (key, value, partition); partition derived from key so an
    // update can never move a row across partitions (the documented
    // constraint)
    val rowsGen = Gen.listOf(for {
      k <- Gen.choose(0L, 40L)
      v <- Gen.choose(0, 1000)
    } yield (k, v.toDouble, (k % 4).toInt))
      .map(_.groupBy(_._1).map(_._2.head).toList) // unique keys
    val prop = Prop.forAll(rowsGen, rowsGen) { (target, updates) =>
      (target.nonEmpty && updates.nonEmpty) ==> {
        val path = tmpDir("dmprop") + "/t"
        target.toDF("k", "v", "part")
          .write.partitionBy("part").parquet(path)
        DataMerge.mergeIntoParquet(spark,
          path, updates.toDF("k", "v", "part"), Seq("k"), "part")
        val got = spark.read.parquet(path)
          .select($"k", $"v", $"part".cast("int"))
          .as[(Long, Double, Int)].collect().toSet
        // reference semantics: updates win by key, unmatched target rows survive
        val expected = (target.map(r => r._1 -> r).toMap ++
          updates.map(r => r._1 -> r).toMap).values.toSet
        got == expected
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("merge is idempotent under re-application of the same updates") {
    val path = tmpDir("dmerge2") + "/t"
    Seq((1L, 1.0, 1), (2L, 2.0, 1)).toDF("k", "v", "part")
      .write.partitionBy("part").parquet(path)
    val updates = Seq((2L, 22.0, 1), (9L, 9.0, 1)).toDF("k", "v", "part")
    DataMerge.mergeIntoParquet(spark, path, updates, Seq("k"), "part")
    val once = spark.read.parquet(path).as[(Long, Double, Int)].collect().toSet
    DataMerge.mergeIntoParquet(spark, path, updates, Seq("k"), "part")
    val twice = spark.read.parquet(path).as[(Long, Double, Int)].collect().toSet
    assert(once == twice)
    assert(twice == Set((1L, 1.0, 1), (2L, 22.0, 1), (9L, 9.0, 1)))
  }

  test("an update that moves a row to another partition removes the " +
    "old copy and drops an emptied partition dir") {
    val path = tmpDir("dmergemv") + "/t"
    Seq((1L, 1.0, 1), (2L, 2.0, 2)).toDF("k", "v", "part")
      .write.partitionBy("part").parquet(path)
    val moved = Seq((1L, 9.0, 9)).toDF("k", "v", "part")
    DataMerge.mergeIntoParquet(spark, path, moved, Seq("k"), "part")
    val got = spark.read.parquet(path)
      .select($"k", $"v", $"part".cast("int"))
      .as[(Long, Double, Int)].collect().toSet
    assert(got == Set((1L, 9.0, 9), (2L, 2.0, 2)), s"got $got")
    assert(!new java.io.File(s"$path/part=1").exists(),
      "emptied source partition must be dropped")
  }

  test("duplicate source keys are rejected (ANSI multiple-match error), " +
    "target untouched") {
    val path = tmpDir("dmergedup") + "/t"
    Seq((1L, 1.0, 1)).toDF("k", "v", "part")
      .write.partitionBy("part").parquet(path)
    val dupUpdates = Seq((1L, 2.0, 1), (1L, 3.0, 1)).toDF("k", "v", "part")
    val e = intercept[IllegalArgumentException] {
      DataMerge.mergeIntoParquet(spark, path, dupUpdates, Seq("k"), "part")
    }
    assert(e.getMessage.contains("duplicate key"))
    assert(spark.read.parquet(path).as[(Long, Double, Int)].collect().toSet
      == Set((1L, 1.0, 1)))
  }

  test("crash inside the stagedOverwrite commit window is repaired: a " +
    "lone hidden backup restores the table") {
    val path = tmpDir("dmergecrash") + "/t"
    Seq((1L, 1.0)).toDF("k", "v").write.parquet(path)
    // simulate a crash between the two commit renames: table moved to
    // the hidden backup, replacement never landed
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val bak = DataMerge.hiddenSibling(path, ".old")
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(bak)))

    assert(DataMerge.recoverStagedOverwrite(spark, path))
    assert(spark.read.parquet(path).as[(Long, Double)].collect().toSet
      == Set((1L, 1.0)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(bak)))
    // idempotent: nothing to repair on a healthy table
    assert(!DataMerge.recoverStagedOverwrite(spark, path))
  }

  test("staging and backup live under hidden names — never visible as " +
    "bogus '=' partitions inside a table root") {
    // leaf-dir rewrite (the Compaction/OPTIMIZE shape): path IS a
    // partition dir inside the table root
    val table = tmpDir("dmergehidden") + "/t"
    (0 until 3).foreach { i =>
      Seq((i.toLong, i.toDouble)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(s"$table/part=1")
    }
    val df = spark.read.parquet(s"$table/part=1").coalesce(1)
    DataMerge.stagedOverwrite(spark, s"$table/part=1", df, Nil)
    val visible = new java.io.File(table).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).toSet
    assert(visible == Set("part=1"))
    assert(spark.read.parquet(table).count() == 3)
  }
}
