package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The composed corpus pipeline (pipe1): stage invariants, determinism,
  * and the scale-shape guarantees the scaladoc claims — bounded
  * shuffles and no driver collect in the data path. The value-level
  * answer is oracle-checked by the driver (DuckDB mirror, including a
  * recursive-CTE components stage); this spec pins the PLAN. */
class PipelineCapstoneSpec extends SparkSpec {
  import spark.implicits._

  test("stage invariants: gates -> exact dedup -> near-dedup survivors " +
    "-> decontamination only ever SHRINK the corpus, and every stage " +
    "keeps the carried columns intact") {
    val surv = CapstoneQueries.survivorsOf(spark, sfDir)
    val clean = CapstoneQueries.decontaminatedOf(spark, sfDir)
    val nSurv = surv.count()
    val nClean = clean.count()
    assert(nSurv > 0, "the pipeline must not gate everything away")
    assert(nClean > 0 && nClean <= nSurv)
    // carried columns survive every stage boundary
    val cols = clean.columns.map(_.toLowerCase).toSet
    assert(Set("doc_id", "text", "norm", "ws_tokens").subsetOf(cols),
      s"stage boundaries must carry the working columns: $cols")
    // survivor pick kept exactly the component minima: no two
    // survivors may be the two ends of a verified near-dup edge
    assert(surv.where($"doc_id" =!= $"component").count() == 0)
  }

  test("the ledger is deterministic, covers both sides, and its " +
    "totals reconcile with the clean corpus") {
    val led1 = CapstoneQueries.ledgerOf(spark, sfDir).collect()
      .map(_.toString).sorted
    val led2 = CapstoneQueries.ledgerOf(spark, sfDir).collect()
      .map(_.toString).sorted
    assert(led1.nonEmpty)
    assert(led1.sameElements(led2), "re-running the pipeline must be " +
      "byte-deterministic — no rand(), no partition-order dependence")
    val led = CapstoneQueries.ledgerOf(spark, sfDir)
    val sides = led.select($"side").distinct().as[String].collect().toSet
    assert(sides.subsetOf(Set("train", "test")))
    val docTotal = led.agg(org.apache.spark.sql.functions.sum($"docs"))
      .as[Long].head
    assert(docTotal == CapstoneQueries.decontaminatedOf(spark, sfDir).count(),
      "every clean doc lands in exactly one (side, shard) cell")
  }

  test("the curated corpus lands in the LAKE with its full contract: " +
    "bucketed layout + NOT NULL invariant + bloom index on one table, " +
    "violating appends refused, content round-tripped") {
    import graft.operators.{Invariants, InvariantViolation, Versioned}
    val clean = CapstoneQueries.decontaminatedOf(spark, sfDir)
      .select($"doc_id", $"text", $"ws_tokens")
    val t = tmpDir("pipe-lake") + "/corpus"
    Versioned.commitBucketed(clean, t, "doc_id", 4)
    Versioned.addInvariants(spark, t, Seq(Invariants.NotNull("doc_id")))
    Versioned.declareBloomIndex(spark, t, Seq("doc_id"))
    // the three duties all ride the latest version's meta
    val meta = Versioned.readMeta(spark, t,
      Versioned.versions(spark, t).last)
    assert(meta.contains("inv") && meta.contains("bloomcols") &&
      meta.contains("bucket"),
      s"the curated table must carry its whole contract: $meta")
    // the table refuses its own corruption from now on
    intercept[InvariantViolation] {
      Versioned.commit(
        Seq((null: java.lang.Long, "x", 1L))
          .toDF("doc_id", "text", "ws_tokens"), t, "append")
    }
    // content round-trips exactly (no rows lost to the lake layer)
    val back = Versioned.read(spark, t)
    assert(back.count() == clean.count())
    val someId = clean.select($"doc_id").orderBy($"doc_id")
      .limit(1).as[Long].head
    assert(back.where($"doc_id" === someId).count() == 1)
  }

  test("scale shape: the final plan carries a BOUNDED number of " +
    "shuffles and no driver-side collect operator") {
    val led = CapstoneQueries.ledgerOf(spark, sfDir)
    led.count() // force planning through AQE
    val plan = led.queryExecution.executedPlan
    val shuffles = plan.collectWithSubqueries {
      case e: ShuffleExchangeExec => e }.size
    assert(shuffles <= 14,
      s"the composed pipeline's shuffle count must stay bounded " +
        s"(got $shuffles) — a regression here is an accidental " +
        "re-partitioning or a lost broadcast")
    val tree = plan.toString
    assert(!tree.contains("CollectLimit"),
      "no stage may funnel the corpus through the driver")
    // the decontamination semi-join must be BROADCAST (the eval gram
    // set is small by construction) — never a shuffled corpus join
    assert(tree.contains("BroadcastHashJoin") ||
      tree.contains("BroadcastNestedLoopJoin"),
      "the eval-gram semi-join must broadcast the small side")
  }
}
