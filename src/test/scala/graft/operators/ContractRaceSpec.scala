package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The contract-metadata race fixes (r9 ADVICE): a commit whose
  * inherited meta was computed against a pre-race base must re-merge
  * the landed base's CONTRACT keys inside the commit loop — an
  * interleaved ADD CONSTRAINT, CREATE BLOOMFILTER INDEX, or widening
  * append is never silently uninstalled, and rows are never committed
  * under an invariant they were not validated against. Plus: the
  * vacuum-race classifier only fires when the table actually moved,
  * and bloom lookups translate logical names to the physical space so
  * a post-declaration RENAME can never mis-aim them. */
class ContractRaceSpec extends SparkSpec {
  import Invariants.{CheckRule, NotNull}
  import spark.implicits._

  private def withWiden[A](f: => A): A = {
    spark.conf.set(SchemaEnforce.WidenConf, "true")
    try f finally spark.conf.unset(SchemaEnforce.WidenConf)
  }

  private def onceHook(f: => Unit): Unit = {
    // suites run in PARALLEL against the shared session: fire only on
    // THIS test's thread, or a concurrent suite's unrelated commit
    // consumes the one-shot interleave (and runs our payload inside
    // its own commit flow)
    val self = Thread.currentThread()
    Versioned.commitTestHook = () => if (Thread.currentThread() eq self) {
      Versioned.commitTestHook = () => () // the inner commit must not recurse
      f
    }
  }

  test("a CARRIER-LESS append racing a widening append re-carries the " +
    "landed schema carrier — the latest version stays readable wide") {
    val t = tmpDir("ctr-carrier") + "/t"
    Versioned.commit((1 to 5).map(i => (i, i * 1.0f)).toDF("k", "v")
      .coalesce(1), t)
    // hook: between OUR (carrier-less) append's enforcement and its
    // commit, a WIDENING append lands a fresh carrier (k -> bigint);
    // pre-fix, our append's meta (computed pre-race, no carrier key)
    // dropped that carrier from the newest version and sent reads
    // back to the mergeSchema union — which throws on int-vs-long
    onceHook(withWiden {
      Versioned.commit(Seq((100L, 2.0f)).toDF("k", "v").coalesce(1),
        t, "append")
      ()
    })
    try Versioned.commit(Seq((6, 3.0f)).toDF("k", "v").coalesce(1),
      t, "append")
    finally Versioned.commitTestHook = () => ()
    val carrier = Versioned.schemaCarrier(spark, t)
    assert(carrier.isDefined,
      "the interleaved widening's carrier must survive the race")
    val out = Versioned.read(spark, t)
    assert(out.schema("k").dataType == LongType)
    assert(out.count() == 7)
  }

  test("an append racing ADD CONSTRAINT: clean rows land WITH the new " +
    "constraint carried; violating rows refuse — never committed " +
    "under a rule they were not validated against") {
    val t = tmpDir("ctr-inv") + "/t"
    Versioned.commit((1 to 5).map(i => (i.toLong, i * 10L))
      .toDF("k", "cents").coalesce(1), t)
    // clean interleave: the constraint must survive our append
    onceHook {
      Versioned.addInvariants(spark, t,
        Seq(CheckRule("cents_pos", "cents >= 0")))
      ()
    }
    try Versioned.commit(Seq((6L, 60L)).toDF("k", "cents"), t, "append")
    finally Versioned.commitTestHook = () => ()
    assert(Versioned.invariants(spark, t).map(_.name) == Seq("cents_pos"),
      "the interleaved ADD CONSTRAINT must not be uninstalled")
    assert(Versioned.read(spark, t).count() == 6)
    // violating interleave: rows valid under the OLD rules but not the
    // landed ones must refuse (re-validated against the merged set)
    val t2 = tmpDir("ctr-inv2") + "/t"
    Versioned.commit((1 to 5).map(i => (i.toLong, i * 10L))
      .toDF("k", "cents").coalesce(1), t2)
    onceHook {
      Versioned.addInvariants(spark, t2, Seq(NotNull("k")))
      ()
    }
    val vsBefore = try intercept[InvariantViolation] {
      Versioned.commit(Seq((null: java.lang.Long, 7L)).toDF("k", "cents"),
        t2, "append")
    } finally Versioned.commitTestHook = () => ()
    assert(vsBefore.getMessage.contains("not_null(k)"))
    assert(Versioned.read(spark, t2).where($"k".isNull).count() == 0,
      "the clean table must never transition to dirty through the race")
    assert(Versioned.invariants(spark, t2).map(_.name) == Seq("not_null(k)"))
  }

  test("an append racing CREATE BLOOMFILTER INDEX keeps the landed " +
    "declaration and the backfilled refs") {
    val t = tmpDir("ctr-bloom") + "/t"
    Versioned.commit((1 to 50).map(i => (i.toLong, s"id-$i"))
      .toDF("k", "doc").coalesce(1), t)
    onceHook {
      Versioned.declareBloomIndex(spark, t, Seq("doc"))
      ()
    }
    try Versioned.commit((51 to 60).map(i => (i.toLong, s"id-$i"))
      .toDF("k", "doc").coalesce(1), t, "append")
    finally Versioned.commitTestHook = () => ()
    val meta = Versioned.readMeta(spark, t,
      Versioned.versions(spark, t).last)
    assert(meta.contains("bloomcols"),
      "the interleaved bloom declaration must not be uninstalled")
    assert(Versioned.bloomRefs(spark, t).nonEmpty,
      "the backfilled per-line refs must ride through the race")
  }

  test("an append racing a RENAME inherits the landed mapping — the " +
    "renamed logical schema survives with every row under it") {
    val t = tmpDir("ctr-map") + "/t"
    Versioned.commit((1 to 5).map(i => (i.toLong, s"d$i"))
      .toDF("k", "doc").coalesce(1), t)
    // hook: between OUR append's mapping/meta snapshot (taken at
    // baseV) and its commit, a RENAME lands a fresh column mapping;
    // the commit-loop contract merge keys inherited-vs-explicit on
    // baseV's values, so the landed mapping must win — pre-fix, a
    // mapping read from "latest" in a slightly different window could
    // re-commit the pre-rename mapping and undo the DDL
    onceHook {
      Versioned.renameColumn(spark, t, "doc", "body")
      ()
    }
    try Versioned.commit(Seq((6L, "d6")).toDF("k", "doc"), t, "append")
    finally Versioned.commitTestHook = () => ()
    val out = Versioned.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("k", "body"),
      "the interleaved rename's mapping must not be uninstalled")
    assert(out.count() == 6)
    // the appended row wrote the PHYSICAL name (doc), so it surfaces
    // under the renamed logical slot like every pre-rename row
    assert(out.where($"body" === "d6").count() == 1)
  }

  test("a COMPOUND interleave (bloom declare + ADD CONSTRAINT) survives " +
    "the invariant re-validation retry — the retry re-merges EVERY " +
    "contract key, not just the one that forced it") {
    val t = tmpDir("ctr-compound") + "/t"
    Versioned.commit((1 to 50).map(i => (i.toLong, s"id-$i"))
      .toDF("k", "doc").coalesce(1), t)
    // hook: between OUR append's validation and its commit, TWO
    // contract changes land — a bloom declaration and a constraint.
    // The constraint forces the InvariantsChanged handshake; pre-fix,
    // the retry advanced its contract base past BOTH interleaves and
    // skipped the re-merge, so the bloom declaration (absent from the
    // append's pre-race meta) was silently uninstalled
    onceHook {
      Versioned.declareBloomIndex(spark, t, Seq("doc"))
      Versioned.addInvariants(spark, t,
        Seq(CheckRule("k_pos", "k >= 0")))
      ()
    }
    try Versioned.commit(Seq((51L, "id-51")).toDF("k", "doc")
      .coalesce(1), t, "append")
    finally Versioned.commitTestHook = () => ()
    val meta = Versioned.readMeta(spark, t,
      Versioned.versions(spark, t).last)
    assert(meta.contains("bloomcols"),
      "the bloom declaration must ride through the invariant retry")
    assert(Versioned.invariants(spark, t).map(_.name) == Seq("k_pos"))
    assert(Versioned.read(spark, t).count() == 51)
  }

  test("a constraint DROPPED between the invariant handshake and the " +
    "commit retry STAYS dropped — the validated rule set is never " +
    "replayed as this commit's own declaration") {
    val t = tmpDir("ctr-resurrect") + "/t"
    Versioned.commit((1 to 5).map(i => (i.toLong, i * 10L))
      .toDF("k", "cents").coalesce(1), t)
    // phase 1 (commit's pre-attempt window): ADD CONSTRAINT lands, so
    // attempt 1 throws the InvariantsChanged handshake and re-validates
    // the staged rows against it. phase 3 (the re-validation -> retry
    // window): DROP CONSTRAINT lands. The retry's merge must treat the
    // validated rule as mere CARRY — folding it into the commit's meta
    // would make it explicit intent and resurrect the dropped rule.
    // (phases 2 and 4 are the DDLs' own metadata-commit hook firings)
    var phase = 0
    // thread-guarded like onceHook: a concurrent suite's commit must
    // not advance the phase counter (the DDLs' own same-thread inner
    // firings are phases 2 and 4 by design and still count)
    val self = Thread.currentThread()
    Versioned.commitTestHook = () => if (Thread.currentThread() eq self) {
      phase += 1
      if (phase == 1)
        Versioned.addInvariants(spark, t,
          Seq(CheckRule("cents_pos", "cents >= 0")))
      else if (phase == 3)
        Versioned.dropInvariant(spark, t, "cents_pos")
      ()
    }
    try Versioned.commit(Seq((6L, 60L)).toDF("k", "cents"), t, "append")
    finally Versioned.commitTestHook = () => ()
    assert(phase >= 3, s"the race never exercised the retry (phase=$phase)")
    assert(Versioned.invariants(spark, t).isEmpty,
      "the interleaved DROP CONSTRAINT must win over the carried " +
        "validation set")
    assert(Versioned.read(spark, t).count() == 6)
  }

  test("two interleaved column renames BOTH land: the loser " +
    "revalidates against the winner's version and retries, never " +
    "reverting it") {
    val t = tmpDir("ctr-2ren") + "/t"
    Versioned.commit((1 to 5).map(i => (i.toLong, s"a$i", s"b$i"))
      .toDF("k", "a", "b").coalesce(1), t)
    // hook fires inside OUR rename's commit window (after its checks,
    // before its manifest lands): the interleaved rename wins the
    // version; pre-fix, our rename's mapping — built before the race —
    // lacked the winner's entry and the commit-wins merge fallback
    // quietly reverted column a back from x
    onceHook {
      Versioned.renameColumn(spark, t, "a", "x")
      ()
    }
    try Versioned.renameColumn(spark, t, "b", "y")
    finally Versioned.commitTestHook = () => ()
    val out = Versioned.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("k", "x", "y"),
      "both racing renames must survive")
    assert(out.where($"x" === "a3" && $"y" === "b3").count() == 1)
  }

  test("a FileNotFound with the attempt's base still latest is a " +
    "GENUINE fault — surfaced, not retried as a vacuum race") {
    val t = tmpDir("ctr-fnf") + "/t"
    Versioned.commit((1 to 10).map(i => (i.toLong, i * 2L))
      .toDF("k", "v").repartition(2), t)
    val victim = Versioned.versionFiles(spark, t).head
    val p = new org.apache.hadoop.fs.Path(victim)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, false)
    val e = intercept[Throwable] {
      Versioned.rewrite(spark, t, _ => true, $"k" > 0L,
        df => df.withColumn("v", $"v" + 1L),
        Map("operation" -> "update"))
    }
    assert(!e.getMessage.contains("kept racing a concurrent VACUUM"),
      s"a genuine missing file must not be masked as a race: $e")
  }

  test("bloom lookups are keyed by PHYSICAL column name: a rename plus " +
    "name reuse can never aim a lookup at another column's blooms") {
    val t = tmpDir("ctr-rename") + "/t"
    Versioned.commit((1 to 40).map(i => (s"a$i", s"c$i"))
      .toDF("a", "c").coalesce(1), t)
    Versioned.declareBloomIndex(spark, t, Seq("a"))
    Versioned.renameColumn(spark, t, "a", "x")
    Versioned.renameColumn(spark, t, "c", "a")
    // logical `a` is now backed by physical `c`: the lookup must NOT
    // probe old-a's blooms (where "c3" is absent -> wrongly pruned);
    // it finds no sidecar entry for physical c and keeps the file
    val pruner = Versioned.bloomLinePruner(spark, t,
      Seq(org.apache.spark.sql.sources.EqualTo("a", "c3")))
    val deleted = Versioned.deleteWithDv(spark, t, _ => true,
      $"a" === "c3", pruner)
    assert(deleted == 1L,
      "the DELETE must reach the row — pre-fix the mis-aimed bloom " +
        "probe skipped the file")
    // and a lookup on the RENAMED column still reaches its own blooms
    // through the physical slot: x (physical a) contains a7, so the
    // lookup keeps the file and the delete lands (row 3 is already
    // gone — rows carry (a_i, c_i) pairs, so pick a different i)
    val pruner2 = Versioned.bloomLinePruner(spark, t,
      Seq(org.apache.spark.sql.sources.EqualTo("x", "a7")))
    val deleted2 = Versioned.deleteWithDv(spark, t, _ => true,
      $"x" === "a7", pruner2)
    assert(deleted2 == 1L)
    assert(Versioned.read(spark, t).count() == 38)
  }
}
