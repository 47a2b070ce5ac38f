package graft.queries
import graft.SparkSpec

/** Stage-cost attribution for pipe1 at sf0.1 (the ≤4 s trim work,
  * r11-r13). Not an assertion-bearing spec — it prints a STAGE table
  * so a regression in any one stage is attributable from the suite
  * log. Steady-state shares measured r13 (mild-throttle window):
  * exact+sig ckpt ~1.1 s, banding+candidates ~0.9 s, components
  * ~0.3 s (single-task union-find), decontamination ~1.4 s, packing +
  * ledger agg ~0.8 s. */
class Pipe1StageProfileSpec extends SparkSpec {
  test("profile pipe1 stages at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"STAGE $tag%-22s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    graft.Tables(spark, dir, "documents").count() // warm scan
    time("ledger-warmup")(CapstoneQueries.ledgerOf(spark, dir).collect())
    time("gate")(CapstoneQueries.gate(
      graft.Tables(spark, dir, "documents")).count())
    time("survivors")(CapstoneQueries.survivorsOf(spark, dir).count())
    time("ledger-steady")(CapstoneQueries.ledgerOf(spark, dir).collect())
  }
}
