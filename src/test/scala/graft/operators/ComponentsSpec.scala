package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Both physical paths must agree everywhere: the single-task
    * union-find (the default at test sizes) and the star-contraction
    * loop (forced via the singleTaskMaxEdges=-1 test seam — the
    * 100-TB path must not lose coverage to the fast path; -1 rather
    * than 0 so an EMPTY canonical edge set also takes the loop here,
    * 0 <= 0 would silently compare fast-path vs fast-path).
    *
    * History: r14 saw a transient Spark-internal
    * `NoSuchElementException: key not found` under full-suite parallel
    * load and rode it out with a bounded, stack-filtered retry here.
    * The retry never fired again across 38+ consecutive full-suite
    * runs (PERFORMANCE.md soak ledger), meeting its own removal
    * criterion — it is gone (r15 verdict #2), so any recurrence now
    * fails loudly with its full stack instead of hiding behind dead
    * hardening. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val fast = Components.connectedComponents(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    val loop = Components.connectedComponents(edges.toDF("s", "d"), "s", "d",
        singleTaskMaxEdges = -1L)
      .as[(Long, Long)].collect().toMap
    assert(fast == loop,
      s"single-task and star-contraction paths diverge: $fast vs $loop")
    fast
  }

  /** Driver-side union-find ground truth (path compression, min root). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain converges to one component rooted at the minimum") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("disjoint stars + self-loops keep separate minima") {
    val edges = Seq((5L, 1L), (6L, 1L), (7L, 1L), // star at 1
      (20L, 30L), (30L, 40L), // path at 20
      (9L, 9L)) // self-loop: ignored entirely
    val got = run(edges)
    assert(got == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L,
      20L -> 20L, 30L -> 20L, 40L -> 20L))
  }

  test("extreme ids: full long domain incl. the MinValue sentinel") {
    // Long.MinValue is the primitive parent map's empty-slot sentinel
    // (carried out-of-band); MaxValue probes mixing/overflow edges.
    val edges = Seq((Long.MinValue, -7L), (Long.MaxValue, -7L),
      (0L, 1L))
    val got = run(edges)
    assert(got == Map(Long.MinValue -> Long.MinValue,
      -7L -> Long.MinValue, Long.MaxValue -> Long.MinValue,
      0L -> 0L, 1L -> 0L))
  }

  test("assign labels isolated nodes as singletons") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 3L)).toDF("s", "d")
    val got = Components.assign(nodes, "id", edges, "s", "d")
      .select($"id", $"component").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L))
  }

  // Flake post-mortem (r10, one failure under full-suite contention):
  // each of the ~15 generated graphs ran TWO driver actions per
  // components round (eager checkpoint + fixpoint probe) against a
  // shared session under concurrent suites — the widest exposure to
  // scheduler/block-manager contention in the whole suite. The loop
  // now runs ONE action per round (lazy localCheckpoint materialized
  // by the probe), halving that surface; localCheckpoint blocks store
  // MEMORY_AND_DISK (deserialized), so memory pressure spills rather
  // than drops them. Verified green across 3 consecutive full-suite
  // runs after the change (r11).
  //
  // r14 recurrence (2 of ~25 instrumented runs): the property threw
  // `java.util.NoSuchElementException: key not found: <small int>`
  // PERSISTENTLY across 21 shrink evaluations (~30 s) and then
  // cleared — not reproducible from the shrunk edge list in
  // isolation, and the driver-side union-find model provably contains
  // every endpoint, so the throw is a Spark-internal driver map
  // (session-unique small-int key ⇒ a shuffle/RDD/stage id) under
  // cross-suite concurrency, not a Components defect. The PropException
  // one-liner swallowed the stack; the handler below now prints the
  // FULL trace on any recurrence so the failing frame is finally
  // attributable. 18 consecutive loaded 5-suite runs green since.
  test("property: matches union-find on random graphs (ScalaCheck)") {
    val edgeGen = for {
      a <- Gen.choose(0L, 60L); b <- Gen.choose(0L, 60L)
    } yield (a, b)
    val graphGen = Gen.nonEmptyListOf(edgeGen)
    val prop = Prop.forAll(graphGen) { edges =>
      // spark result covers exactly the nodes on a non-self-loop edge
      val uf = unionFind(edges)
      val nodes = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1, e._2)).toSet
      run(edges) == nodes.map(n => n -> uf(n)).toMap
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    // a property failure that carries an exception (e.g. a Spark
    // internal thrown mid-job) must surface the FULL stack — the
    // one-line status ("key not found: 28") is undiagnosable
    res.status match {
      case org.scalacheck.Test.PropException(_, e, _) =>
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        fail(s"property threw: $sw")
      case _ => ()
    }
    assert(res.passed, res.status.toString)
  }
}
