package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step a
  * dedup pipeline needs AFTER pair generation: MinHash/LSH emits
  * near-duplicate PAIRS ([[Dedup.lshCandidatePairs]]), but survivor
  * selection must be transitive (a~b, b~c ⇒ keep one of {a,b,c}), i.e.
  * per-component, not per-pair.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard shuffle-bounded formulation:
  *
  *  - large-star: every node points its LARGER neighbors at the
  *    minimum of its neighborhood (incl. itself);
  *  - small-star: every node points its smaller neighbors AND itself
  *    at the minimum of its smaller neighborhood.
  *
  * Each round is two hash shuffles (a groupBy-min and a join on the
  * same key — same partitioning, so AQE/exchange reuse keeps it
  * cheap), and the edge set contracts toward stars rooted at each
  * component's minimum id in O(log n) rounds — chains, the worst case
  * for naive min-propagation (O(diameter) rounds), converge
  * logarithmically here. No step ever materializes anything larger
  * than the current edge set, so the shape survives a 100 TB corpus
  * where components are duplicate clusters (small, numerous).
  *
  * Lineage is truncated per round with a LAZY localCheckpoint.
  * Truncation is not optional: each round references its input 4-6
  * times (both stars fan the frame into a groupBy AND a join), so an
  * un-truncated logical plan grows MULTIPLICATIVELY — ~12^rounds tree
  * nodes, an OOM in plan stringification alone by round 5 (measured;
  * a lazy `persist` does NOT help, caching substitutes at physical
  * planning but keeps the whole logical tree). Lazy rather than eager
  * because every round immediately runs the fixpoint probe anyway:
  * the probe's single action materializes the checkpoint AND reads
  * the signature, halving the per-round job count — on small graphs
  * (the dominant dedup shape: duplicate clusters are tiny, pair sets
  * thousands of rows) the per-job fixed cost WAS the round's cost.
  * On a real cluster with an HDFS checkpoint dir configured, swap for
  * `checkpoint`; semantics identical.
  */
object Components {

  /** Edge-count bound for the single-task solve: 4M canonical pairs
    * union-find in one executor task in milliseconds, versus ~5
    * star-contraction rounds of multi-stage jobs whose FIXED cost
    * dominates at that size (measured: 296 edges cost 2.2 s through
    * the loop, <0.2 s here). Honest memory budget at the bound: ≤8M
    * distinct nodes → ≤8M entries in the primitive parent map
    * ([[LongLongMap]], two long arrays at load ≤1/2) ≈ 256 MB peak in
    * the one task — sized to fit a 4 GB-per-task executor with
    * headroom, NOT the "~64 MB of raw pairs" (which is only the input
    * size). Duplicate clusters — the dedup workload — are small and
    * numerous, so this is the overwhelmingly common case even at
    * 100 TB; an edge set past the bound (a pathological near-dup
    * blowup) takes the shuffle-bounded O(log n) loop unchanged. */
  private[operators] val SingleTaskMaxEdges = 4000000L

  /** (id, component) for every node appearing in `edges`; component =
    * the minimum node id reachable. Self-loops are ignored.
    * `singleTaskMaxEdges` is a test seam: pass -1 to force the loop
    * path (0 would still send an EMPTY canonical edge set down the
    * single-task path, since 0 <= 0). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30,
      singleTaskMaxEdges: Long = SingleTaskMaxEdges): DataFrame = {
    // canonical undirected pairs: a = larger endpoint, b = smaller
    var e = edges
      .select(col(srcCol).cast("long").as("x"), col(dstCol).cast("long").as("y"))
      .where(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("a"),
        least(col("x"), col("y")).as("b"))
      .distinct()
      // lazy: the pre-loop signature probe right below materializes
      // it — cutting the (possibly expensive) upstream plan in the
      // same job instead of a separate eager one
      .localCheckpoint(false)

    var converged = false
    var iter = 0
    var sig = signature(e) // materializes the checkpoint; also the size probe
    if (sig._1 <= singleTaskMaxEdges) return singleTaskComponents(e)
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = signature(next) // the ONE action: materializes the
      converged = nextSig == sig    // checkpoint and probes the fixpoint
      e.unpersist()
      e = next
      sig = nextSig
      iter += 1
    }
    require(converged, s"connectedComponents: no fixpoint in $maxIter rounds")

    // fixpoint edges are stars (node -> component min); roots label themselves
    e.select(col("a").as("id"), col("b").as("component"))
      .union(e.select(col("b").as("id"), col("b").as("component")))
      .distinct()
  }

  /** Minimal primitive open-addressed long→long hash map (linear
    * probing, power-of-two capacity, max load 1/2, Long.MinValue as
    * the empty-slot sentinel with that one key carried out-of-band so
    * the full long domain is usable). Exists because
    * [[singleTaskComponents]] holds the WHOLE parent map in one task:
    * a boxed `java.util.HashMap[Long, Long]` costs ~48 bytes of entry
    * object + two Long boxes per mapping — near the
    * [[SingleTaskMaxEdges]] bound (≤8M nodes) that is 400 MB–1 GB in
    * a single task, the exact OOM the bound exists to avoid. Two bare
    * long arrays cap the same map at ~256 MB. */
  private final class LongLongMap(initialCapacityPow2: Int,
      decreasingValues: Boolean = false) {
    private[this] final val Empty = Long.MinValue
    private[this] var cap = java.lang.Integer.highestOneBit(
      math.max(16, initialCapacityPow2))
    private[this] var ks = new Array[Long](cap)
    private[this] var vs = new Array[Long](cap)
    private[this] var n = 0
    private[this] var hasMinKey = false
    private[this] var minKeyVal = 0L
    java.util.Arrays.fill(ks, Empty)

    private def slot(k: Long): Int = {
      // Fibonacci-ish multiplicative mix, then linear probe
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      var i = h.toInt & (cap - 1)
      while (ks(i) != Empty && ks(i) != k) i = (i + 1) & (cap - 1)
      i
    }
    private def grow(): Unit = {
      val ok = ks; val ov = vs
      cap <<= 1
      ks = new Array[Long](cap); vs = new Array[Long](cap)
      java.util.Arrays.fill(ks, Empty)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != Empty) { val s = slot(ok(i)); ks(s) = ok(i); vs(s) = ov(i) }
        i += 1
      }
    }
    def getOrElse(k: Long, dflt: Long): Long =
      if (k == Empty) { if (hasMinKey) minKeyVal else dflt }
      else { val i = slot(k); if (ks(i) == Empty) dflt else vs(i) }
    def put(k: Long, v: Long): Unit =
      if (k == Empty) { hasMinKey = true; minKeyVal = v }
      else {
        // keysIterator's no-insert-during-iteration safety rests on the
        // union-by-min invariant (every stored value < its key, so
        // find() during the sweep only UPDATES existing keys) — a put
        // violating it must fail loudly here, not corrupt the sweep
        // after a grow() (r14 ADVICE). Instances used as plain maps/
        // sets (the roots set stores k -> k) opt out at construction.
        require(!decreasingValues || v < k,
          s"union-by-min invariant violated: put($k, $v) with value " +
            ">= key would make a key a root and break keysIterator")
        val i = slot(k)
        if (ks(i) == Empty) {
          ks(i) = k; vs(i) = v; n += 1
          if ((n << 1) > cap) grow()
        } else vs(i) = v
      }
    /** Walks the backing array; safe against concurrent value UPDATES
      * (entries never relocate without an insert) but not inserts. */
    def keysIterator: Iterator[Long] = {
      val snapshot = ks // growth during iteration would swap arrays
      (if (hasMinKey) Iterator.single(Empty) else Iterator.empty) ++
        snapshot.iterator.filter(_ != Empty)
    }
  }

  /** Union-find over a checkpointed canonical pair set small enough
    * for one executor task (path-halving, union-by-min so the root IS
    * the component's minimum id). `mapPartitions` on the single
    * coalesced partition — executor-side, never a driver collect; the
    * caller guarantees the size bound, and the parent map is a
    * primitive [[LongLongMap]] so the near-bound footprint is ~256 MB,
    * not the ~1 GB a boxed map would cost. Emits (id, component) for
    * every node, roots included, matching the loop's output. */
  private def singleTaskComponents(canon: DataFrame): DataFrame = {
    val spark = canon.sparkSession
    import spark.implicits._
    canon.select(col("a"), col("b")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = new LongLongMap(1 << 16, decreasingValues = true)
        def find(x: Long): Long = {
          var r = x
          var p = parent.getOrElse(r, r)
          while (p != r) { // path halving
            val gp = parent.getOrElse(p, p)
            parent.put(r, gp); r = gp; p = parent.getOrElse(r, r)
          }
          r
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        // Union-by-min means every stored value is strictly smaller
        // than its key, so no key is ever a root and compression via
        // find() only UPDATES existing keys (never inserts — the map
        // cannot grow mid-iteration). Roots therefore never appear as
        // keys; collect them during the keyed sweep and emit (r, r)
        // afterwards so every node of the edge set is labeled.
        // (Iterator.++ is lazy in its argument: the root sweep is
        // built only after the keyed sweep has drained and populated
        // `roots`.)
        val roots = new LongLongMap(1 << 10) // used as a set
        parent.keysIterator.map { k =>
          val r = find(k); roots.put(r, r); (k, r)
        } ++ roots.keysIterator.map(r => (r, r))
      }.toDF("id", "component")
  }

  /** `nodes` with a `component` column; isolated nodes (no edge) are
    * their own singleton component. */
  def assign(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 30,
      singleTaskMaxEdges: Long = SingleTaskMaxEdges): DataFrame =
    assignLabels(nodes, idCol,
      connectedComponents(edges, srcCol, dstCol, maxIter,
        singleTaskMaxEdges))

  /** The label-join half of [[assign]], for callers that want to
    * materialize the (small — edge-set members only) label frame once
    * and fan it into several consumers: `labels` is (id, component)
    * as produced by [[connectedComponents]]. */
  def assignLabels(nodes: DataFrame, idCol: String,
      labels: DataFrame): DataFrame = {
    val l = labels.withColumnRenamed("id", "__cc_id")
    nodes.join(l, nodes(idCol).cast("long") === col("__cc_id"), "left")
      .withColumn("component",
        coalesce(col("component"), nodes(idCol).cast("long")))
      .drop("__cc_id")
  }

  /** Large-star over canonical pairs (a > b): for each node u, connect
    * every strictly-larger neighbor to min(Γ(u) ∪ {u}). Output keeps
    * the a > b invariant (emitted pairs are (v, m) with m < u < v). */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val d = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val m = d.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    d.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .distinct()
  }

  /** Small-star over canonical pairs (a > b, i.e. edges pointing at the
    * smaller endpoint): for each node u, connect its smaller neighbors
    * and u itself to the minimum of those neighbors. */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("a").agg(min(col("b")).as("mn"))
    val moved = e.join(m, "a")
      .where(col("b") =!= col("mn"))
      .select(col("b").as("a"), col("mn").as("b"))
    moved.union(m.select(col("a"), col("mn").as("b")))
      .where(col("a") =!= col("b"))
      .distinct()
  }

  /** Cheap fixpoint detector: (row count, order-independent hash).
    * bit_xor over the distinct pair set — no overflow under ANSI, and
    * xor-cancellation needs two IDENTICAL rows, which distinct rules
    * out. Only ever compared for equality with the previous round. */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }
}
