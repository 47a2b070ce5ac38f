package graft.operators

import graft.functions.PqExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRUE product quantization ([EXT]; public algorithm — Jégou, Douze,
  * Schmid, PAMI 2011): per-subspace codebooks + one byte per
  * subvector, the 8–32× compression tier above the int8 scalar scheme
  * (`Similarity`'s `ivf_pq` family, fixed 4×). This object owns the
  * TRAINING and ENCODING halves — deterministic k-means per subspace,
  * the canonical sidecar codec, and the Column-level encode/score
  * helpers; the persisted-index integration (descriptor, commits,
  * probes) lives in [[Similarity]] next to its scalar sibling.
  *
  * Training is distributed and driver-bounded exactly like
  * [[Similarity.buildCodebook]]: seeds come from the lowest-id `k`
  * vectors (stable identity across runs/executors), each Lloyd
  * iteration is ONE scan (the codegen'd [[PqExpressions.PqEncode]]
  * argmin pass) plus a shuffle of at most numSub·k·subDim
  * partially-aggregated keys, and the driver only ever holds the
  * codebooks (≤ 256·dim doubles). Empty cells keep their seed
  * centroid, the float IVF convention.
  */
object ProductQuant {

  /** The trained per-subspace codebooks: `numSub` subspaces of
    * `subDim` dims, `k ≤ 256` centroids each, flattened as
    * `flat[(s*k + c)*subDim + d]` (the shape the native expressions
    * embed as a codegen reference object). */
  final case class PqCodebooks(numSub: Int, subDim: Int, k: Int,
      flat: Array[Double]) {
    PqExpressions.requireShape(numSub, k, subDim, flat)
    def dim: Int = numSub * subDim
    /** ‖centroid(s,c)‖² per (s,c) — precomputed once per probe/score
      * so ‖v̂‖² is numSub adds per candidate. */
    lazy val sqNorms: Array[Double] = {
      val out = new Array[Double](numSub * k)
      var i = 0
      while (i < out.length) {
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val x = flat(i * subDim + d); d2 += x * x; d += 1
        }
        out(i) = d2
        i += 1
      }
      out
    }
  }

  /** Train PQ codebooks over `df`'s embedding column. `k` caps at the
    * distinct seed supply (a corpus smaller than `k` trains a smaller
    * codebook — codes stay dense in [0, k')); `iters` Lloyd
    * refinements move each subspace's centroids to the per-cell mean.
    * `dim % numSub == 0` is required — PQ splits contiguously.
    *
    * `sampleLimit` bounds the TRAINING SET, not the encodable corpus:
    * each Lloyd iteration scans only the lowest-`sampleLimit`-id
    * vectors (deterministic — same discipline as the seeds, so two
    * trainers converge on identical books), which is the standard
    * large-corpus practice (a 256-centroid 4-dim subspace is fully
    * determined by a few hundred thousand points; the public ANN
    * libraries train on samples for exactly this reason). At 2M
    * vectors the full-scan train measured ~7 min/2 iters — linear in
    * the corpus and all of it spent refining centroids that stopped
    * moving; the default cap keeps training corpus-size-independent.
    * Corpora at or below the cap are unaffected (the limit is a
    * no-op). Pass `Int.MaxValue` to train on everything. */
  def train(df: DataFrame, embedding: String, id: String, numSub: Int,
      k: Int = 256, iters: Int = 2,
      sampleLimit: Int = 1 << 18): PqCodebooks = {
    require(numSub > 0, s"numSub must be positive, got $numSub")
    require(k > 0 && k <= 256, s"k=$k must fit one unsigned byte")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(sampleLimit >= k,
      s"sampleLimit=$sampleLimit must cover at least k=$k seeds")
    // Count-gate the sampling machinery (optimization r20, guide §1.2
    // step 1 / §2.4): when the corpus is AT OR UNDER the cap the
    // lowest-`sampleLimit`-id sample IS the whole corpus, so the
    // orderBy+limit (a full sort collapsing into one partition at this
    // limit), the re-spread repartition and the eager checkpoint are
    // three jobs that compute an identity — skip them and train
    // straight over the filtered scan (each Lloyd iteration re-reads
    // the source, which is exactly one scan per iteration either way).
    // One cheap count decides; above the cap the sampled path is
    // unchanged.
    val base = df.where(col(embedding).isNotNull)
    val sampled = base.count() > sampleLimit
    // the deterministic training sample; re-spread after the limit's
    // single-partition collapse so the per-iteration encode scan stays
    // parallel (16.7M exploded cells at the default cap)
    val sample =
      if (!sampled) base
      else base.orderBy(col(id).asc).limit(sampleLimit)
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint(true)
    // deterministic seeds: the lowest-id k vectors, one collect of at
    // most k rows (buildCodebook's identity discipline)
    val seeds = sample
      .orderBy(col(id).asc).limit(k)
      .select(col(embedding)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(seeds.nonEmpty, "cannot train PQ codebooks on an empty frame")
    val dim = seeds.head.length
    require(dim % numSub == 0,
      s"dim $dim is not divisible by numSub=$numSub — PQ splits the " +
        "vector into equal contiguous subvectors")
    val subDim = dim / numSub
    val k0 = seeds.length // k' ≤ k when the corpus is small
    var flat = new Array[Double](numSub * k0 * subDim)
    for (s <- 0 until numSub; c <- 0 until k0; d <- 0 until subDim)
      flat((s * k0 + c) * subDim + d) = seeds(c)(s * subDim + d)
    var it = 0
    while (it < iters) {
      // ONE scan, ONE fused aggregate (optimization r19 — see
      // [[PqExpressions.PqTrainStep]]): the argmin encode and the
      // per-cell sum/count accumulation run in a single
      // fixed-size-buffer pass — no per-row code materialization, no
      // dim× posexplode (64× row volume at dim 64), no grouped
      // shuffle; the collect is ONE row of numSub·k'·(subDim+1)
      // values — codebook-sized, never data-sized. Identical
      // arithmetic: same argmin, same float→double casts, per-cell
      // mean = sum/count exactly as the grouped avg computed it.
      val st = sample
        .agg(PqExpressions.pqTrainStep(col(embedding), numSub, k0,
          subDim, flat).as("st"))
        .head().getStruct(0)
      val sums = st.getSeq[Double](0)
      val counts = st.getSeq[Long](1)
      val next = flat.clone() // empty cells keep their previous centroid
      var cell = 0
      while (cell < counts.length) {
        if (counts(cell) > 0) {
          var d = 0
          while (d < subDim) {
            next(cell * subDim + d) =
              sums(cell * subDim + d) / counts(cell)
            d += 1
          }
        }
        cell += 1
      }
      flat = next
      it += 1
    }
    // free the training sample's checkpointed blocks deterministically
    // (the batch probe's r18 discipline — a long-lived driver training
    // per drift fire would otherwise accumulate them until GC); the
    // under-cap path checkpointed nothing (freeLocalCheckpoint is a
    // no-op on a non-checkpoint plan, but skip the analysis walk too)
    if (sampled)
      org.apache.spark.sql.GraftShims.freeLocalCheckpoint(sample)
    PqCodebooks(numSub, subDim, k0, flat)
  }

  /** Storage-form encode column: numSub raw bytes (BinaryType), null
    * for a null or ZERO-NORM vector — a zero vector's reconstruction
    * would be the nearest-to-origin centroids, which could RANK, where
    * the whole similarity family's convention is that a zero-norm row
    * ranks nothing (the float path's null cosine, the int8 path's
    * null codes). */
  def encodeCol(embedding: Column, cb: PqCodebooks): Column =
    when(array_max(transform(embedding, x => abs(x.cast("double")))) > 0,
      PqExpressions.pqEncode(embedding, cb.numSub, cb.k, cb.subDim,
        cb.flat))

  /** Asymmetric approximate cosine against a per-row query column
    * (the batch probe's scorer). */
  def approxCol(codes: Column, query: Column, cb: PqCodebooks): Column =
    PqExpressions.pqApproxCosine(codes, query, cb.numSub, cb.k,
      cb.subDim, cb.flat, cb.sqNorms)

  /** ADC approximate cosine against a single query literal: the
    * per-query dot LUT (numSub·k doubles) is computed HERE, once,
    * driver-side; each candidate then costs numSub table adds. */
  def adcCol(codes: Column, query: Array[Float], cb: PqCodebooks): Column = {
    require(query.length == cb.dim,
      s"query embedding dim ${query.length} does not match the " +
        s"codebooks' ${cb.dim} — the wrong distances would be ranked")
    var nq = 0.0
    query.foreach(x => nq += x.toDouble * x.toDouble)
    require(nq > 0.0, "zero-norm query ranks nothing")
    val lut = new Array[Double](cb.numSub * cb.k)
    var s = 0
    while (s < cb.numSub) {
      var c = 0
      while (c < cb.k) {
        val base = (s * cb.k + c) * cb.subDim
        var dot = 0.0
        var d = 0
        while (d < cb.subDim) {
          dot += query(s * cb.subDim + d).toDouble * cb.flat(base + d)
          d += 1
        }
        lut(s * cb.k + c) = dot
        c += 1
      }
      s += 1
    }
    PqExpressions.pqAdc(codes, cb.numSub, cb.k, lut, cb.sqNorms,
      math.sqrt(nq))
  }

  /** Canonical text form (the IVF codebook sidecar's discipline —
    * `java.lang.Double.toString` round-trips bit-exactly): a header
    * line `numSub/subDim/k`, then one `s/c:v1,v2,...` line per
    * centroid. */
  private[operators] def encodeBooks(cb: PqCodebooks): String = {
    val sb = new StringBuilder
    sb.append(cb.numSub).append('/').append(cb.subDim).append('/')
      .append(cb.k).append('\n')
    for (s <- 0 until cb.numSub; c <- 0 until cb.k) {
      sb.append(s).append('/').append(c).append(':')
      val base = (s * cb.k + c) * cb.subDim
      var d = 0
      while (d < cb.subDim) {
        if (d > 0) sb.append(',')
        sb.append(java.lang.Double.toString(cb.flat(base + d)))
        d += 1
      }
      sb.append('\n')
    }
    sb.toString
  }

  private[operators] def decodeBooks(raw: String): PqCodebooks = {
    val lines = raw.split('\n').filter(_.nonEmpty)
    require(lines.nonEmpty, "empty PQ codebook sidecar")
    val hdr = lines.head.split('/')
    require(hdr.length == 3, s"corrupt PQ codebook header: ${lines.head}")
    val (numSub, subDim, k) = (hdr(0).toInt, hdr(1).toInt, hdr(2).toInt)
    // the encoder always writes exactly numSub*k centroid lines; a
    // shorter sidecar is TRUNCATION damage and must refuse loudly —
    // zero-filling the missing cells would silently score candidates
    // against zero reconstructions, corrupting recall with no error
    require(lines.length == 1 + numSub * k,
      s"truncated PQ codebook sidecar: ${lines.length - 1} centroid " +
        s"lines where the header declares ${numSub * k} — the file " +
        "was damaged out-of-band; rebuild the index")
    val flat = new Array[Double](numSub * k * subDim)
    lines.tail.foreach { line =>
      val cut = line.indexOf(':')
      require(cut > 0, s"corrupt PQ codebook line: ${line.take(40)}")
      val sc = line.substring(0, cut).split('/')
      val base = (sc(0).toInt * k + sc(1).toInt) * subDim
      val vs = line.substring(cut + 1).split(',')
      require(vs.length == subDim,
        s"corrupt PQ codebook line (dim ${vs.length} != $subDim)")
      var d = 0
      while (d < subDim) { flat(base + d) = vs(d).toDouble; d += 1 }
    }
    PqCodebooks(numSub, subDim, k, flat)
  }

  /** Content fingerprint (MD5 of the canonical encoding) — the
    * identity probes/appends verify, the IVF fingerprint's sibling. */
  def fingerprint(cb: PqCodebooks): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(encodeBooks(cb).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }
}
