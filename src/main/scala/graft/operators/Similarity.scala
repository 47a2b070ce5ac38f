package graft.operators

import graft.functions.{CosineSimilarity, VectorFunctions}
import graft.functions.VectorFunctions.{hyperplaneBucket, makePlanes}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ArrayType(Float)), [EXT] per the north star.
  *
  *  - `bruteForceTopK`: exact cosine top-k against a literal query
  *    vector — a single narrow pass + a k-row total sort (`orderBy` +
  *    `limit` compiles to TakeOrderedAndProject: each partition keeps
  *    only its local top-k, the driver merges k·p rows). Linear scan,
  *    but embarrassingly parallel — the right baseline at any scale.
  *  - `lshTopK`: random-hyperplane LSH variant — vectors are bucketed
  *    by sign pattern once (an indexing pass you'd persist,
  *    partitioned by bucket); queries probe only buckets within
  *    `probeHamming` of the query's bucket, pruning the scan to
  *    buckets/2^h of the corpus. This is the 100 TB path: the probe
  *    is a partition-pruned read, not a full scan.
  */
object Similarity {

  def bruteForceTopK(df: DataFrame, embedding: String, id: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = lit(query.map(_.toDouble))
    df.withColumn("score", CosineSimilarity(col(embedding), q))
      .select(col(id), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  /** Bucket every vector by `numPlanes` hyperplane signs (the index). */
  def index(df: DataFrame, embedding: String, numPlanes: Int, dim: Int): DataFrame =
    df.withColumn("bucket",
      hyperplaneBucket(col(embedding), makePlanes(numPlanes, dim)))

  /** Persist the index PARTITIONED BY bucket — the on-disk shape the
    * 100 TB story needs: 2^numPlanes directories, each holding only its
    * bucket's vectors. A probe then reads probed-buckets/2^numPlanes of
    * the corpus via directory-level partition pruning (see
    * [[probePersistedIndex]] and the PlanSpec-style assertion in
    * OperatorSpec), instead of scanning everything and filtering. */
  def writePersistedIndex(df: DataFrame, embedding: String, numPlanes: Int,
      dim: Int, path: String): Unit = {
    // data FIRST, sidecar after: SaveMode.Overwrite deletes the whole
    // output path before writing, so a sidecar written first is erased
    // by the very write it guards — every fresh index would be
    // guard-less (r15 ADVICE, empirically confirmed). Data-then-sidecar
    // leaves a crash window with an unguarded index, which the first
    // guarded append heals (heal-on-append below) — the same window the
    // pre-sidecar legacy dirs already live in.
    index(df, embedding, numPlanes, dim)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("bucket").parquet(path)
    writePlaneSidecar(df.sparkSession, path, numPlanes, dim)
  }

  /** The `_lsh_planes.json` sidecar: the (numPlanes, dim) family an
    * index's buckets were hashed under. Appends and probes with a
    * DIFFERENT family would silently place/look for vectors in the
    * wrong `bucket=` dirs (recall loss with no error), so both verify
    * against it — the LSH analogue of the IVF paths' frozen-codebook
    * guard. */
  private def planesPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_lsh_planes.json")

  private def writePlaneSidecar(spark: org.apache.spark.sql.SparkSession,
      path: String, numPlanes: Int, dim: Int): Unit =
    Sidecars.write(spark, planesPath(path),
      s"""{"num_planes":$numPlanes,"dim":$dim}""")

  /** Plane family of a persisted LSH index; None for pre-sidecar dirs.
    * A truncated/corrupt sidecar fails with a named error, never a
    * silent pass-through. */
  def readPlaneSidecar(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(Int, Int)] = {
    val p = planesPath(path)
    Sidecars.read(spark, p).map { raw =>
      val m = Sidecars.parseFlatJson(raw, p)
      (m("num_planes").toInt, m("dim").toInt)
    }
  }

  /** Refuse when a caller's (numPlanes, dim) disagree with the index's
    * recorded family; pre-sidecar dirs (no record) pass through with
    * the caller's word — the legacy behavior. */
  private def requirePlaneFamily(spark: org.apache.spark.sql.SparkSession,
      path: String, numPlanes: Int, dim: Int, what: String): Unit =
    readPlaneSidecar(spark, path).foreach { case (np, d) =>
      require(np == numPlanes && d == dim,
        s"$what with plane family ($numPlanes, $dim) against $path " +
          s"built under ($np, $d) — vectors would land in (or be " +
          "sought in) the wrong bucket= dirs; use the recorded family " +
          "or rebuild with writePersistedIndex")
    }

  /** Top-k probe against a persisted index. The Hamming-radius predicate
    * is a deterministic function of the PARTITION column, so Catalyst
    * evaluates it against the directory values at planning time — only
    * matching `bucket=` dirs are listed and read. */
  /** Driver-side bucket of a query vector: sign-pack of plane dot
    * products. ONE definition shared by both probe paths — it must
    * stay bit-for-bit in sync with the executor-side
    * HyperplaneBucket semantics (> 0 test, min-length zip), or a
    * probe would aim at the wrong `bucket=` directory and return
    * empty results. */
  private def queryBucket(planes: Seq[Array[Double]],
      query: Array[Float]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (w, x) => w * x.toDouble }.sum
      if (d > 0) 1L << i else 0L
    }.sum

  /** Append new vectors to a persisted hyperplane-LSH index: bucket
    * under the SAME plane family (it is a pure function of
    * (numPlanes, dim) — no codebook to freeze, so growth needs no
    * drift baseline; the `_lsh_planes.json` sidecar still pins the
    * family so a mismatched append refuses instead of silently
    * corrupting bucket routing). Replaying an append is NOT idempotent
    * on this layout (plain parquet append); callers driving it from a
    * stream should write per-batch dirs the AnnIngest way.
    * Single-writer, like the build. */
  def appendToPersistedIndex(df: DataFrame, embedding: String,
      numPlanes: Int, dim: Int, path: String): Unit = {
    val spark = df.sparkSession
    requirePlaneFamily(spark, path, numPlanes, dim, "append")
    // heal-on-append: a pre-sidecar (or sidecar-crashed) index passed
    // the check on the caller's word — record that family now so the
    // unguarded window closes instead of staying open forever
    if (readPlaneSidecar(spark, path).isEmpty)
      writePlaneSidecar(spark, path, numPlanes, dim)
    index(df, embedding, numPlanes, dim)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("bucket").parquet(path)
  }

  def probePersistedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, embedding: String, id: String, query: Array[Float],
      numPlanes: Int, k: Int, probeHamming: Int = 1): DataFrame = {
    requirePlaneFamily(spark, path, numPlanes, query.length, "probe")
    val planes = makePlanes(numPlanes, query.length)
    val qBucket = queryBucket(planes, query)
    val q = lit(query.map(_.toDouble))
    spark.read.parquet(path)
      .where(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .withColumn("score", CosineSimilarity(col(embedding), q))
      .select(col(id), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  def lshTopK(indexed: DataFrame, embedding: String, id: String,
      query: Array[Float], numPlanes: Int, k: Int,
      probeHamming: Int = 1): DataFrame = {
    val dim = query.length
    val planes = makePlanes(numPlanes, dim)
    // query bucket computed driver-side (same plane family)
    val qBucket = queryBucket(planes, query)
    val q = lit(query.map(_.toDouble))
    indexed
      .where(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .withColumn("score", CosineSimilarity(col(embedding), q))
      .select(col(id), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  /** IVF codebook: (list_id, centroid) entries. Built deterministically
    * (seeded from the lowest `nlist` ids, optionally Lloyd-refined) so
    * index identity is stable across runs and executors. */
  final case class IvfCodebook(entries: Array[(Long, Array[Double])])

  /** Build the IVF codebook. `refineIters` Lloyd iterations: assign all
    * vectors (one scan, the codegen'd argmax pass below), recompute each
    * list's centroid as the per-dimension mean. The mean job shuffles
    * only (nlist × dim) partially-aggregated keys — at 100 TB each
    * iteration is one narrow scan plus a tiny fixed-size shuffle, and
    * the driver only ever holds nlist × dim doubles. Refinement moves
    * cells toward the data's density (better recall per probed list
    * than raw seeds); zero iterations reproduces the seed codebook. */
  def buildCodebook(df: DataFrame, embedding: String, id: String,
      nlist: Int, refineIters: Int = 0): IvfCodebook = {
    var cents = df.orderBy(col(id).asc).limit(nlist)
      .select(col(id), col(embedding)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    var it = 0
    while (it < refineIters) {
      val means = assign(df, embedding, cents)
        .select(col("list_id"), posexplode(col(embedding)).as(Seq("pos", "x")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect() // nlist × dim rows — bounded by codebook size, not data
      val byList = means.groupBy(_.getLong(0))
      cents = cents.map { case (lid, old) =>
        byList.get(lid) match {
          case Some(rows) =>
            val m = old.clone()
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            (lid, m)
          case None => (lid, old) // empty list keeps its seed centroid
        }
      }
      it += 1
    }
    IvfCodebook(cents)
  }

  /** Assign every vector to its nearest centroid by cosine — ONE pass
    * over the literal codebook: the per-row score array is bound to its
    * own column, so argmax reads it twice without recomputing the nlist
    * cosines. (CollapseProject will not inline a non-cheap alias used
    * more than once, so the single evaluation survives optimization —
    * this is the dominant compute of an index build at scale.) At scale
    * the result is written `partitionBy("list_id")`, so a probe reads
    * nprobe/nlist of the data — partition pruning, same story as the
    * LSH variant but with data-adaptive cells. */
  private def assign(df: DataFrame, embedding: String,
      cents: Array[(Long, Array[Double])]): DataFrame =
    assignWithSim(df, embedding, cents).drop(AssignSimCol)

  /** Cosine similarity of each row to its ASSIGNED centroid — the
    * per-batch signal [[appendToPersistedIvf]]'s drift check compares
    * against the build-time baseline. */
  private[graft] val AssignSimCol = "__ivf_sim"

  private def assignWithSim(df: DataFrame, embedding: String,
      cents: Array[(Long, Array[Double])]): DataFrame = {
    val centroidLit = array(cents.map { case (cid, vec) =>
      struct(lit(cid).as("list_id"), lit(vec).as("c"))
    }: _*)
    df.withColumn("__cands", centroidLit)
      .withColumn("__scores",
        transform(col("__cands"),
          c => CosineSimilarity(col(embedding), c.getField("c"))))
      .withColumn("list_id",
        col("__cands")(
          array_position(col("__scores"), array_max(col("__scores"))) - 1
        ).getField("list_id"))
      .withColumn(AssignSimCol, array_max(col("__scores")))
      .drop("__cands", "__scores")
  }

  /** The IVF index: source rows + their assigned `list_id`. */
  def ivfAssign(df: DataFrame, embedding: String,
      codebook: IvfCodebook): DataFrame =
    assign(df, embedding, codebook.entries)

  /** Seed-codebook convenience (no refinement) — the round-1 surface. */
  def ivfIndex(df: DataFrame, embedding: String, id: String,
      nlist: Int): DataFrame =
    ivfAssign(df, embedding, buildCodebook(df, embedding, id, nlist))

  def ivfTopK(indexed: DataFrame, embedding: String, id: String,
      query: Array[Float], codebook: IvfCodebook, nprobe: Int,
      k: Int): DataFrame = {
    // nprobe nearest centroid lists for the query, computed driver-side
    // against the SAME codebook the index was assigned with
    def cos(a: Array[Float], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) -2.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probeLists = codebook.entries
      .sortBy { case (cid, c) => (-cos(query, c), cid) }
      .take(nprobe).map(_._1)
    val q = lit(query.map(_.toDouble))
    indexed.where(col("list_id").isin(probeLists.toSeq: _*))
      .withColumn("score", CosineSimilarity(col(embedding), q))
      .select(col(id), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  /** Assignment quality of one cohort of vectors: how many, and their
    * mean cosine to the centroid each was assigned. Written as the
    * `_ivf_stats.json` sidecar at build time (underscore-prefixed, so
    * parquet readers never see it) — the baseline every later append's
    * drift check compares against. */
  final case class IvfStats(vectors: Long, meanSim: Double)

  /** What [[appendToPersistedIvf]] did. `retrainRecommended` is the
    * IVF analogue of the band index's `rebucketRecommended`: it fires
    * when the appended cohort's mean assignment DISTANCE (1 − cosine)
    * is ≥2× the build-time baseline (floored at 0.01 so a perfectly
    * tight build doesn't flag on noise) — the signal that the frozen
    * codebook no longer describes the arriving distribution (cells too
    * coarse where the new mass sits → recall degrades at fixed
    * nprobe) and a rebuild/re-Lloyd is due. Also logged at WARN so
    * unattended ingest jobs leave a trail. A ZERO-vector baseline
    * carries no evidence (its 0.0 meanSim would set the threshold at
    * meanSim ≤ −1, silencing the flag forever — the exact silent
    * degradation the signal exists to catch), so it never justifies a
    * verdict either way; the append paths RE-SEED such a baseline from
    * the first non-empty cohort instead. */
  final case class IvfAppend(appended: Long, meanSim: Double,
      build: IvfStats) {
    def retrainRecommended: Boolean =
      appended > 0 && build.vectors > 0 &&
        (1.0 - meanSim) >= 2.0 * math.max(1.0 - build.meanSim, 0.01)
  }

  private def statsPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_ivf_stats.json")

  private[graft] def writeIvfStats(spark: org.apache.spark.sql.SparkSession,
      path: String, s: IvfStats): Unit =
    Sidecars.write(spark, statsPath(path),
      s"""{"vectors":${s.vectors},"mean_sim":${s.meanSim}}""")

  /** Build-time assignment baseline of a persisted IVF index; None for
    * a pre-stats index directory (older builds); a truncated/corrupt
    * sidecar fails with a named error. */
  def readIvfStats(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[IvfStats] = {
    val p = statsPath(path)
    Sidecars.read(spark, p).map { raw =>
      val m = Sidecars.parseFlatJson(raw, p)
      IvfStats(m("vectors").toLong, m("mean_sim").toDouble)
    }
  }

  /** Mean assigned-centroid cosine of `df` under `cents` — ONE narrow
    * scan + a scalar aggregate. */
  private[graft] def assignmentQuality(df: DataFrame, embedding: String,
      cents: Array[(Long, Array[Double])]): IvfStats =
    qualityOf(assignWithSim(df, embedding, cents))

  /** The quality aggregate over a frame that already carries
    * [[AssignSimCol]] — so append paths that materialized the
    * assignment once (for the write) don't recompute it. */
  private[graft] def qualityOf(assigned: DataFrame): IvfStats = {
    val r = assigned.agg(count(lit(1)), avg(col(AssignSimCol))).head()
    IvfStats(r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  /** [[ivfAssign]] keeping the per-row assigned-centroid cosine
    * ([[AssignSimCol]]) — for callers that write AND measure the same
    * cohort and must pay the argmax pass once. */
  private[graft] def ivfAssignWithSim(df: DataFrame, embedding: String,
      codebook: IvfCodebook): DataFrame =
    assignWithSim(df, embedding, codebook.entries)

  /** Persist the IVF index PARTITIONED BY list_id — nlist directories,
    * each holding one cell's vectors. [[ivfTopK]] over a read of this
    * layout prunes to its nprobe cells at DIRECTORY level (the `isin`
    * on the partition column is a partition filter), so a probe lists
    * and reads nprobe/nlist of the corpus — the on-disk counterpart of
    * the in-memory index, same story as the LSH variant but with
    * data-adaptive cells. Also records the build-time assignment
    * quality (`_ivf_stats.json`) as [[appendToPersistedIvf]]'s drift
    * baseline — one extra narrow scan, paid once per corpus on the
    * build path. Returns that baseline. */
  def writePersistedIvf(df: DataFrame, embedding: String,
      codebook: IvfCodebook, path: String): IvfStats = {
    ivfAssign(df, embedding, codebook)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("list_id").parquet(path)
    val stats = assignmentQuality(df, embedding, codebook.entries)
    writeIvfStats(df.sparkSession, path, stats)
    stats
  }

  /** Append new vectors to a persisted IVF index: assign against the
    * FROZEN codebook (the one the index was built with — mixing
    * codebooks would route probes to cells the rows aren't in) and
    * append into the existing `list_id=` cell dirs. A production ANN
    * corpus grows; rebuilding nlist cells per arriving chunk is the
    * thing this avoids — the append touches only the chunk, and
    * dir-pruned probes see old and new rows alike. Single-writer like
    * the parquet LSH index (plain-directory layout, no commit
    * protocol); the returned [[IvfAppend]] carries the drift check
    * against the build baseline, so the caller learns when the frozen
    * codebook has gone stale instead of silently degrading recall. */
  def appendToPersistedIvf(df: DataFrame, embedding: String,
      codebook: IvfCodebook, path: String): IvfAppend = {
    val spark = df.sparkSession
    val stored = readIvfStats(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _ivf_stats.json build baseline — build it with " +
          "writePersistedIvf first (appending to an index whose " +
          "codebook is unknown would corrupt cell routing)"))
    // ONE assignment pass (the dominant per-row compute), materialized
    // chunk-local: the write and the quality aggregate both read it
    val assigned = ivfAssignWithSim(df, embedding, codebook)
      .localCheckpoint(true)
    assigned.drop(AssignSimCol)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("list_id").parquet(path)
    val q = qualityOf(assigned)
    // a zero-vector baseline (empty build corpus) carries no evidence:
    // re-seed it from the first non-empty cohort so the drift signal
    // arms instead of staying silent forever
    val build =
      if (stored.vectors == 0 && q.vectors > 0) {
        writeIvfStats(spark, path, q)
        q
      } else stored
    val res = IvfAppend(q.vectors, q.meanSim, build)
    if (res.retrainRecommended)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"IVF index $path: appended cohort mean assignment sim " +
          f"${q.meanSim}%.4f vs build baseline ${build.meanSim}%.4f — " +
          "the frozen codebook no longer fits the arriving " +
          "distribution; rebuild (retrain) recommended")
    res
  }

  /** Top-k probe against a persisted IVF index (directory-pruned). */
  def probePersistedIvf(spark: org.apache.spark.sql.SparkSession,
      path: String, embedding: String, id: String, query: Array[Float],
      codebook: IvfCodebook, nprobe: Int, k: Int): DataFrame =
    ivfTopK(spark.read.parquet(path), embedding, id, query, codebook,
      nprobe, k)

  /** Retrain a drifted persisted IVF index: build a FRESH codebook from
    * everything the index now holds (build rows + every appended
    * cohort — the union is the current distribution, which is exactly
    * what drifted away from the old codebook) and rewrite into
    * `dstPath` — the drift loop's closing move once
    * `retrainRecommended` fires (the [[appendToPersistedIvf]] /
    * AnnIngest WARN), mirroring `rebucketBandIndex` for the band
    * index. The rewrite lands at a NEW path by design: the plain-dir
    * parquet layout has no commit protocol, so an in-place overwrite
    * would race live probes (the band index can migrate in place only
    * because it IS a snapshot table with CAS commits); the caller
    * swaps probes to `dstPath` once this returns, then deletes the old
    * dir. One assignment pass over the index plus the quality scan —
    * linear in the index, paid only when drift says so. Returns the
    * new codebook and its baseline. The multi-batch `batch=` layout a
    * streaming ingest leaves behind reads through the same partition
    * discovery, so stream-grown indexes retrain identically. */
  def retrainPersistedIvf(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String, embedding: String, id: String,
      nlist: Int, refineIters: Int = 0): (IvfCodebook, IvfStats) = {
    require(srcPath != dstPath,
      "retrain must land at a NEW path — an in-place overwrite of a " +
        "plain-dir index would race live probes (see scaladoc)")
    val rows = spark.read.parquet(srcPath)
      .select(col(id), col(embedding)) // drop list_id/batch partitions
    val cb = buildCodebook(rows, embedding, id, nlist, refineIters)
    val stats = writePersistedIvf(rows, embedding, cb, dstPath)
    (cb, stats)
  }

  /** Round-1-shaped overload: rebuilds the seed codebook from the
    * indexed frame (valid only for unrefined indexes). */
  def ivfTopK(indexed: DataFrame, embedding: String, id: String,
      query: Array[Float], nlist: Int, nprobe: Int, k: Int): DataFrame =
    ivfTopK(indexed, embedding, id, query,
      buildCodebook(indexed, embedding, id, nlist), nprobe, k)

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs are
    * generated only within a bucket (plus its full-signature match),
    * never corpus × corpus. */
  def nearDupPairs(df: DataFrame, embedding: String, id: String,
      numPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    // The index is computed ONCE and persisted, then both join sides
    // read the materialized buckets — without this, the self-join would
    // re-scan the source and re-evaluate hyperplaneBucket per side. At
    // 100 TB the analogue is an index table written
    // `partitionBy("bucket")` and joined against itself; the in-memory
    // persist is the local[n] stand-in for that persisted index.
    val ix = index(df, embedding, numPlanes, dim)
      .select(col("bucket"), col(id), col(embedding)).persist()
    try {
      val l = ix.select(col("bucket"), col(id).as("id_a"),
        col(embedding).as("emb_a"))
      val r = ix.select(col("bucket"), col(id).as("id_b"),
        col(embedding).as("emb_b"))
      val pairs = l.join(r, Seq("bucket"))
        .where(col("id_a") < col("id_b"))
        .withColumn("score", CosineSimilarity(col("emb_a"), col("emb_b")))
        .where(col("score") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score"))
      // Materialize the (threshold-filtered, small) pair set eagerly so
      // the embedding-bearing index cache can be RELEASED before
      // returning: Dataset.persist pins blocks in the CacheManager until
      // an explicit unpersist, so returning a lazy frame over `ix` would
      // leak one full index per invocation for the JVM lifetime. A local
      // checkpoint lives at the RDD layer — no CacheManager entry — so
      // its blocks are freed by the ContextCleaner once the returned
      // frame is garbage-collected.
      pairs.localCheckpoint(true)
    } finally ix.unpersist()
  }
}
