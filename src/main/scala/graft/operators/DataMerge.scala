package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-plane MERGE (upsert) over partitioned parquet — the Spark-native
  * equivalent of the reference's Delta `MERGE INTO` on DATA tables
  * (`PostgresToDataLake_Ingestion_Notebook.py:373-415`; Delta itself is
  * not on the offline classpath). Not to be confused with the
  * control-plane `ParquetMerge` (hundreds of rows, full rewrite): this
  * one is partition-aware and only ever touches partitions that contain
  * source keys.
  *
  * Semantics: WHEN MATCHED (by `keys`) THEN UPDATE (source row wins),
  * WHEN NOT MATCHED THEN INSERT. Lowered to the join Delta lowers it
  * to: `target ANTI JOIN updates ∪ updates`, restricted to touched
  * partitions.
  *
  * Scale shape:
  *  - the touched-partition list is a `distinct` over the updates'
  *    partition column — bounded by partition count, not row count;
  *  - the target read is partition-PRUNED to touched partitions (the
  *    `isin` filter prunes at planning, so a 100 TB table with a 1%
  *    touched slice reads 1%);
  *  - one data pass: merged rows are written partition-by-partition to
  *    a staging dir, then swapped in with per-partition directory
  *    renames (the commit is metadata-only, like Delta's log commit —
  *    best-effort atomic per partition on a posix fs; an object-store
  *    deployment would commit via manifest instead);
  *  - untouched partitions are never read, rewritten, or renamed.
  *
  * Updates MAY move a row across partitions (same key, new partition
  * value): the old location is found via a key semi-join over the
  * target (the Delta-equivalent touched-file scan) and both dirs are
  * rewritten. The probe is skipped entirely when the partition columns
  * are a subset of the merge key, where moves are impossible.
  */
object DataMerge {

  /** Upsert `updates` into the partitioned parquet table at `path`.
    * Returns the touched partition values (diagnostics / audit). */
  def mergeIntoParquet(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], partCol: String): Seq[Any] =
    mergeIntoParquet(spark, path, updates, keys, Seq(partCol)).map(_.head)

  /** Key-match condition for the merge joins. Default is PLAIN
    * equality — ANSI/Delta MERGE `ON k = k` never matches NULL keys,
    * and the SQL lowering and upsert sink rely on that. `nullSafeKeys`
    * callers (the incremental-aggregate fold, where a NULL GROUP BY
    * key is one legitimate group) match with `<=>` so the stored
    * NULL-keyed row is read back and replaced instead of duplicated. */
  private def keyCond(l: DataFrame, r: DataFrame, keys: Seq[String],
      nullSafe: Boolean): org.apache.spark.sql.Column =
    keys.map(k => if (nullSafe) l(k) <=> r(k) else l(k) === r(k))
      .reduce(_ && _)

  /** ANSI/Delta MERGE contract: a key may appear at most once in the
    * source, else the upsert is ambiguous ("multiple source rows
    * matched"). One cheap aggregate over the updates — fail fast with
    * the offending cardinality instead of silently writing both copies. */
  def requireUniqueKeys(updates: DataFrame, keys: Seq[String]): Unit = {
    val dups = updates.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
      .limit(1).collect()
    require(dups.isEmpty,
      s"MERGE source has duplicate key ${dups.headOption.mkString} — " +
        "a target row would match multiple source rows (ANSI MERGE error)")
  }

  /** Multi-level-partitioned upsert (the reference's lake layout is
    * year/month/day — `Ingest:460`): the touched set is the distinct
    * PARTITION TUPLES of the updates, the pruned read is an OR of
    * per-tuple conjunctions (still planning-time partition pruning),
    * and the commit swaps nested leaf dirs. */
  def mergeIntoParquet(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], partCols: Seq[String],
      nullSafeKeys: Boolean = false): Seq[Seq[Any]] = {
    require(partCols.nonEmpty, "use mergeIntoParquetFull for unpartitioned")
    // the merge traverses `updates` up to four times (uniqueness
    // guard, tuple collect, moves probe, final anti-join/union);
    // materialize the bounded churn slice once instead of recomputing
    // its upstream plan per job (the history side is never cached)
    val src = updates.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try mergeIntoParquetImpl(spark, path, src, keys, partCols, nullSafeKeys)
    finally src.unpersist()
  }

  private def mergeIntoParquetImpl(spark: SparkSession, path: String,
      updates: DataFrame, keys: Seq[String], partCols: Seq[String],
      nullSafeKeys: Boolean): Seq[Seq[Any]] = {
    val newTuples: Seq[Seq[Any]] = // + the ANSI duplicate-key guard
      uniqueKeysAndTuples(updates, keys, partCols)
    if (newTuples.isEmpty) return newTuples

    // An update may MOVE a row (same key, different partition value);
    // the row's OLD partition must then be rewritten too or the stale
    // copy survives. When every partition column is part of the merge
    // key, moves are impossible and the old-location probe (a key
    // semi-join over the UNPRUNED target — the Delta-equivalent
    // touched-file scan) is skipped.
    val movesPossible = !partCols.forall(pc =>
      keys.exists(_.equalsIgnoreCase(pc)))
    val oldTuples: Seq[Seq[Any]] =
      if (movesPossible) {
        val stored = spark.read.option("mergeSchema", "true").parquet(path)
        val upKeys = updates.select(keys.map(col): _*)
        collectTuples(
          stored.join(upKeys, keyCond(stored, upKeys, keys, nullSafeKeys),
            "left_semi"),
          partCols)
      } else Nil
    val touched = (newTuples ++ oldTuples).distinct

    val target = scopeToTuples(spark, // partition-pruned scan
      spark.read.option("mergeSchema", "true").parquet(path),
      partCols, touched)
    // survivors of the old data = rows whose key has no update
    val merged = target
      .join(updates, keyCond(target, updates, keys, nullSafeKeys),
        "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))

    val staging = hiddenSibling(path, ".merge-staging")
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*).parquet(staging)
    // touched partitions are fully recomputed: one emptied by moves has
    // no staging dir and must be dropped; without moves, merged ⊇
    // updates means a touched partition can never vanish
    swapPartitions(spark, path, staging, partCols, touched,
      deleteMissing = movesPossible)
    touched
  }

  /** Distinct partition tuples of `df`, collected CAST TO STRING by
    * Spark itself — the engine's cast is exactly how the parquet writer
    * renders partition dir names (session time zone, TIMESTAMP_NTZ,
    * java8 datetime API all included), so the swap never re-renders
    * values JVM-side where the two could diverge. */
  def collectTuples(df: DataFrame, partCols: Seq[String]): Seq[Seq[Any]] =
    df.select(partCols.map(c => col(c).cast("string")): _*).distinct()
      .collect().map(_.toSeq).toSeq

  /** [[requireUniqueKeys]] + [[collectTuples]] in ONE aggregate job
    * (optimization r20, guide §1.2 step 1): the merge entry points ran
    * two full traversals of the updates — one for the ANSI
    * duplicate-key guard, one for the touched-partition tuples — where
    * a single grouped pass yields both (max per-key count, the distinct
    * tuple set, and an example offending key for the error message).
    * Tuple values are string-cast by Spark exactly like
    * [[collectTuples]]'s, so the swap-path rendering contract is
    * unchanged. Driver result stays bounded: one row of
    * (long, tuples ≤ #partitions, one key string). */
  private[graft] def uniqueKeysAndTuples(updates: DataFrame,
      keys: Seq[String], partCols: Seq[String]): Seq[Seq[Any]] = {
    val tupleCol = struct(partCols.map(c => col(c).cast("string")): _*)
    val perKey = updates.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), collect_set(tupleCol).as("__p"))
    val row = perKey.agg(
      max(col("__n")),
      array_distinct(flatten(collect_set(col("__p")))),
      first(when(col("__n") > 1,
        concat_ws(",", keys.map(k => col(k).cast("string")): _*)),
        ignoreNulls = true)).head()
    if (row.isNullAt(0)) return Nil // empty updates: no keys, no tuples
    require(row.getLong(0) <= 1L,
      s"MERGE source has duplicate key [${row.getString(2)}] — a " +
        "target row would match multiple source rows (ANSI MERGE error)")
    row.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq)
  }

  /** OR-of-conjunctions predicate selecting exactly the given partition
    * tuples (string-rendered, per [[collectTuples]]) — terms reference
    * only partition columns, so Catalyst evaluates the filter against
    * directory values at planning time. Use [[scopeToTuples]] for
    * frames: past [[TupleFilterMaxLiterals]] tuples it switches to
    * per-column IN-sets (+ a refining broadcast semi-join when there
    * are several partition columns) instead of growing this literal
    * tree. */
  def tupleFilter(partCols: Seq[String], touched: Seq[Seq[Any]])
      : org.apache.spark.sql.Column =
    touched.map { t =>
      partCols.zip(t).map { case (c, v) =>
        if (v == null) col(c).isNull
        else col(c).cast("string") === lit(v.toString)
      }.reduce(_ && _)
    }.reduce(_ || _)

  /** Above this many touched tuples, tuple scoping switches from the
    * literal OR-tree to per-column IN-sets (+ a refining broadcast
    * semi-join for multi-column layouts): a merge touching 10k
    * partitions must not hand the analyzer/codegen a 10k-disjunct
    * expression (cost linear in tuples PER RULE PASS — the same shape
    * the streaming upsert sink replaced with a broadcast join). */
  private[graft] val TupleFilterMaxLiterals = 64

  /** Restrict `df` to the given partition tuples: the literal
    * predicate (planning-time directory pruning) below the threshold;
    * above it, a per-column IN-set prefilter (still planning-time
    * pruning — Catalyst compiles a long IN to an O(1)-lookup `InSet`,
    * so cost is constant per directory regardless of touched count)
    * refined by a broadcast null-safe semi-join. The prefilter is
    * EXACT for a single partition column — the common layout — and
    * prunes to the touched values' cross product for several, so the
    * join only discards cross-product false positives. The join alone
    * would scan EVERY partition: dynamic partition pruning does not
    * fire through the `cast`+`<=>` condition, and a merge touching
    * 10k of 100k partitions must not pay a full-table scan. */
  def scopeToTuples(spark: SparkSession, df: DataFrame,
      partCols: Seq[String], touched: Seq[Seq[Any]]): DataFrame =
    if (touched.isEmpty)
      df.where(org.apache.spark.sql.functions.lit(false))
    else if (touched.size <= TupleFilterMaxLiterals)
      df.where(tupleFilter(partCols, touched))
    else {
      val perCol = partCols.zipWithIndex.map { case (c, i) =>
        val vals = touched.map(_(i)).distinct
        val nonNull = vals.filter(_ != null).map(_.toString)
        val in =
          if (nonNull.isEmpty) lit(false)
          else col(c).cast("string").isInCollection(nonNull)
        if (vals.contains(null)) in || col(c).isNull else in
      }
      val pruned = df.where(perCol.reduce(_ && _))
      if (partCols.size == 1) pruned // the IN-set is the exact scope
      else {
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        val rows = touched.map(t => org.apache.spark.sql.Row.fromSeq(
          t.map(v => if (v == null) null else v.toString)))
        val kt = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(partCols.map(c =>
            StructField(s"__mt_$c", StringType, nullable = true))))
        pruned.join(org.apache.spark.sql.functions.broadcast(kt),
          partCols.map(c => pruned(c).cast("string") <=> kt(s"__mt_$c"))
            .reduce(_ && _),
          "left_semi")
      }
    }

  /** Single-level convenience overload of the tuple swap below. */
  def swapPartitions(spark: SparkSession, path: String, staging: String,
      partCol: String, touched: Seq[Any], deleteMissing: Boolean): Unit =
    swapPartitions(spark, path, staging, Seq(partCol),
      touched.map(Seq(_)), deleteMissing)

  /** Commit step shared by the partition-scoped DML lowerings: swap
    * each touched leaf dir `p1=v1/p2=v2/…` from `staging` into `path`
    * (metadata-only renames; parents created as needed), then drop
    * staging. A touched tuple with no staging dir means every one of
    * its rows was removed — deleted when `deleteMissing` (the DELETE
    * path), kept otherwise (upserts). */
  def swapPartitions(spark: SparkSession, path: String, staging: String,
      partCols: Seq[String], touched: Seq[Seq[Any]],
      deleteMissing: Boolean): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
    def swapOne(t: Seq[Any]): Unit = {
      val part = partCols.zip(t).map { case (c, v) =>
        // values arrive PRE-RENDERED by Spark's own cast (collectTuples:
        // session time zone, NTZ, java8 datetime all handled by the
        // engine, exactly as the writer renders dirs), so the only
        // JVM-side work is Hive path escaping — a raw ':', '%', '=' in
        // an unescaped interpolation would never match the escaped dirs
        // the writer creates, silently discarding the staged partition
        val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        val rendered =
          if (v == null) "__HIVE_DEFAULT_PARTITION__"
          else esc.escapePathName(v.toString)
        s"${esc.escapePathName(c)}=$rendered"
      }.mkString("/")
      val src = new org.apache.hadoop.fs.Path(s"$staging/$part")
      val dst = new org.apache.hadoop.fs.Path(s"$path/$part")
      if (fs.exists(src)) {
        if (fs.exists(dst)) fs.delete(dst, true)
        fs.mkdirs(dst.getParent)
        fs.rename(src, dst)
      } else if (deleteMissing && fs.exists(dst)) {
        fs.delete(dst, true)
      }
    }
    // distinct tuples touch distinct leaf dirs, so the swaps are
    // independent (mkdirs on a shared parent is idempotent) — a merge
    // touching 10k partitions must not pay 10k serial rename RPCs
    DriverPar.foreach(touched)(swapOne)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
  }

  /** Upsert into an UNPARTITIONED parquet table: whole-table
    * anti-join ∪ updates, written to staging and swapped in (the
    * ParquetMerge pattern at data-plane size). Partitioned tables
    * should use [[mergeIntoParquet]] — this variant necessarily
    * rewrites everything, which is the honest cost of merging into an
    * unpartitioned table in ANY engine (Delta included). */
  def mergeIntoParquetFull(spark: SparkSession, path: String,
      updates: DataFrame, keys: Seq[String],
      nullSafeKeys: Boolean = false): Unit = {
    requireUniqueKeys(updates, keys)
    val target = spark.read.option("mergeSchema", "true").parquet(path)
    val merged = target
      .join(updates, keyCond(target, updates, keys, nullSafeKeys),
        "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
    stagedOverwrite(spark, path, merged, Nil)
  }

  /** Hidden sibling of `path` — same parent, basename prefixed with '.'
    * plus `suffix`. Staging and backup dirs for LEAF rewrites (per-
    * partition compaction, OPTIMIZE, partition-scoped DML) live INSIDE
    * the table root; a visible name like `part=1.merge-staging` contains
    * '=' and would be parsed as a bogus partition value by path-based
    * partition discovery — a crash leftover poisons every later read,
    * and even a concurrent read during the rewrite can double-count.
    * Leading-dot names are ignored by Spark's FileIndex (and by this
    * file's own `mergeSchema` reads). */
  def hiddenSibling(path: String, suffix: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    new org.apache.hadoop.fs.Path(p.getParent, "." + p.getName + suffix).toString
  }

  /** Restore a table lost to a crash inside [[stagedOverwrite]]'s commit
    * window (between the `dst`→`bak` and `staging`→`dst` renames the
    * table path does not exist and the data is only at the hidden
    * backup). Returns true if a restore happened. Called automatically
    * at the start of the next [[stagedOverwrite]]; callers that READ
    * `path` before writing (every DML lowering) should invoke it first
    * when crash recovery matters — the read itself would otherwise fail
    * on the missing path. */
  def recoverStagedOverwrite(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(hiddenSibling(path, ".old"))
    if (!fs.exists(dst) && fs.exists(bak)) { fs.rename(bak, dst); true }
    else false
  }

  /** Write `df` to a hidden staging sibling (optionally partitioned),
    * then swap the staging dir in — the write-new + rename commit every
    * DML lowering here shares. `df` may read from `path` itself: the
    * read happens during the staging write, strictly before the swap.
    *
    * Commit window: between the two renames the table path briefly does
    * not exist. A crash inside the window leaves the data at the hidden
    * `.<name>.old` backup; the next write (or an explicit
    * [[recoverStagedOverwrite]]) restores it automatically. */
  def stagedOverwrite(spark: SparkSession, path: String, df: DataFrame,
      partCols: Seq[String]): Unit = {
    recoverStagedOverwrite(spark, path)
    val staging = hiddenSibling(path, ".merge-staging")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(staging)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(hiddenSibling(path, ".old"))
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
    fs.delete(bak, true)
  }
}
