package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type 2) apply — the effective-dated
  * MERGE a warehouse runs on every dimension load, and the natural
  * upgrade of the reference's overwrite-style `TableLoadDetails` MERGE
  * (`Ingest:373-415`, which keeps only the latest row; SCD2 keeps the
  * full timeline):
  *
  *   history: keys + attrs + (valid_from, valid_to) — valid_to NULL
  *            marks the current row of each key
  *   updates: keys + attrs + event-time column `ts`
  *
  *   changed key  → current row CLOSED (valid_to = ts) + new current row
  *   new key      → new current row
  *   equal attrs  → no-op (the row is NOT churned)
  *   absent key   → current row untouched
  *
  * One full-outer join of the CURRENT slice against the updates; the
  * closed history never joins at all. Assumes ≤1 update per key per
  * batch (dedup upstream — `UpsertSink`'s last-writer-wins shape).
  */
object Scd2 {

  def applyChanges(history: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], ts: String): DataFrame = {
    val curr = history.where(col("valid_to").isNull)
      .withColumn("__has_c", lit(true))
    val past = history.where(col("valid_to").isNotNull)
    val u = updates.select((keys.map(col) ++
      attrs.map(c => col(c).as(s"__u_$c")) :+
      col(ts).as("__u_ts") :+ lit(true).as("__has_u")): _*)

    val j = curr.join(u, keys, "full_outer")
    val hasC = coalesce(col("__has_c"), lit(false))
    val hasU = coalesce(col("__has_u"), lit(false))
    val changed = hasC && hasU &&
      attrs.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    val histCols = keys ++ attrs ++ Seq("valid_from", "valid_to")
    // current rows that survive untouched (no update, or equal attrs)
    val kept = j.where(hasC && !changed)
      .select(histCols.map(col): _*)
    // changed: the old current row, closed at the update's event time
    val closed = j.where(changed)
      .select((keys.map(col) ++ attrs.map(col) :+
        col("valid_from") :+ col("__u_ts").as("valid_to")): _*)
    // changed or brand-new: the update becomes the new current row
    val fresh = j.where(hasU && (!hasC || changed))
      .select((keys.map(col) ++ attrs.map(c => col(s"__u_$c").as(c)) :+
        col("__u_ts").as("valid_from") :+
        lit(null).cast(j.schema("valid_to").dataType).as("valid_to")): _*)

    past.select(histCols.map(col): _*)
      .unionByName(kept).unionByName(closed).unionByName(fresh)
  }

  /** Apply an SCD2 change batch to a PERSISTED parquet history table,
    * partition-scoped — the table-level form of [[applyChanges]] and
    * the timeline-keeping upgrade of [[DataMerge.mergeIntoParquet]].
    *
    * Scale shape (mirrors DataMerge): the touched-partition set is a
    * distinct over the updates' partition tuples (bounded by partition
    * count); the history read is partition-PRUNED to touched tuples, so
    * a 100 TB history with a 0.1% daily churn slice reads 0.1%; the
    * commit is per-partition hidden-staging dir swaps. Untouched
    * partitions are never read, rewritten, or renamed.
    *
    * Partition columns must be among `keys ++ attrs` (they have to
    * survive into the rewritten rows). A partition column that is NOT
    * part of the key may change across versions of a key (a "move"):
    * the key's old partitions are then found via a current-rows key
    * semi-join (column-pruned scan) and rewritten too — the closed row
    * stays in the old partition, the new current row lands in the new
    * one. Returns the touched partition tuples (string-rendered). */
  def applyToTable(spark: org.apache.spark.sql.SparkSession, path: String,
      updates: DataFrame, keys: Seq[String], attrs: Seq[String], ts: String,
      partCols: Seq[String]): Seq[Seq[Any]] = {
    // The apply traverses `updates` up to four times (uniqueness
    // guard, touched-tuple collect, moves probe, the final join) and
    // each traversal would otherwise recompute its upstream plan —
    // typically a scan + filters. Materialize it once (Delta's MERGE
    // materializes its source for the same reason): the churn slice
    // is bounded by definition, so caching it is safe at any table
    // scale, unlike the history side, which is never cached.
    val src = updates.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try applyToTableImpl(spark, path, src, keys, attrs, ts, partCols)
    finally src.unpersist()
  }

  private def applyToTableImpl(spark: org.apache.spark.sql.SparkSession,
      path: String, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], ts: String,
      partCols: Seq[String]): Seq[Seq[Any]] = {
    if (partCols.isEmpty) {
      DataMerge.requireUniqueKeys(updates, keys)
      // DataMerge's contract: callers that READ `path` before writing
      // must recover first — a crash in a prior apply's commit window
      // left the table at the hidden .old backup, and the read below
      // would throw path-not-found forever instead of self-healing
      DataMerge.recoverStagedOverwrite(spark, path)
      val history = spark.read.option("mergeSchema", "true").parquet(path)
      DataMerge.stagedOverwrite(spark, path,
        applyChanges(history, updates, keys, attrs, ts), Nil)
      return Nil
    }
    require(partCols.forall(pc =>
      (keys ++ attrs).exists(_.equalsIgnoreCase(pc))),
      s"partition columns $partCols must be among keys/attrs so they " +
        "survive into rewritten rows")
    // one aggregate job: the duplicate-key guard + the touched tuples
    // (optimization r20 — see DataMerge.uniqueKeysAndTuples)
    val newTuples = DataMerge.uniqueKeysAndTuples(updates, keys, partCols)
    if (newTuples.isEmpty) return Nil
    val movesPossible = !partCols.forall(pc =>
      keys.exists(_.equalsIgnoreCase(pc)))
    val oldTuples: Seq[Seq[Any]] =
      if (movesPossible)
        DataMerge.collectTuples(
          spark.read.option("mergeSchema", "true").parquet(path)
            .where(col("valid_to").isNull)
            .join(updates.select(keys.map(col): _*), keys, "left_semi"),
          partCols)
      else Nil
    val touched = (newTuples ++ oldTuples).distinct
    val history = DataMerge.scopeToTuples(spark,
      spark.read.option("mergeSchema", "true").parquet(path),
      partCols, touched)
    val out = applyChanges(history, updates, keys, attrs, ts)
    val staging = DataMerge.hiddenSibling(path, ".merge-staging")
    out.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partCols: _*).parquet(staging)
    // a touched partition always keeps at least its closed rows, so no
    // partition can vanish — deleteMissing stays false
    DataMerge.swapPartitions(spark, path, staging, partCols, touched,
      deleteMissing = false)
    touched
  }
}
