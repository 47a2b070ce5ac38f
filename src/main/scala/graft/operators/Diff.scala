package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the CDC-style comparison of two versions of a table
  * (dataset versioning is how a training corpus evolves between runs;
  * the reference's incremental loads produce exactly such version
  * pairs, `Ingest:329-340`). One full-outer join on the key:
  *
  *   key only in `after`            → inserted
  *   key only in `before`           → deleted
  *   key in both, any column differs → updated
  *   key in both, all columns equal  → unchanged (dropped by default)
  *
  * Column comparison is null-safe (`<=>`). Cost shape: a single
  * co-partitioned shuffle join on the key; at 100 TB both sides being
  * bucketed/partitioned the same way makes this shuffle-free.
  */
object Diff {

  /** Rows of `after` ∪ deleted keys of `before`, tagged with
    * `change_type` ∈ {inserted, deleted, updated}. Unchanged rows are
    * omitted (`keepUnchanged` to include them). Non-key columns come
    * from `after` for inserts/updates and `before` for deletes. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
      keepUnchanged: Boolean = false): DataFrame = {
    val dataCols = after.columns.filterNot(keys.contains).toSeq
    val b = before.select(before.columns.map(c => col(c).as(s"__b_$c")): _*)
    val a = after.select(after.columns.map(c => col(c).as(s"__a_$c")): _*)
    val joinCond = keys.map(k => b(s"__b_$k") <=> a(s"__a_$k")).reduce(_ && _)
    val joined = b.join(a, joinCond, "full_outer")

    val inAfter = keys.map(k => a(s"__a_$k").isNotNull).reduce(_ && _)
    val inBefore = keys.map(k => b(s"__b_$k").isNotNull).reduce(_ && _)
    val anyChanged = dataCols
      .map(c => !(b(s"__b_$c") <=> a(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    val changeType = when(!inBefore, "inserted")
      .when(!inAfter, "deleted")
      .when(anyChanged, "updated")
      .otherwise("unchanged")
    val out = joined.select(
      (keys.map(k => coalesce(a(s"__a_$k"), b(s"__b_$k")).as(k)) ++
        dataCols.map(c =>
          when(inAfter, a(s"__a_$c")).otherwise(b(s"__b_$c")).as(c)) :+
        changeType.as("change_type")): _*)
    if (keepUnchanged) out else out.where(col("change_type") =!= "unchanged")
  }
}
