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
}
