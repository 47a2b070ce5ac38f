package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality profiling — the admission gate a training-data
  * ingest runs before accepting a table version: per-column null counts,
  * distinct cardinalities, and min/max, computed in a single aggregate
  * over the data (one shuffle of one row per partition, never a
  * per-column scan).
  *
  * The reference introspects schemas at runtime (`Ingest:162-168`,
  * `stageDf.dtypes`) but never checks data quality; at 100 TB a silent
  * all-NULL column or cardinality collapse in an upstream export is the
  * kind of defect that poisons a training run, so profiling is a
  * first-class operator here.
  *
  * `exact=false` (the scale default) uses HLL++ `approx_count_distinct`:
  * no per-column distinct expansion, everything in one aggregation pass.
  * `exact=true` keeps COUNT(DISTINCT) for oracle-checkable parity —
  * Catalyst lowers the N distinct aggregates to one Expand(N groups) +
  * two-stage agg, still a bounded number of shuffles.
  */
object Profile {

  /** Per-column stats of `df` as rows `(col_name, n_nulls, n_distinct,
    * min_value, max_value)` — min/max rendered as strings so one result
    * schema covers every column type. No driver collect: the wide
    * one-row aggregate is unpivoted with `stack`. */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    // df(name) resolves by EXACT name (a dotted name must not parse as
    // a nested-field path); intermediate aliases are positional so an
    // exotic source column name can never break alias/stack grammar —
    // the original name only appears as an escaped string literal
    val aggs: Seq[Column] = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = df(f.name)
      // maps are neither orderable nor hashable: profile them as
      // null-count only instead of refusing the whole table
      val orderable = f.dataType match {
        case _: org.apache.spark.sql.types.MapType => false
        case _ => true
      }
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"c${i}__nulls"),
        (if (!orderable) lit(null).cast("long")
         else if (exact) countDistinct(c)
         else approx_count_distinct(c, 0.01)).as(s"c${i}__distinct"),
        (if (orderable) min(c).cast("string") else lit(null).cast("string"))
          .as(s"c${i}__min"),
        (if (orderable) max(c).cast("string") else lit(null).cast("string"))
          .as(s"c${i}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields.zipWithIndex.map { case (f, i) =>
      val nameLit = f.name.replace("\\", "\\\\").replace("'", "\\'")
      s"'$nameLit', c${i}__nulls, c${i}__distinct, c${i}__min, c${i}__max"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${fields.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_value, max_value)"))
  }
}
