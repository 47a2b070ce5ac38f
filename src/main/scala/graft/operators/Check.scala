package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative admission rules evaluated as
  * ONE result frame of `(rule, violations)` counts (the Delta Live
  * Tables "expectations" concept re-expressed on open Spark: a gate the
  * reference entirely lacks, which at 100 TB is how a bad upstream
  * export is caught before it lands in the lake).
  *
  * Each rule is a violation-counting plan, so the whole check suite is
  * a union of small aggregates — Catalyst shares scans where it can and
  * every rule is expressible as a declarative predicate:
  *
  *  - `notNull`: rows where any listed column is NULL
  *  - `unique`: key tuples occurring more than once (counts EXTRA rows)
  *  - `referential`: child rows whose key has no parent (anti join)
  *  - `satisfies`: rows violating an arbitrary boolean predicate
  */
object Check {

  /** `sumColumn` carries the rule KIND explicitly: Some(c) means the
    * violation count is SUM(c) over the frame, None means COUNT(*).
    * Sniffing it from the frame's first column name would silently
    * mis-count any user frame that happens to carry that name. */
  final case class Rule(name: String, violations: DataFrame,
      sumColumn: Option[String] = None)

  def notNull(df: DataFrame, cols: Seq[String]): Rule = {
    require(cols.nonEmpty, "notNull needs at least one column")
    Rule(s"not_null(${cols.mkString(",")})",
      df.where(cols.map(c => col(c).isNull).reduce(_ || _)))
  }

  def unique(df: DataFrame, keys: Seq[String]): Rule = {
    require(keys.nonEmpty, "unique needs at least one key column")
    Rule(s"unique(${keys.mkString(",")})",
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
        .select((col("__n") - 1).as("__extra")),
      sumColumn = Some("__extra"))
  }

  /** SQL FK semantics: a NULL child key SATISFIES the constraint (use
    * `notNull` to forbid it) — without the filter the anti join would
    * count every NULL-keyed row as an orphan. */
  def referential(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): Rule =
    Rule(s"ref($childKey->$parentKey)",
      child.where(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)),
          Seq(childKey), "left_anti"))

  def satisfies(df: DataFrame, name: String, predicate: Column): Rule =
    Rule(name, df.where(!coalesce(predicate, lit(false))))

  /** Evaluate all rules → one frame `(rule, violations)`; `unique` sums
    * the extra copies, everything else counts violating rows. */
  def run(rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Check.run needs at least one rule")
    rules.map { r =>
      val c = r.sumColumn match {
        case Some(sc) =>
          r.violations.agg(coalesce(sum(col(sc)), lit(0L)))
        case None => r.violations.agg(count(lit(1)))
      }
      c.select(lit(r.name).as("rule"),
        col(c.columns.head).cast("long").as("violations"))
    }.reduce(_ unionByName _)
  }
}
