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

  final case class Rule(name: String, violations: DataFrame)

  def notNull(df: DataFrame, cols: Seq[String]): Rule =
    Rule(s"not_null(${cols.mkString(",")})",
      df.where(cols.map(c => col(c).isNull).reduce(_ || _)))

  def unique(df: DataFrame, keys: Seq[String]): Rule =
    Rule(s"unique(${keys.mkString(",")})",
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
        .select((col("__n") - 1).as("__extra")))

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
      val c = r.violations.columns.headOption match {
        case Some("__extra") =>
          r.violations.agg(coalesce(sum(col("__extra")), lit(0L)))
        case _ => r.violations.agg(count(lit(1)))
      }
      c.select(lit(r.name).as("rule"),
        col(c.columns.head).cast("long").as("violations"))
    }.reduce(_ unionByName _)
  }
}
