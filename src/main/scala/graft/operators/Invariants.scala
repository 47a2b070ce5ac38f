package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A commit refused because incoming rows violate a table invariant —
  * named so writers (and specs) can catch exactly this refusal. */
final class InvariantViolation(msg: String)
  extends IllegalArgumentException(msg)

/** Commit-time table invariants — NOT NULL and CHECK constraints
  * declared once and enforced ATOMICALLY on every write that adds
  * rows (appends, overwrites, COW-update and DV-update post-images,
  * MERGE snapshots). [[Check]] gates admission as a QUERY a pipeline
  * may or may not run; invariants are the table's own refusal — the
  * Delta `ALTER TABLE ADD CONSTRAINT` / NOT NULL discipline, where a
  * violating writer fails before its commit lands and a clean table
  * can never transition to a dirty one. At 100 TB that difference is
  * an upstream export with a broken column caught at ITS write, not
  * three pipelines later by whoever aggregates next.
  *
  * Declarations ride table meta ([[MetaKey]]) — committed atomically
  * with the file list, inherited by appends, DML and OPTIMIZE, and
  * reinstated by RESTORE along with the rest of the version's
  * contract. Enforcement is ONE aggregate pass (all rules folded
  * into a single job) over the STAGED segment bytes — the exact rows
  * the commit will reference, so a non-deterministic input (rand(),
  * sampling) can never pass validation with one set of rows and land
  * another — and zero cost when no invariant is declared.
  *
  * Grammar (each rule URL-encoded, comma-joined):
  * `notnull:<col>` and `check:<name>:<sql predicate>`.
  */
object Invariants {

  private[graft] val MetaKey = "inv"

  sealed trait Rule { def name: String }
  final case class NotNull(col: String) extends Rule {
    def name: String = s"not_null($col)"
  }
  final case class CheckRule(name: String, sql: String) extends Rule

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Always emits the key — an EMPTY value is the explicit "no
    * invariants" state, which must override an inherited declaration
    * when a drop commits (absence would let the inherit path carry
    * the old rules forward). */
  private[graft] def encode(rules: Seq[Rule]): Map[String, String] =
    Map(MetaKey -> rules.map {
      case NotNull(c) => enc(s"notnull:$c")
      case CheckRule(n, sql) =>
        // ':' is the grammar separator: decode splits the entry at the
        // FIRST colon, so a name carrying one would round-trip as a
        // truncated name + a mangled (unparseable) SQL — every later
        // write then refuses on a rule the user never wrote
        require(!n.contains(':'),
          s"constraint name '$n' must not contain ':'")
        enc(s"check:$n:$sql")
    }.mkString(","))

  /** Decode a version's declared rules; malformed entries are DROPPED
    * (a hand-edited manifest must degrade to fewer gates, never fail
    * the read path that calls this). */
  private[graft] def decode(meta: Map[String, String]): Seq[Rule] =
    meta.get(MetaKey).toSeq.flatMap(_.split(',').toSeq)
      .filter(_.nonEmpty).flatMap { e =>
        try dec(e) match {
          case s if s.startsWith("notnull:") =>
            // empty column = malformed: dropped like any other bad
            // entry — NotNull("") would refuse EVERY write forever
            Some(NotNull(s.stripPrefix("notnull:")))
              .filter(_.col.nonEmpty)
          case s if s.startsWith("check:") =>
            s.stripPrefix("check:").split(":", 2) match {
              case Array(n, sql) if n.nonEmpty && sql.nonEmpty =>
                Some(CheckRule(n, sql))
              case _ => None
            }
          case _ => None
        } catch { case scala.util.control.NonFatal(_) => None }
      }

  /** Refuse `df` if any row violates any rule — ONE aggregate job for
    * the whole rule set. `what` names the refused write in the error
    * ("append", "update post-images", …). A rule referencing a column
    * the frame lacks refuses outright: the rows would land NULL /
    * unevaluable, which is exactly the state the rule forbids. */
  private[graft] def enforce(df: DataFrame, rules: Seq[Rule],
      what: String): Unit = {
    if (rules.isEmpty) return
    val cols = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    rules.foreach {
      case NotNull(c) if !cols.contains(c.toLowerCase(java.util.Locale.ROOT)) =>
        throw new InvariantViolation(
          s"$what refused: table invariant not_null($c) but the frame " +
            s"has no column '$c' (its rows would land NULL)")
      case _ => ()
    }
    val checks = rules.map {
      case NotNull(c) =>
        sum(when(col(s"`$c`").isNull, 1L).otherwise(0L))
      case CheckRule(n, sqlText) =>
        val pred =
          try expr(sqlText)
          catch { case scala.util.control.NonFatal(e) =>
            throw new InvariantViolation(
              s"$what refused: CHECK constraint $n ($sqlText) does not " +
                s"parse against the frame: ${e.getMessage}")
          }
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L))
    }
    val row =
      try df.agg(checks.head, checks.tail: _*).head()
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new InvariantViolation(
          s"$what refused: an invariant references columns the frame " +
            s"cannot resolve: ${e.getMessage}")
      }
    rules.zipWithIndex.foreach { case (r, i) =>
      val n = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (n > 0) throw new InvariantViolation(
        s"$what refused: ${r.name} violated by $n row(s) — the commit " +
          "lands nothing; fix the data or drop the invariant")
    }
  }
}
