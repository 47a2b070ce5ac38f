package graft.plans

import graft.operators.{Clustering, Compaction, DataMerge}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

/** Lake-maintenance DDL the reference's Delta deployment gets from
  * `OPTIMIZE` (Databricks SQL ref; the reference never compacts, which
  * is why a year of its `coalesce(1)`-per-chunk appends needs exactly
  * this statement) — grafted onto plain parquet catalog tables via an
  * injected delegating parser:
  *
  *   OPTIMIZE t ZORDER BY (c1, c2) [INTO n FILES]   -- Morton clustering
  *   OPTIMIZE t COMPACT [INTO n FILES]              -- small-file rewrite
  *   OPTIMIZE '<path>' ZORDER BY (c1) [INTO n FILES] -- snapshot table:
  *   OPTIMIZE '<path>' COMPACT [INTO n FILES]       --   rewrite committed
  *                                                  --   as a new version
  *   UPDATE '<path>' SET c = e[, ...] [WHERE p]     -- snapshot DML, each
  *   DELETE FROM '<path>' [WHERE p]                 --   one new version
  *   VACUUM '<path>' RETAIN n VERSIONS              -- snapshot retention
  *   DESCRIBE HISTORY '<path>'                      -- version log
  *   RESTORE '<path>' TO VERSION n                  -- roll back (as a commit)
  *
  * Anything not starting with OPTIMIZE/VACUUM/RESTORE/DESCRIBE HISTORY
  * goes to the delegate parser untouched, so the extension cannot
  * perturb normal SQL (plain DESCRIBE in particular stays Spark's). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    if (optimizePrefix.matcher(sqlText).lookingAt())
      parseOptimize(sqlText)
    else if (vacuumPrefix.matcher(sqlText).lookingAt())
      parseVacuum(sqlText)
    else if (historyPrefix.matcher(sqlText).lookingAt())
      parseHistory(sqlText)
    else if (detailPrefix.matcher(sqlText).lookingAt())
      parseDetail(sqlText)
    else if (changesPrefix.matcher(sqlText).lookingAt())
      parseChanges(sqlText)
    else if (restorePrefix.matcher(sqlText).lookingAt())
      parseRestore(sqlText)
    else if (clonePrefix.matcher(sqlText).lookingAt())
      parseClone(sqlText)
    else if (convertPrefix.matcher(sqlText).lookingAt())
      parseConvert(sqlText)
    else if (alterPrefix.matcher(sqlText).lookingAt())
      parseConstraint(sqlText)
    else if (bloomIdxPrefix.matcher(sqlText).lookingAt())
      parseBloomIndex(sqlText)
    // quoted-path DML: only the UPDATE '…' / DELETE FROM '…' spelling
    // is ours (snapshot tables); table-name DML stays the delegate's
    // (ResolveParquetMerge handles catalog parquet tables)
    else if (updatePathPrefix.matcher(sqlText).lookingAt())
      parseUpdatePath(sqlText)
    else if (deletePathPrefix.matcher(sqlText).lookingAt())
      parseDeletePath(sqlText)
    else delegate.parsePlan(sqlText)

  private def parseUpdatePath(sqlText: String): LogicalPlan = {
    val m = updatePathStmt.matcher(sqlText)
    if (!m.matches()) fail(sqlText,
      "expected UPDATE '<path>' SET col = expr[, ...] [WHERE cond]")
    val (setList, where) = GraftSqlParser.splitTopLevelWhere(m.group(2))
    val sets = GraftSqlParser.splitTopLevel(setList).map { a =>
      val eq = GraftSqlParser.topLevelIndexOf(a, '=')
      if (eq < 0) fail(sqlText, s"malformed assignment: $a")
      (a.substring(0, eq).trim, a.substring(eq + 1).trim)
    }
    if (sets.isEmpty) fail(sqlText, "UPDATE needs at least one assignment")
    UpdateVersionedCommand(m.group(1), sets, where)
  }

  private def parseDeletePath(sqlText: String): LogicalPlan = {
    val m = deletePathStmt.matcher(sqlText)
    if (!m.matches()) fail(sqlText,
      "expected DELETE FROM '<path>' [WHERE cond]")
    DeleteVersionedCommand(m.group(1), Option(m.group(2)).map(_.trim))
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  private def parseOptimize(sqlText: String): LogicalPlan = {
    // quoted-path forms: OPTIMIZE over a Versioned snapshot table,
    // committed as a new version (Delta's OPTIMIZE discipline)
    val zp = zorderPathStmt.matcher(sqlText)
    if (zp.matches()) {
      val cols = zp.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      if (cols.isEmpty) fail(sqlText, "ZORDER BY needs at least one column")
      return OptimizeVersionedCommand(zp.group(1),
        zorderCols = cols, files = Option(zp.group(3)).map(_.toInt))
    }
    val cp = compactPathStmt.matcher(sqlText)
    if (cp.matches())
      return OptimizeVersionedCommand(cp.group(1),
        zorderCols = Nil, files = Option(cp.group(2)).map(_.toInt))
    val z = zorderStmt.matcher(sqlText)
    if (z.matches()) {
      val cols = z.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      if (cols.isEmpty) fail(sqlText, "ZORDER BY needs at least one column")
      return OptimizeTableCommand(parseTableIdentifier(z.group(1)),
        zorderCols = cols, files = Option(z.group(3)).map(_.toInt))
    }
    val c = compactStmt.matcher(sqlText)
    if (c.matches())
      return OptimizeTableCommand(parseTableIdentifier(c.group(1)),
        zorderCols = Nil, files = Option(c.group(2)).map(_.toInt))
    fail(sqlText, "expected OPTIMIZE <table|'path'> ZORDER BY (cols) " +
      "[INTO n FILES] or OPTIMIZE <table|'path'> COMPACT [INTO n FILES]")
  }

  /** `VACUUM '<path>' RETAIN <n> VERSIONS` — retention cleanup for
    * [[graft.operators.Versioned]] snapshot tables (Delta's VACUUM,
    * version-count-based instead of hour-based: manifests beyond the
    * newest n go first, then unreferenced data segment dirs). */
  /** A statement target: quoted `'<path>'` (group q) or a
    * `catalog.namespace.table` identifier (group i) resolved against
    * a registered [[graft.sources.GraftCatalog]]. Parse-time
    * resolution on the ACTIVE session — the same session-driven-DDL
    * discipline [[DescribeChangesCommand]] uses for its schema. */
  private def target(q: String, i: String): String =
    if (q != null) q
    else {
      val spark = SparkSession.active
      val parts = delegate.parseMultipartIdentifier(i)
      if (parts.length < 2) throw new IllegalArgumentException(
        s"'$i' must be a catalog-qualified name " +
          "(catalog.namespace.table) or a quoted '<path>'")
      val cat = parts.head
      if (!spark.conf.getOption(s"spark.sql.catalog.$cat")
          .contains(classOf[graft.sources.GraftCatalog].getName))
        throw new IllegalArgumentException(
          s"'$cat' is not a registered graft catalog " +
            s"(spark.sql.catalog.$cat must name GraftCatalog)")
      val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root")
        .getOrElse(throw new IllegalArgumentException(
          s"spark.sql.catalog.$cat.root is not set"))
      (root +: parts.tail).mkString("/")
    }

  private def parseVacuum(sqlText: String): LogicalPlan = {
    val v = vacuumStmt.matcher(sqlText)
    if (v.matches())
      return VacuumVersionedCommand(target(v.group(1), v.group(2)),
        v.group(3).toInt)
    val h = vacuumHoursStmt.matcher(sqlText)
    if (h.matches())
      return VacuumHoursCommand(target(h.group(1), h.group(2)),
        h.group(3).toDouble)
    fail(sqlText, "expected VACUUM <table|'path'> RETAIN <n> VERSIONS " +
      "or VACUUM <table|'path'> OLDER THAN <n> HOURS")
  }

  /** `DESCRIBE HISTORY '<path>'` — the version log of a Versioned
    * snapshot table (Delta's DESCRIBE HISTORY, manifest-backed).
    * Non-matching text DELEGATES rather than fails: unlike OPTIMIZE/
    * VACUUM/RESTORE, a DESCRIBE-prefixed statement can be perfectly
    * valid Spark SQL — `DESCRIBE history` describes a table literally
    * named "history" and must keep doing so. */
  private def parseHistory(sqlText: String): LogicalPlan = {
    val h = historyStmt.matcher(sqlText)
    // ident form resolves through the same target() as VACUUM/CLONE;
    // an un-resolvable ident DELEGATES (`DESCRIBE history` must keep
    // describing a table literally named "history")
    if (h.matches()) targetOpt(h.group(1), h.group(2)) match {
      case Some(p) => DescribeHistoryCommand(p)
      case None => delegate.parsePlan(sqlText)
    }
    else delegate.parsePlan(sqlText)
  }

  private def parseDetail(sqlText: String): LogicalPlan = {
    val d = detailStmt.matcher(sqlText)
    if (d.matches()) targetOpt(d.group(1), d.group(2)) match {
      case Some(p) => DescribeDetailCommand(p)
      case None => delegate.parsePlan(sqlText)
    }
    else delegate.parsePlan(sqlText)
  }

  /** `DESCRIBE CHANGES '<path>' FROM <v> TO <v>` — the row-level
    * change feed (Delta's `table_changes` TVF shape) as SQL: change
    * rows of versions (from, to], tagged _change_type /
    * _commit_version. Non-matching DESCRIBE text delegates (same
    * discipline as DESCRIBE HISTORY). */
  private def parseChanges(sqlText: String): LogicalPlan = {
    val c = changesStmt.matcher(sqlText)
    if (c.matches())
      DescribeChangesCommand(target(c.group(1), c.group(2)),
        c.group(3).toLong, c.group(4).toLong)
    else delegate.parsePlan(sqlText)
  }

  /** `RESTORE '<path>' TO VERSION <n>` — roll the table's latest state
    * back to version n, recorded as a new commit (history preserved). */
  private def parseRestore(sqlText: String): LogicalPlan = {
    val r = restoreStmt.matcher(sqlText)
    if (r.matches())
      return RestoreVersionedCommand(target(r.group(1), r.group(2)),
        r.group(3).toLong)
    fail(sqlText, "expected RESTORE <table|'path'> TO VERSION <n>")
  }

  private def parseClone(sqlText: String): LogicalPlan = {
    val c = cloneStmt.matcher(sqlText)
    if (c.matches())
      return CloneVersionedCommand(target(c.group(1), c.group(2)),
        target(c.group(3), c.group(4)),
        Option(c.group(5)).map(_.toLong))
    fail(sqlText,
      "expected CLONE <src|'src path'> TO <dst|'dst path'> " +
        "[VERSION AS OF n]")
  }

  private def parseConvert(sqlText: String): LogicalPlan = {
    val c = convertStmt.matcher(sqlText)
    if (c.matches())
      return ConvertVersionedCommand(target(c.group(1), c.group(2)))
    fail(sqlText, "expected CONVERT <table|'parquet dir'> TO GRAFT")
  }

  /** ALTER TABLE is SPARK grammar — only our exact constraint shapes
    * on a quoted path or a resolvable graft-catalog ident are taken;
    * everything else (ADD/RENAME/DROP COLUMN, foreign catalogs, any
    * other ALTER) delegates untouched. */
  private def targetOpt(q: String, i: String): Option[String] =
    if (q != null) Some(q)
    else scala.util.Try(target(q, i)).toOption

  private def parseConstraint(sqlText: String): LogicalPlan = {
    val a = addCheckStmt.matcher(sqlText)
    if (a.matches()) targetOpt(a.group(1), a.group(2)).foreach { p =>
      return AddConstraintCommand(p,
        graft.operators.Invariants.CheckRule(a.group(3), a.group(4).trim))
    }
    val n = setNotNullStmt.matcher(sqlText)
    if (n.matches()) targetOpt(n.group(1), n.group(2)).foreach { p =>
      return AddConstraintCommand(p, graft.operators.Invariants.NotNull(
        n.group(3).replace("`", "")))
    }
    val d = dropConstraintStmt.matcher(sqlText)
    if (d.matches()) targetOpt(d.group(1), d.group(2)).foreach { p =>
      return DropConstraintCommand(p, d.group(3))
    }
    delegate.parsePlan(sqlText)
  }

  private def parseBloomIndex(sqlText: String): LogicalPlan = {
    val b = bloomIdxStmt.matcher(sqlText)
    if (b.matches()) {
      val cols = b.group(3).split(',').map(_.trim.replace("`", ""))
        .filter(_.nonEmpty).toSeq
      if (cols.isEmpty) fail(sqlText, "BLOOMFILTER INDEX needs columns")
      return BloomIndexCommand(target(b.group(1), b.group(2)), cols,
        Option(b.group(4)).map(_.toDouble).getOrElse(0.03))
    }
    fail(sqlText, "expected CREATE BLOOMFILTER INDEX ON <table|'path'> " +
      "(col[, col]...) [FPP p]")
  }

  /** Malformed OPTIMIZE: let the DELEGATE produce the ParseException
    * (OPTIMIZE is not in Spark's grammar), so error shape/metadata match
    * every other syntax error the user sees. */
  private def fail(sql: String, msg: String): Nothing = {
    delegate.parsePlan(sql)
    throw new IllegalStateException(msg) // unreachable: delegate throws
  }
}

object GraftSqlParser {
  private val optimizePrefix =
    java.util.regex.Pattern.compile("""\s*(?i:OPTIMIZE)\b""")
  private val zorderStmt = java.util.regex.Pattern.compile(
    """(?is)\s*OPTIMIZE\s+([\w.`]+)\s+ZORDER\s+BY\s*\(([^)]*)\)""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*""")
  private val compactStmt = java.util.regex.Pattern.compile(
    """(?is)\s*OPTIMIZE\s+([\w.`]+)\s+COMPACT""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*""")
  private val zorderPathStmt = java.util.regex.Pattern.compile(
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*\(([^)]*)\)""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*""")
  private val compactPathStmt = java.util.regex.Pattern.compile(
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+COMPACT""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*""")
  private val vacuumPrefix =
    java.util.regex.Pattern.compile("""\s*(?i:VACUUM)\b""")
  // statement targets: quoted '<path>' OR a catalog.ns.table ident
  private val Tgt = """(?:'([^']+)'|([\w.`]+))"""
  private val vacuumStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*VACUUM\\s+$Tgt\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*""")
  private val vacuumHoursStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*VACUUM\\s+$Tgt\\s+OLDER\\s+THAN\\s+(\\d+(?:\\.\\d+)?)\\s+HOURS\\s*;?\\s*""")
  // DESCRIBE alone is Spark grammar — only the two-word forms are ours
  private val historyPrefix = java.util.regex.Pattern.compile(
    """\s*(?i:DESCRIBE\s+HISTORY)\b""")
  private val historyStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$Tgt\\s*;?\\s*""")
  private val detailPrefix = java.util.regex.Pattern.compile(
    """\s*(?i:DESCRIBE\s+DETAIL)\b""")
  private val detailStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+$Tgt\\s*;?\\s*""")
  private val changesPrefix = java.util.regex.Pattern.compile(
    """\s*(?i:DESCRIBE\s+CHANGES)\b""")
  private val changesStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*DESCRIBE\\s+CHANGES\\s+$Tgt\\s+FROM\\s+(\\d+)\\s+TO\\s+(\\d+)\\s*;?\\s*""")
  private val restorePrefix =
    java.util.regex.Pattern.compile("""\s*(?i:RESTORE)\b""")
  private val restoreStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*RESTORE\\s+$Tgt\\s+TO\\s+VERSION\\s+(\\d+)\\s*;?\\s*""")
  private val clonePrefix =
    java.util.regex.Pattern.compile("""\s*(?i:CLONE)\b""")
  private val convertPrefix =
    java.util.regex.Pattern.compile("""\s*(?i:CONVERT)\b""")
  private val convertStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*CONVERT\\s+$Tgt\\s+TO\\s+GRAFT\\s*;?\\s*""")
  private val cloneStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*CLONE\\s+$Tgt\\s+TO\\s+$Tgt""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""")
  private val alterPrefix =
    java.util.regex.Pattern.compile("""\s*(?i:ALTER\s+TABLE)\b""")
  private val addCheckStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tgt\\s+ADD\\s+CONSTRAINT\\s+""" +
      """(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""")
  private val setNotNullStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tgt\\s+ALTER\\s+COLUMN\\s+""" +
      """([\w`]+)\s+SET\s+NOT\s+NULL\s*;?\s*""")
  private val dropConstraintStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tgt\\s+DROP\\s+CONSTRAINT\\s+""" +
      """([\w()`,]+)\s*;?\s*""")
  private val bloomIdxPrefix = java.util.regex.Pattern.compile(
    """\s*(?i:CREATE\s+BLOOMFILTER\s+INDEX)\b""")
  private val bloomIdxStmt = java.util.regex.Pattern.compile(
    s"""(?is)\\s*CREATE\\s+BLOOMFILTER\\s+INDEX\\s+ON\\s+$Tgt\\s*""" +
      """\(([^)]*)\)(?:\s+FPP\s+(\d*\.?\d+))?\s*;?\s*""")
  private val updatePathPrefix =
    java.util.regex.Pattern.compile("""\s*(?i:UPDATE)\s+'""")
  // the SET-list/WHERE split happens AFTER the match, quote-aware
  // (splitTopLevelWhere): a regex split would bind the first ' WHERE '
  // even inside a string literal (SET msg = 'x WHERE 1')
  private val updatePathStmt = java.util.regex.Pattern.compile(
    """(?is)\s*UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s*;?\s*""")
  private val deletePathPrefix =
    java.util.regex.Pattern.compile("""\s*(?i:DELETE\s+FROM)\s+'""")
  private val deletePathStmt = java.util.regex.Pattern.compile(
    """(?is)\s*DELETE\s+FROM\s+'([^']+)'(?:\s+WHERE\s+(.+?))?\s*;?\s*""")

  /** Split on commas at paren/quote/backtick depth 0 (assignment lists
    * contain function calls, string literals, and backquoted names). */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false; var inTick = false
    s.foreach {
      case '\'' if !inTick => inStr = !inStr; cur += '\''
      case c if inStr => cur += c
      case '`' => inTick = !inTick; cur += '`'
      case c if inTick => cur += c
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** First index of `ch` at paren/quote/backtick depth 0, or -1.
    * Backquoted identifiers may legally contain any char (including
    * parens and the target char) — they must be opaque here. */
  private[plans] def topLevelIndexOf(s: String, ch: Char): Int = {
    var depth = 0; var inStr = false; var inTick = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inTick && c == '\'') inStr = !inStr
      else if (!inStr && c == '`') inTick = !inTick
      else if (!inStr && !inTick && c == '(') depth += 1
      else if (!inStr && !inTick && c == ')') depth -= 1
      else if (!inStr && !inTick && depth == 0 && c == ch) return i
      i += 1
    }
    -1
  }

  /** Split at the first WHERE keyword at paren/quote/backtick depth 0:
    * (before, Some(after)) or (s, None). Subquery WHEREs sit at depth
    * > 0, literal WHEREs inside quotes, and `where`-named backquoted
    * identifiers inside backticks — all stay with the assignment list.
    * Boundary: whitespace before, any NON-IDENTIFIER char (or EOS)
    * after — `WHERE(k=1)` is a valid split point; `WHEREx` is not. */
  private[plans] def splitTopLevelWhere(s: String): (String, Option[String]) = {
    var depth = 0; var inStr = false; var inTick = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inTick && c == '\'') inStr = !inStr
      else if (!inStr && c == '`') inTick = !inTick
      else if (!inStr && !inTick) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && (c == 'w' || c == 'W') &&
            i + 5 <= s.length &&
            s.regionMatches(true, i, "WHERE", 0, 5) &&
            (i == 0 || s.charAt(i - 1).isWhitespace) &&
            (i + 5 == s.length || {
              val n = s.charAt(i + 5)
              !(n.isLetterOrDigit || n == '_')
            }))
          return (s.substring(0, i).trim,
            Some(s.substring(i + 5).trim).filter(_.nonEmpty))
      }
      i += 1
    }
    (s.trim, None)
  }
}

/** Eagerly-executed VACUUM over a Versioned snapshot table: drops all
  * but the newest `keepLast` versions, then sweeps data segments no
  * surviving manifest references. Returns (versions_kept,
  * versions_dropped) as a single row. */
case class VacuumVersionedCommand(path: String, keepLast: Int)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("versions_kept", LongType, nullable = false)(),
      AttributeReference("versions_dropped", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(keepLast >= 1, "VACUUM must retain at least 1 version")
    val before = graft.operators.Versioned.versions(spark, path).size
    graft.operators.Versioned.vacuum(spark, path, keepLast)
    val after = graft.operators.Versioned.versions(spark, path).size
    Seq(Row(after.toLong, (before - after).toLong))
  }
}

/** `VACUUM '<path>' OLDER THAN <n> HOURS` — time-based retention
  * (Delta's hour-based VACUUM shape): every version whose commit time
  * is older than the horizon is dropped, except the latest, which
  * survives regardless of age; then unreferenced data segments and dv
  * sidecars are swept. Returns (versions_kept, versions_dropped). */
case class VacuumHoursCommand(path: String, hours: Double)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("versions_kept", LongType, nullable = false)(),
      AttributeReference("versions_dropped", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = graft.operators.Versioned
      .vacuumOlderThan(spark, path, hours)
    val kept = graft.operators.Versioned.versions(spark, path).size
    Seq(Row(kept.toLong, dropped.toLong))
  }
}

/** Eagerly-executed DESCRIBE HISTORY over a Versioned snapshot table:
  * one row per committed version — number, commit time (manifest
  * mtime), file count, and the `k=v` metadata the committer attached
  * (streaming sinks record their folded batchId here). Reads only the
  * manifest log, never the data. */
case class DescribeHistoryCommand(path: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("committed_at", TimestampType, nullable = false)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("meta", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    graft.operators.Versioned.history(spark, path).map {
      case (v, ts, n, meta) => Row(v, ts, n, meta)
    }
}

/** `DESCRIBE DETAIL '<path>'` (Delta parity): one row summarizing the
  * LATEST version of a snapshot table — location, current version,
  * version count, file count, total bytes, and row count. Row count
  * comes from the manifest's per-file statistics (null when any file
  * predates stats — never a guess, never a data scan); bytes from one
  * file-status probe per file. A pure metadata operation at any
  * scale. */
case class DescribeDetailCommand(path: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("location", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("n_versions", LongType, nullable = false)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("n_rows", LongType, nullable = true)(),
      AttributeReference("bucket_spec", StringType, nullable = true)(),
      AttributeReference("constraints", StringType, nullable = true)(),
      AttributeReference("bloom_index", StringType, nullable = true)(),
      AttributeReference("widened_schema", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.operators.Versioned
    val versions = Versioned.versions(spark, path)
    require(versions.nonEmpty, s"no committed version in $path")
    val files = Versioned.versionFiles(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = Versioned.fileStats(spark, path)
    // bytes from the manifest's bytes= stat where present; a
    // file-status probe only for legacy (pre-bytes) lines
    val bytes = files.map(f =>
      stats.get(f).flatMap(_.bytes).getOrElse(
        fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)).sum
    // deletion vectors subtract exactly: per-file deleted counts ride
    // the manifest line, so the row count stays metadata-only under
    // merge-on-read deletes
    val dvDeleted = Versioned.dvDeletedCounts(spark, path).values.sum
    val rows: Any =
      if (files.forall(stats.contains))
        files.map(stats(_).rows).sum - dvDeleted
      else null
    // surfacing the layout here is what lets an operator ASK whether a
    // table still carries its storage-partitioned-join contract
    val bucket = Versioned.bucketSpec(spark, path)
      .map { case (c, n) => s"bucket($n, $c)" }.orNull
    // the table's declared CONTRACT, same discoverability purpose:
    // invariants gating writes, the bloom-indexed lookup columns, and
    // the widened declared schema (NULL = none declared)
    val meta = Versioned.readMeta(spark, path, versions.last)
    val constraints = {
      val inv = Versioned.invariants(spark, path)
      if (inv.isEmpty) null else inv.map(_.name).mkString("; ")
    }
    val bloom = graft.operators.BloomIndex.declared(meta)
      .map { case (cols, fpp) => s"bloom(${cols.mkString(", ")}) fpp=$fpp" }
      .orNull
    val widened = Versioned.schemaCarrier(spark, path)
      .map(_.toDDL).orNull
    Seq(Row(path, versions.last, versions.size.toLong,
      files.size.toLong, bytes, rows, bucket, constraints, bloom, widened))
  }
}

/** `DESCRIBE CHANGES '<path>' FROM <from> TO <to>` — the row-level
  * change feed as SQL (Delta's `table_changes` TVF shape): the change
  * rows of versions (from, to], each tagged `_change_type` /
  * `_commit_version` ([[graft.operators.Versioned.rowChanges]]
  * semantics: carried rows cancel, OPTIMIZE emits nothing, DV deltas
  * surface). The output schema is the table's schema plus the two tag
  * columns, resolved when the statement is analyzed.
  *
  * Command results return THROUGH THE DRIVER — right for inspecting a
  * feed window, wrong for bulk consumption: a pipeline tails
  * `rowChanges` (DataFrame) or the `graft-changes` streaming source's
  * `readChangeFeed` option, both fully distributed. */
case class DescribeChangesCommand(path: String, fromV: Long, toV: Long)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.Attribute

  // resolved at analysis: DESCRIBE CHANGES is session-driven DDL, so
  // the active session is the statement's session by construction
  override lazy val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      graft.operators.Versioned.rowChanges(
        SparkSession.active, path, fromV, toV).schema)

  override def run(spark: SparkSession): Seq[Row] =
    graft.operators.Versioned.rowChanges(spark, path, fromV, toV)
      .collect().toIndexedSeq
}

/** Eagerly-executed RESTORE: the latest state becomes version `v`'s
  * file list again, recorded as a NEW commit (no data copied; the
  * rolled-back states stay readable until VACUUM — Delta's RESTORE
  * discipline). Returns (restored_to, new_version). */
case class RestoreVersionedCommand(path: String, v: Long)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("restored_to", LongType, nullable = false)(),
      AttributeReference("new_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val nv = graft.operators.Versioned.restore(spark, path, v)
    Seq(Row(v, nv))
  }
}

/** `CONVERT '<dir>' TO GRAFT` — in-place import of a plain parquet
  * directory into the snapshot format
  * ([[graft.operators.Versioned.convert]]): version 0 references the
  * dir's own files, nothing is rewritten. Returns (new version,
  * files imported). */
case class ConvertVersionedCommand(path: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("files_imported", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = graft.operators.Versioned.convert(spark, path)
    val n = graft.operators.Versioned
      .versionFiles(spark, path, Some(v)).size.toLong
    Seq(Row(v, n))
  }
}

/** `CLONE '<src>' TO '<dst>' [VERSION AS OF n]` — zero-copy shallow
  * clone ([[graft.operators.Versioned.shallowClone]]): one manifest
  * write re-referencing the source's files absolutely; the clone then
  * evolves independently. Returns (source version cloned, the clone's
  * new version). */
case class CloneVersionedCommand(src: String, dst: String,
    version: Option[Long]) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("cloned_version", LongType, nullable = false)(),
      AttributeReference("new_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val sv = version.getOrElse(
      graft.operators.Versioned.versions(spark, src).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"no committed version in $src")))
    val nv = graft.operators.Versioned.shallowClone(spark, src, dst,
      Some(sv))
    Seq(Row(sv, nv))
  }
}

/** `ALTER TABLE <t> ADD CONSTRAINT n CHECK (…)` / `ALTER COLUMN c SET
  * NOT NULL` — declare a commit-time invariant
  * ([[graft.operators.Versioned.addInvariants]]: existing data
  * validated first, every later row-adding write gated atomically).
  * Returns the metadata commit's version. */
case class AddConstraintCommand(path: String,
    rule: graft.operators.Invariants.Rule) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("new_version",
      org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.operators.Versioned.addInvariants(spark, path, Seq(rule))))
}

/** `ALTER TABLE <t> DROP CONSTRAINT <name>` — drop a declared
  * invariant by name. Returns the metadata commit's version. */
case class DropConstraintCommand(path: String, name: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("new_version",
      org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.operators.Versioned.dropInvariant(spark, path, name)))
}

/** `CREATE BLOOMFILTER INDEX ON <t> (cols) [FPP p]` — declare and
  * backfill the point-lookup bloom index
  * ([[graft.operators.Versioned.declareBloomIndex]]). Returns the
  * commit's version. */
case class BloomIndexCommand(path: String, cols: Seq[String], fpp: Double)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("new_version",
      org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.operators.Versioned.declareBloomIndex(spark, path,
      cols, fpp)))
}

/** Eagerly-executed UPDATE over a Versioned snapshot table
  * (`UPDATE '<path>' SET … [WHERE …]`): standard UPDATE semantics —
  * all assignments evaluate against the ORIGINAL row (one simultaneous
  * select), only rows where the predicate is TRUE change (NULL keeps
  * the row untouched) — committed as ONE new `operation=update`
  * version; the pre-update state stays time-travelable until VACUUM.
  * Returns n_updated. */
case class UpdateVersionedCommand(path: String,
    sets: Seq[(String, String)], where: Option[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.functions.{coalesce, expr, lit, when}
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("n_updated", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SnapshotDml.update(spark, path,
      sets.map { case (c, e) => (c, expr(e)) },
      where.map(expr))))
}

/** Eagerly-executed DELETE over a Versioned snapshot table
  * (`DELETE FROM '<path>' [WHERE …]`): survivors committed as ONE new
  * `operation=delete` version, SQL NULL-predicate rows kept. Returns
  * n_deleted. */
case class DeleteVersionedCommand(path: String, where: Option[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("n_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SnapshotDml.delete(spark, path, where.map(expr))))
}

/** Shared UPDATE/DELETE core over Versioned snapshot tables — driven
  * by the quoted-path statements (string-parsed expressions) AND the
  * catalog-table (v2 relation) lowerings, which hand in name-rebound
  * catalyst expressions. Semantics: standard simultaneous-SET UPDATE
  * (every expr evaluates against the original row; NULL predicate
  * keeps the row), SQL DELETE (NULL-predicate rows kept). Cost shape:
  * copy-on-write scoped through manifest stats (segments provably
  * free of matches are carried verbatim), or merge-on-read deletion
  * vectors under `spark.graft.update.mode=dv` /
  * `spark.graft.delete.mode=dv`. */
private[plans] object SnapshotDml {
  import graft.operators.Versioned
  import graft.sources.StatsPruner
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}

  private def scopeOf(spark: SparkSession, path: String, raw: Column)
      : (graft.operators.SegmentStats.FileStats => Boolean,
        String => Boolean) = {
    val df = Versioned.read(spark, path)
    // under a column mapping the optimizer pushes the predicate
    // through the rename projection, leaving Filter nodes on PHYSICAL
    // names — translate them back so they key the logical-space stats
    // the rewrite hands to this scope
    val mapping = Versioned.columnMapping(spark, path)
    val filters = StatsPruner.pushableFilters(df.where(raw),
      mapping.logicalOf)
    val stats: graft.operators.SegmentStats.FileStats => Boolean =
      if (filters.isEmpty) _ => true
      else st => filters.forall(StatsPruner.mayMatch(st, _))
    // bloom point-lookup scoping: an equality DML on an indexed
    // high-cardinality key (DELETE WHERE id = …) touches only the
    // files whose sidecars may hold the key — min/max cannot say
    (stats, Versioned.bloomLinePruner(spark, path, filters))
  }

  def update(spark: SparkSession, path: String,
      sets: Seq[(String, Column)], where: Option[Column]): Long = {
    val df = Versioned.read(spark, path)
    val byName = df.columns.map(c => c.toLowerCase -> c).toMap
    val resolved = sets.map { case (target, e) =>
      val c = byName.getOrElse(target.toLowerCase,
        throw new IllegalArgumentException(
          s"UPDATE target column '$target' not in ${df.columns.mkString(", ")}"))
      (c, e)
    }
    // standard SQL rejects duplicate assignment targets; silently
    // keeping the last one (toMap) would make `SET x=1, x=2` a quiet
    // coin-flip for the user
    val dupTargets = resolved.groupBy(_._1).collect {
      case (c, as) if as.size > 1 => c
    }
    require(dupTargets.isEmpty,
      s"duplicate UPDATE assignment target(s): ${dupTargets.mkString(", ")}")
    // raw predicate for stats scoping (filter semantics already drop
    // NULL rows); the coalesce wrapper is only for the SET branches
    val raw = where.getOrElse(lit(true))
    val cond = coalesce(raw, lit(false))
    val assigned = resolved.toMap
    val (scope, lineScope) = scopeOf(spark, path, raw)
    // merge-on-read routing: under the conf, matched rows are
    // DV-deleted and their post-images appended — a 10-row update
    // costs a sidecar + a 10-row segment, never a segment rewrite
    val useDv = spark.conf.getOption("spark.graft.update.mode")
      .exists(_.trim.equalsIgnoreCase("dv"))
    if (useDv)
      Versioned.updateWithDv(spark, path, scope, raw, { matched =>
        // the transform sees ONLY matched rows, so assignments apply
        // unconditionally (standard simultaneous-SET semantics)
        matched.select(matched.columns.toIndexedSeq.map { c =>
          assigned.get(c)
            .map(e => e.cast(matched.schema(c).dataType).as(c))
            .getOrElse(col(c))
        }: _*)
      }, lineScope)
    else {
      val (n, _, _) = Versioned.rewrite(spark, path, scope, raw, { subset =>
        subset.select(subset.columns.toIndexedSeq.map { c =>
          assigned.get(c)
            .map(e => when(cond, e.cast(subset.schema(c).dataType))
              .otherwise(col(c)).as(c))
            .getOrElse(col(c))
        }: _*)
      }, Map("operation" -> "update"), lineScope)
      n
    }
  }

  def delete(spark: SparkSession, path: String,
      where: Option[Column]): Long = {
    val raw = where.getOrElse(lit(true))
    val cond = coalesce(raw, lit(false))
    val (scope, lineScope) = scopeOf(spark, path, raw)
    // merge-on-read routing (Delta's delta.enableDeletionVectors):
    // under the conf, the delete commits a deletion-vector sidecar
    // instead of rewriting segments — a one-row delete stops costing
    // a segment write; OPTIMIZE folds the vectors back into files
    val useDv = spark.conf.getOption("spark.graft.delete.mode")
      .exists(_.trim.equalsIgnoreCase("dv"))
    if (useDv)
      // filter semantics: NULL-predicate rows are kept, i.e. deleted
      // rows are exactly those where cond IS TRUE
      Versioned.deleteWithDv(spark, path, scope, cond, lineScope)
    else {
      val (n, _, _) = Versioned.rewrite(spark, path, scope, raw,
        subset => subset.where(not(cond)),
        Map("operation" -> "delete"), lineScope)
      n
    }
  }
}

/** Catalog-table (v2 relation) UPDATE on a snapshot table: `UPDATE
  * graft.ns.t SET … [WHERE …]` — the analyzer resolves the
  * assignments/condition against the relation; they are re-rooted by
  * NAME over [[SnapshotDml]]'s fresh read, keeping the stats-scoped
  * COW (or conf-routed DV) write-back identical to the quoted-path
  * form. Returns n_updated. */
case class UpdateSnapshotV2Command(path: String,
    sets: Seq[(String, Expression)], where: Option[Expression])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("n_updated",
      org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.GraftShims.rebindByName
    Seq(Row(SnapshotDml.update(spark, path,
      sets.map { case (c, e) => (c, rebindByName(e)) },
      where.map(rebindByName))))
  }
}

/** Catalog-table (v2 relation) DELETE on a snapshot table — handles
  * ARBITRARY conditions (the SupportsDelete pushdown path only covers
  * translatable filters; this command is the analyzer-stage lowering
  * that takes the rest). Returns n_deleted. */
case class DeleteSnapshotV2Command(path: String,
    where: Option[Expression]) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("n_deleted",
      org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.GraftShims.rebindByName
    Seq(Row(SnapshotDml.delete(spark, path, where.map(rebindByName))))
  }
}

/** Eagerly-executed OPTIMIZE over a Versioned snapshot table
  * (`OPTIMIZE '<path>' …`): the latest version's rows are rewritten
  * z-order-clustered or compacted and committed as a NEW version —
  * readers at any point see a complete snapshot, the pre-optimize
  * layout stays time-travelable until VACUUM, and the manifest records
  * `operation=optimize`. Content is preserved exactly. Returns
  * (new_version, files_before, files_after). */
case class OptimizeVersionedCommand(path: String, zorderCols: Seq[String],
    files: Option[Int]) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("new_version", LongType, nullable = false)(),
      AttributeReference("files_before", LongType, nullable = false)(),
      AttributeReference("files_after", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.operators.Versioned
    // optimistic read-cluster-overwrite: the rewritten snapshot is
    // exactly what was READ, so a commit landing mid-cycle (streaming
    // append, DML) would be silently dropped by an unconditional
    // overwrite. commitIf asserts the base version is still the one
    // read; on conflict the whole cycle recomputes against the new
    // latest (content-preserving, so retrying is always safe).
    // size-thresholded partial compaction (Delta's OPTIMIZE bin-pack):
    // under the conf, a plain COMPACT reads ONLY files below the
    // threshold and carries everything else verbatim — at scale,
    // OPTIMIZE folds last night's small streaming commits instead of
    // rewriting the table; on a bucketed table only the small rows
    // re-shuffle, into the declared layout. ZORDER and INTO n FILES
    // keep the whole-rewrite semantics (clustering is global by
    // nature; the threshold conf does not apply).
    val minFileBytes = spark.conf
      .getOption("spark.graft.optimize.minFileBytes").map(_.trim.toLong)
    minFileBytes match {
      case Some(th) if zorderCols.isEmpty && files.isEmpty =>
        val before = Versioned.versionFiles(spark, path).size
        return Versioned.compactSmall(spark, path, th) match {
          case Some((nv, _, _)) =>
            val after = Versioned.versionFiles(spark, path, Some(nv)).size
            Seq(Row(nv, before.toLong, after.toLong))
          case None => // nothing under threshold: metadata no-op
            Seq(Row(Versioned.versions(spark, path).last,
              before.toLong, before.toLong))
        }
      case _ => ()
    }
    var attempt = 0
    while (attempt < 5) {
      val base = Versioned.versions(spark, path).lastOption.getOrElse(
        throw new IllegalArgumentException(s"no committed version in $path"))
      val before = Versioned.versionFiles(spark, path, Some(base)).size
      val df = Versioned.read(spark, path, Some(base))
      // A bucketed base version keeps its layout through maintenance:
      // compaction rewrites each bucket to one file and ZORDER
      // clusters WITHIN buckets (the bucket hash is the
      // macro-clustering; the z-sort orders inside it), so OPTIMIZE
      // never silently destroys the storage-partitioned-join layout a
      // table paid a write-time shuffle for. `INTO n FILES` is
      // meaningless under a fixed bucket count and is rejected rather
      // than half-honored. Unbucketed tables rewrite exactly as
      // before.
      val spec = Versioned.bucketSpec(spark, path, Some(base))
      val committed = spec match {
        case Some((bc, n)) =>
          require(files.isEmpty,
            s"OPTIMIZE INTO FILES on bucketed table $path: the layout " +
              s"fixes the segment at $n bucket files; drop the INTO " +
              "clause (or de-bucket with a plain commit first)")
          val (rdf, sortCols) =
            if (zorderCols.nonEmpty)
              (Clustering.withZValue(df, zorderCols), Seq("__z"))
            else (df, Nil)
          Versioned.commitIf(rdf, path, "overwrite",
            Map("operation" -> "optimize"), expectedBase = base,
            bucket = Some((bc, n)), sortWithinBuckets = sortCols)
        case None =>
          val rewritten =
            if (zorderCols.nonEmpty) {
              val n = files.getOrElse(math.max(1, before))
              Clustering.withZValue(df, zorderCols)
                .repartitionByRange(n, col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            } else df.coalesce(files.getOrElse(1))
          Versioned.commitIf(rewritten, path, "overwrite",
            Map("operation" -> "optimize"), expectedBase = base)
      }
      committed match {
        case Some(v) =>
          val after = Versioned.versionFiles(spark, path, Some(v)).size
          return Seq(Row(v, before.toLong, after.toLong))
        case None => attempt += 1
      }
    }
    throw new Versioned.CommitRaceExhausted(s"OPTIMIZE of $path", attempt)
  }
}

/** Eagerly-executed OPTIMIZE: rewrites the table's files (z-order
  * clustered or compacted) through the staged-overwrite commit, so
  * readers never observe a half-rewritten directory. Content is
  * preserved exactly; only the file layout changes. */
case class OptimizeTableCommand(table: TableIdentifier,
    zorderCols: Seq[String], files: Option[Int]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val meta = spark.sessionState.catalog.getTableMetadata(table)
    require(meta.provider.exists(_.equalsIgnoreCase("parquet")),
      s"OPTIMIZE supports parquet tables, got ${meta.provider}")
    require(zorderCols.isEmpty ||
      !zorderCols.exists(c => meta.partitionColumnNames
        .exists(_.equalsIgnoreCase(c))),
      "ZORDER BY columns must not be partition columns")
    val path = meta.location.toString
    if (meta.partitionColumnNames.nonEmpty) {
      // partitioned tables operate LEAF-BY-LEAF (any partition depth):
      // COMPACT rewrites only leaves over the threshold; ZORDER
      // clusters WITHIN each leaf independently (per-leaf quantile
      // boundaries — the same scoping Delta's OPTIMIZE ZORDER uses),
      // so a predicate on a clustered column prunes files inside every
      // partition a query reaches.
      if (zorderCols.nonEmpty)
        // leaf dirs are disjoint and each z-order stages under its own
        // hidden sibling — same independent-job shape the COMPACT
        // branch already parallelizes
        graft.operators.DriverPar.foreach(
          Compaction.leafPartitionDirs(spark, path), maxThreads = 8)(
          leaf => zorderDir(spark, leaf))
      else
        Compaction.compactLeaves(spark, path,
          maxFiles = files.getOrElse(1), targetFiles = files.getOrElse(1))
    } else if (zorderCols.nonEmpty) {
      zorderDir(spark, path)
    } else {
      Compaction.compact(spark, path, files.getOrElse(1))
    }
    spark.catalog.refreshTable(table.quotedString)
    Seq.empty
  }

  /** Z-order one directory in place through the staged-overwrite commit. */
  private def zorderDir(spark: SparkSession, dir: String): Unit = {
    val df = spark.read.parquet(dir)
    val n = files.getOrElse(math.max(1, Compaction.fileCount(spark, dir)))
    val clustered = Clustering.withZValue(df, zorderCols)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    DataMerge.stagedOverwrite(spark, dir, clustered, Nil)
  }
}
