package graft.sources

import graft.operators.SegmentStats.FileStats
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._

/** Metadata-only aggregates over a snapshot version's manifest
  * statistics (the Delta "metadata-only query" behavior — e.g.
  * `SELECT count(*) FROM t` answered without opening a single data
  * file; see reference deployment note at
  * PostgresToDataLake_Ingestion_Notebook.py:309 where row counts
  * drive volume routing).
  *
  * A fully-pushed, filterless, group-less aggregation whose every
  * function is answerable from per-file stats collapses to ONE
  * pre-computed row served by a [[LocalScan]] — at 100 TB the scan
  * schedules zero tasks and reads zero bytes; the answer comes from
  * the same single manifest read that planned the query.
  *
  * Answerable, with PROOF-or-bail semantics (any file missing the
  * needed figure makes the whole answer `None` and the scan falls
  * back to the delegate — never a guess):
  *  - `COUNT(*)`: sum of manifest row counts; needs stats on every
  *    file.
  *  - `COUNT(col)` (non-distinct): rows − null-count per file; a
  *    stats-bearing file whose map lacks `col` PREDATES the column
  *    (reads all-NULL, contributes 0 — additive evolution, see
  *    [[graft.operators.SegmentStats]]).
  *  - `MIN/MAX(col)` for exactly-ordered types only (integral, date,
  *    timestamp, boolean): fold of per-file bounds over files with at
  *    least one non-NULL value. Strings are excluded — parquet
  *    writers may truncate binary footer bounds, which keeps them
  *    sound for PRUNING (a widened range never drops a match) but
  *    not as an ANSWER; floats are excluded because NaN never enters
  *    footer bounds yet sorts last in Spark.
  *
  * Ambiguity never answers: a column name matching several table
  * fields case-insensitively, a dotted reference, a DISTINCT count,
  * any group-by, or any pushed filter all bail to the real scan.
  */
object ManifestAggregates {

  /** The one-row answer, or None when any part is not provable from
    * the manifest alone. */
  def answer(stats: Map[String, FileStats], files: Seq[String],
      tableSchema: StructType,
      agg: Aggregation): Option[(StructType, InternalRow)] = try {
    if (agg.groupByExpressions.nonEmpty) return None
    if (!files.forall(stats.contains)) return None
    val fss = files.map(stats(_))
    val parts = agg.aggregateExpressions.toSeq
      .map(answerOne(_, fss, tableSchema))
    if (parts.exists(_.isEmpty)) None
    else {
      val (fields, values) = parts.flatten.unzip
      Some(StructType(fields) -> InternalRow.fromSeq(values))
    }
  } catch {
    // malformed or drifted stats (hand-edited manifest, type-evolved
    // table whose old files carry another class's encoding) must
    // degrade to the real scan, never fail the query at plan time —
    // the same posture as StatsPruner.mayMatch
    case scala.util.control.NonFatal(_) => None
  }

  private def answerOne(f: AggregateFunc, fss: Seq[FileStats],
      schema: StructType): Option[(StructField, Any)] = f match {
    case _: CountStar =>
      Some(StructField("count_star", LongType, nullable = false) ->
        fss.map(_.rows).sum)
    case c: Count if !c.isDistinct =>
      for {
        n <- colName(c.column)
        _ <- fieldOf(schema, n)
        // Locale.ROOT like every other stats-key lookup: under tr_TR
        // a default-locale lowercase of "ID" misses the "id"-keyed
        // stats and answers count() as 0 instead of falling back
        cnt <- countNonNull(fss, n.toLowerCase(java.util.Locale.ROOT))
      } yield StructField(s"count_$n", LongType, nullable = false) -> cnt
    case m: Min => bound(m.column, fss, schema, isMin = true)
    case m: Max => bound(m.column, fss, schema, isMin = false)
    case _ => None
  }

  private def colName(
      e: org.apache.spark.sql.connector.expressions.Expression):
      Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** The UNIQUE case-insensitive schema match — several fields
    * differing only in case would make "absent from a file's stats
    * map" ambiguous (colliding names are dropped at harvest time), so
    * ambiguity refuses. */
  private def fieldOf(schema: StructType, n: String): Option[StructField] = {
    val ms = schema.fields.filter(_.name.equalsIgnoreCase(n))
    if (ms.length == 1) Some(ms.head) else None
  }

  private def countNonNull(fss: Seq[FileStats], key: String): Option[Long] = {
    var total = 0L
    fss.foreach { fs =>
      fs.cols.get(key) match {
        case Some(cs) => cs.nulls match {
          case Some(nn) => total += fs.rows - nn
          case None => return None // null count unknown for this file
        }
        case None => () // file predates the column: all NULL
      }
    }
    Some(total)
  }

  /** Catalyst-value decoder from the serialized long bound, for types
    * whose manifest ordering is EXACT ('l'/'b' classes). Anything else
    * (strings, floats, decimals, nested) returns None → bail. */
  private def decoder(dt: DataType): Option[Long => Any] = dt match {
    case ByteType => Some(l => l.toByte)
    case ShortType => Some(l => l.toShort)
    case IntegerType => Some(l => l.toInt)
    case LongType => Some(identity[Long])
    case DateType => Some(l => l.toInt)
    case TimestampType | TimestampNTZType => Some(identity[Long])
    case BooleanType => Some(l => l != 0L)
    case _ => None
  }

  private def bound(e: org.apache.spark.sql.connector.expressions.Expression,
      fss: Seq[FileStats], schema: StructType,
      isMin: Boolean): Option[(StructField, Any)] = {
    for {
      n <- colName(e)
      fld <- fieldOf(schema, n)
      dec <- decoder(fld.dataType)
      v <- foldBound(fss, n.toLowerCase(java.util.Locale.ROOT), isMin)
    } yield StructField((if (isMin) "min_" else "max_") + n,
      fld.dataType, nullable = true) -> v.map(dec).orNull
  }

  /** Some(Some(long)) = provable bound; Some(None) = provably all
    * NULL (the aggregate's answer is NULL); None = not provable. */
  private def foldBound(fss: Seq[FileStats], key: String,
      isMin: Boolean): Option[Option[Long]] = {
    val contrib = scala.collection.mutable.ArrayBuffer.empty[Long]
    fss.foreach { fs =>
      fs.cols.get(key) match {
        case None => () // predates the column: all NULL, no contribution
        // the stats TAG must say long-ordered before the bound is
        // parsed as one: a type-evolved table can carry old files
        // whose stats were harvested under another class (e.g. 's'),
        // and decoding those as longs would be wrong even when
        // toLong happens to succeed
        case Some(cs) if cs.tag == 'l' || cs.tag == 'b' =>
          (if (isMin) cs.min else cs.max) match {
            case Some(b) => contrib += b.toLong
            case None =>
              // no bound recorded: sound only if the file provably has
              // no non-NULL value (unknown nulls → bail)
              if (!cs.nulls.contains(fs.rows)) return None
          }
        case Some(cs) =>
          // foreign ordering class: only an all-NULL file is provable
          if (!cs.nulls.contains(fs.rows)) return None
      }
    }
    Some(if (contrib.isEmpty) None
      else Some(if (isMin) contrib.min else contrib.max))
  }
}

/** The zero-task scan serving a manifest-answered aggregation: one
  * in-memory row, planned by Spark as a LocalTableScan. */
private[sources] final class ManifestStatsScan(schema0: StructType,
    row: InternalRow, path: String, version: Long) extends LocalScan {
  override def readSchema(): StructType = schema0
  override def rows(): Array[InternalRow] = Array(row)
  override def description(): String =
    s"GraftManifestAggregates(path=$path, version=$version)"
}
