package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Column mapping for snapshot tables — RENAME/DROP COLUMN without
  * touching a single committed segment (the schema-evolution step
  * beyond additive ADD COLUMN; Delta's columnMapping=name mode and
  * Iceberg's field IDs solve the same problem, reference README.md:11
  * rents it from Delta). The stable identifier is the PHYSICAL column
  * name — the name a column had when its first segment was written,
  * immutable thereafter:
  *
  *  - RENAME records `logical -> physical` in the manifest meta
  *    (`colmap`); reads project physical to logical, writes translate
  *    logical back to physical, so every committed file stays valid.
  *  - DROP records the physical name as tombstoned (`coldrop`); reads
  *    hide it. The data remains in old segments (time travel to before
  *    the drop still sees it) and is discarded whenever a rewrite
  *    touches those rows.
  *  - Both are METADATA-ONLY commits (an empty delta carrying new
  *    meta): on a 100 TB table a rename costs one manifest write.
  *  - An OVERWRITE (including OPTIMIZE's whole-table rewrite) writes
  *    under logical names and clears the mapping — the physical
  *    materialization point that restores the mapping-free fast scan
  *    path.
  *
  * A tombstoned (or rename-occupied) physical name can never be
  * written again: the write path refuses the collision, and the ADD
  * COLUMN DDL assigns a FRESH physical slot for a re-added name — the
  * new column reads NULL on old rows rather than silently
  * resurrecting old data (the failure Iceberg's fresh field IDs
  * exist to prevent).
  */
final case class ColumnMapping(renames: Seq[(String, String)],
    dropped: Seq[String]) {

  def isEmpty: Boolean = renames.isEmpty && dropped.isEmpty

  private def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
  private lazy val physByLogical = renames.map { case (l, p) =>
    lower(l) -> p }.toMap
  private lazy val logicalByPhys = renames.map { case (l, p) =>
    lower(p) -> l }.toMap
  private lazy val droppedLower = dropped.map(lower).toSet

  /** The physical (on-disk) name serving a logical column. */
  def physicalOf(logical: String): String =
    physByLogical.getOrElse(lower(logical), logical)

  /** The logical (user-facing) name of a physical column. */
  def logicalOf(physical: String): String =
    logicalByPhys.getOrElse(lower(physical), physical)

  def isDropped(physical: String): Boolean =
    droppedLower.contains(lower(physical))

  /** Physical scan output -> the logical view: tombstoned columns
    * hidden, renamed columns aliased. Non-table columns (join
    * scratch like `__graft_p`) pass through untouched. */
  def applyRead(df: DataFrame): DataFrame =
    if (isEmpty) df
    else df.select(df.columns.toIndexedSeq
      .filterNot(isDropped)
      .map(c => col(c).as(logicalOf(c))): _*)

  /** Logical user data -> the physical write form. Refuses a column
    * whose name would land on a tombstoned physical column — appended
    * data under a dead name would silently resurface pre-drop rows
    * on any later un-hide. */
  def applyWrite(df: DataFrame): DataFrame =
    if (isEmpty) df
    else df.select(df.columns.toIndexedSeq.map { c =>
      val phys = physicalOf(c)
      if (isDropped(phys)) throw new IllegalArgumentException(
        s"column name '$c' maps to tombstoned physical column '$phys' " +
          "(DROPped earlier); pick a different column name")
      // a NEW logical column must not land on a physical name another
      // logical column occupies — after RENAME id->row_id, an added
      // column named id would silently alias row_id's on-disk data
      if (lower(phys) == lower(c) && logicalByPhys.get(lower(phys))
          .exists(l => lower(l) != lower(c)))
        throw new IllegalArgumentException(
          s"column name '$c' collides with the physical name backing " +
            s"renamed column '${logicalByPhys(lower(phys))}'; pick a " +
            "different column name")
      col(c).as(phys)
    }: _*)

  /** Manifest stats (keyed by lowercase PHYSICAL column name) -> the
    * logical key space, for predicate-driven segment scoping: a
    * renamed column's min/max must answer for its logical name, and a
    * tombstoned column's stats must not shadow anything. */
  def statsToLogical(st: SegmentStats.FileStats): SegmentStats.FileStats =
    if (isEmpty) st
    else st.copy(cols = st.cols.collect {
      case (k, v) if !droppedLower.contains(k) => lower(logicalOf(k)) -> v
    })

  /** Meta entries carrying this mapping (absent keys when empty — an
    * empty mapping leaves the manifest untouched). */
  def toMeta: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    if (renames.nonEmpty) m += ColumnMapping.ColMapKey ->
      renames.map { case (l, p) => s"$l:$p" }.mkString(",")
    if (dropped.nonEmpty) m += ColumnMapping.ColDropKey -> dropped.mkString(",")
    m.result()
  }
}

object ColumnMapping {
  /** Meta key: `logical:physical` pairs, comma-joined. */
  private[graft] val ColMapKey = "colmap"
  /** Meta key: tombstoned physical names, comma-joined. */
  private[graft] val ColDropKey = "coldrop"

  val empty: ColumnMapping = ColumnMapping(Nil, Nil)

  /** Names ride the single-line meta grammar — refuse the separators.
    * (The same shape of restriction the bucket declaration imposes.) */
  private[graft] def validateName(n: String): Unit =
    require(n.nonEmpty && !n.exists(c =>
      c == ':' || c == ',' || c == '=' || c == '\n' || c == '\t'),
      s"column name '$n' cannot ride the manifest meta grammar " +
        "(no ':', ',', '=', tab or newline)")

  def fromMeta(meta: Map[String, String]): ColumnMapping = {
    val renames = meta.get(ColMapKey).toSeq.flatMap(_.split(',').toSeq)
      .flatMap { pair =>
        pair.split(':') match {
          case Array(l, p) if l.nonEmpty && p.nonEmpty => Some((l, p))
          case _ => None // malformed entry: ignore, never misread
        }
      }
    val dropped = meta.get(ColDropKey).toSeq
      .flatMap(_.split(',').toSeq).filter(_.nonEmpty)
    ColumnMapping(renames, dropped)
  }
}
