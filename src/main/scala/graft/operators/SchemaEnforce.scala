package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Append refused by write-time schema enforcement: the incoming
  * frame's types conflict with the table's committed schema. Named so
  * callers (and specs) can catch exactly this refusal. */
final class SchemaConflict(msg: String)
  extends IllegalArgumentException(msg)

/** Write-time schema enforcement for snapshot-table appends (Delta's
  * schema-enforcement discipline, re-expressed for the manifest
  * format). Without it, `Versioned.commit(mode = "append")` accepts
  * any DataFrame — a STRING `price` appended onto a DOUBLE table
  * commits cleanly and poisons every LATER read at the mergeSchema
  * union, discovered by whoever queries next. The one silent-
  * corruption path through the public API, so the WRITER must fail,
  * not the reader:
  *
  *  - columns the table has and the append lacks: accepted (reads
  *    null-fill them — the additive-evolution contract);
  *  - NEW columns the table lacks: accepted (additive evolution, the
  *    mergeSchema union the format has always promised);
  *  - same name, same type (nullability aside): accepted;
  *  - same name, LOSSLESSLY NARROWER incoming type (int into a long
  *    column): accepted by UPCASTING the incoming column — store
  *    assignment, the table's schema does not change;
  *  - same name, WIDER incoming type (long into an int column):
  *    REFUSED unless the opt-in widening conf is set, in which case
  *    the TABLE widens — the commit carries a declared-schema meta
  *    line (the "schema carrier") and every read of that version
  *    resolves under the declared wide types (Spark 4's parquet
  *    reader promotes int32→long / float→double in place, so the
  *    narrow committed segments are never rewritten);
  *  - anything else (string vs double, struct shape change): REFUSED.
  *
  * Widening is LOSSLESS-only — the integral chain byte→short→int→long
  * and float→double, exactly the promotions the vectorized parquet
  * reader performs when handed a wider read schema. At 100 TB the
  * carrier is what makes widening an O(1) metadata commit instead of
  * a table rewrite.
  */
object SchemaEnforce {

  /** Manifest meta key carrying the declared physical schema as a
    * single-line DDL string. Present only once a table has widened
    * (and re-carried by every later commit that keeps narrow files
    * alive); absent tables resolve schema by the mergeSchema union as
    * before. */
  private[graft] val SchemaKey = "schemaddl"

  /** Session conf opting appends into table widening. */
  val WidenConf = "spark.graft.schema.widen"

  /** Structural equality ignoring nullability and metadata at every
    * nesting level. */
  def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
        f.name.equalsIgnoreCase(g.name) && sameType(f.dataType, g.dataType) }
    case (x: ArrayType, y: ArrayType) =>
      sameType(x.elementType, y.elementType)
    case (x: MapType, y: MapType) =>
      sameType(x.keyType, y.keyType) && sameType(x.valueType, y.valueType)
    case _ => a == b
  }

  private val IntegralRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  /** Lossless widening `from` → `to`: strictly up the integral chain,
    * or float → double. Top-level (scalar) types only — a nested
    * widening would need per-file schema surgery the reader promotion
    * doesn't cover. */
  def widensTo(from: DataType, to: DataType): Boolean = (from, to) match {
    case (FloatType, DoubleType) => true
    case _ => (IntegralRank.get(from), IntegralRank.get(to)) match {
      case (Some(f), Some(t)) => f < t
      case _ => false
    }
  }

  /** Validate an append's PHYSICAL frame against the table's current
    * PHYSICAL schema. Returns the frame with lossless upcasts applied
    * plus, when the table itself widened (opt-in), the table schema
    * with those wider types. Throws [[SchemaConflict]] BEFORE any
    * segment lands. */
  def enforce(df: DataFrame, table: StructType, widen: Boolean)
      : (DataFrame, Option[StructType]) = {
    val byName = table.fields.map(f => f.name.toLowerCase -> f).toMap
    var upcasts = List.empty[(String, DataType)]
    var widenedCols = Map.empty[String, DataType] // lower name -> new type
    df.schema.fields.foreach { f =>
      byName.get(f.name.toLowerCase).foreach { t =>
        if (sameType(f.dataType, t.dataType)) ()
        else if (widensTo(f.dataType, t.dataType))
          upcasts ::= (f.name, t.dataType)
        else if (widensTo(t.dataType, f.dataType)) {
          if (!widen) throw new SchemaConflict(
            s"append column '${f.name}' is ${f.dataType.catalogString} " +
              s"but the table committed ${t.dataType.catalogString} — a " +
              "lossless widening; set " +
              s"$WidenConf=true to widen the table, or cast the append " +
              "down explicitly")
          widenedCols += f.name.toLowerCase -> f.dataType
        } else throw new SchemaConflict(
          s"append column '${f.name}' is ${f.dataType.catalogString} " +
            s"but the table committed ${t.dataType.catalogString} — " +
            "committing it would poison every subsequent read at the " +
            "schema union. Cast the append to the table's type (or " +
            "rename the column) and retry")
      }
    }
    val adjusted = upcasts.foldLeft(df) { case (d, (name, to)) =>
      d.withColumn(name, col(s"`$name`").cast(to)) }
    val widened =
      if (widenedCols.isEmpty) None
      else Some(StructType(table.fields.map { f =>
        widenedCols.get(f.name.toLowerCase)
          .map(t => f.copy(dataType = t, nullable = true)).getOrElse(f)
      }))
    (adjusted, widened)
  }

  /** The carried declared schema after this append: `table` (possibly
    * widened) extended with the append's NEW columns, everything
    * nullable (absent-in-older-files columns read as null). */
  def union(table: StructType, incoming: StructType): StructType = {
    val have = table.fields.map(_.name.toLowerCase).toSet
    StructType(table.fields.map(_.copy(nullable = true)) ++
      incoming.fields.filterNot(f => have(f.name.toLowerCase))
        .map(_.copy(nullable = true)))
  }
}
