package graft.sources

import graft.operators.SegmentStats
import graft.operators.SegmentStats.{ColStats, FileStats}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.{sources => sf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Plan-time file pruning over [[SegmentStats]] manifest statistics —
  * the read half of data skipping (Delta/Iceberg prune their file
  * lists from log-embedded min/max the same way; the reference's
  * partition-scoped reads rely on exactly this behavior of its lake
  * format).
  *
  * `translate` lowers the catalyst predicates Spark pushes into a scan
  * into `sources.Filter` trees whose values stay in CATALYST INTERNAL
  * form (`UTF8String`, days-since-epoch `Int` for dates, micros `Long`
  * for timestamps) — precisely the form [[SegmentStats]] serialized,
  * so `mayMatch` compares without any calendar/timezone re-derivation.
  *
  * `mayMatch` is three-valued-logic folded to a keep/drop bit: it
  * returns false ONLY when the statistics PROVE no row of the file can
  * satisfy the predicate. Everything unknown — absent bounds, float
  * columns (NaN never enters parquet min/max, so range pruning on
  * `d`-class is unsound under Spark's NaN-is-largest ordering),
  * unconvertible values, filter shapes we don't model, malformed stats
  * — keeps the file. Dropping a conjunct in `translate` is likewise
  * sound: fewer conjuncts prune fewer files, never more.
  *
  * A column MISSING from a stats-bearing file's map means the file
  * predates the column (additive schema evolution): it reads as
  * all-NULL, so comparisons prune the file while `IS NULL` keeps it.
  * Names containing `.` are never given that treatment — a nested
  * pushdown path is not a top-level column — they are simply
  * unprunable.
  */
object StatsPruner {

  // ------------------------------------------------------------- translate

  /** The prunable filters of an already-filtered DataFrame, taken from
    * its OPTIMIZED plan (where type-coercion casts around literals
    * have been folded back into comparable literals). The DML path
    * uses this to scope copy-on-write rewrites: bolt `.where(cond)`
    * onto a read of the table, harvest what survives as Filter nodes,
    * lower each conjunct. An empty result means "no pruning", never
    * "matches nothing". */
  /** `nameMap` translates a plan-level attribute name to the
    * DataFrame's OUTPUT name space before the guard below — needed
    * under a column mapping, where the optimizer pushes a filter on a
    * logical column through the rename projection and the Filter node
    * ends up referencing the PHYSICAL name. The returned filters are
    * rewritten through the same map, so they compare against stats in
    * the caller's (logical) key space. */
  def pushableFilters(filtered: org.apache.spark.sql.DataFrame,
      nameMap: String => String = identity): Seq[sf.Filter] = {
    // the plan may contain MORE than the caller's predicate over the
    // table — a DV-overlaid read carries an anti-join whose sidecar
    // side has its own Filter nodes (reserved __graft_* columns).
    // Those reference columns that are not table columns; lowering
    // them would stats-"prune" on columns no data file carries and
    // silently scope the DML to nothing. Only filters over the
    // DataFrame's own OUTPUT columns are table predicates.
    val outCols = filtered.columns
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    filtered.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        conjuncts(f.condition).flatMap(translate)
    }.flatten
      .filter(_.references.forall(r =>
        outCols.contains(nameMap(r).toLowerCase(java.util.Locale.ROOT))))
      .flatMap(renameRefs(_, nameMap))
  }

  /** Rewrite a pruning filter's attribute references. Total over every
    * shape [[translate]] can emit; anything else drops (sound — fewer
    * conjuncts prune fewer files). */
  private def renameRefs(f: sf.Filter,
      m: String => String): Option[sf.Filter] = f match {
    case sf.EqualTo(a, v) => Some(sf.EqualTo(m(a), v))
    case sf.GreaterThan(a, v) => Some(sf.GreaterThan(m(a), v))
    case sf.GreaterThanOrEqual(a, v) => Some(sf.GreaterThanOrEqual(m(a), v))
    case sf.LessThan(a, v) => Some(sf.LessThan(m(a), v))
    case sf.LessThanOrEqual(a, v) => Some(sf.LessThanOrEqual(m(a), v))
    case sf.In(a, vs) => Some(sf.In(m(a), vs))
    case sf.IsNull(a) => Some(sf.IsNull(m(a)))
    case sf.IsNotNull(a) => Some(sf.IsNotNull(m(a)))
    case sf.StringStartsWith(a, v) => Some(sf.StringStartsWith(m(a), v))
    case sf.And(l, r) =>
      for { lf <- renameRefs(l, m); rf <- renameRefs(r, m) }
        yield sf.And(lf, rf)
    case sf.Or(l, r) =>
      for { lf <- renameRefs(l, m); rf <- renameRefs(r, m) }
        yield sf.Or(lf, rf)
    case _ => None
  }

  private def conjuncts(e: ce.Expression): Seq[ce.Expression] = e match {
    case ce.And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Lower one pushed catalyst predicate to a pruning filter; None =
    * shape we don't prune on. Spark hands conjuncts pre-split, so each
    * input is typically a single comparison. */
  def translate(e: ce.Expression): Option[sf.Filter] = e match {
    case ce.And(l, r) => (translate(l), translate(r)) match {
      case (Some(lf), Some(rf)) => Some(sf.And(lf, rf))
      case (one, None) => one // dropped conjunct only weakens pruning
      case (None, one) => one
      case _ => None
    }
    case ce.Or(l, r) => // disjuncts must BOTH lower or the Or is unsound
      for { lf <- translate(l); rf <- translate(r) } yield sf.Or(lf, rf)
    case ce.EqualTo(a: ce.AttributeReference, l: ce.Literal) =>
      litVal(l).map(sf.EqualTo(a.name, _))
    case ce.EqualTo(l: ce.Literal, a: ce.AttributeReference) =>
      litVal(l).map(sf.EqualTo(a.name, _))
    case ce.EqualNullSafe(a: ce.AttributeReference, ce.Literal(null, _)) =>
      Some(sf.IsNull(a.name))
    case ce.EqualNullSafe(ce.Literal(null, _), a: ce.AttributeReference) =>
      Some(sf.IsNull(a.name))
    case ce.EqualNullSafe(a: ce.AttributeReference, l: ce.Literal) =>
      litVal(l).map(sf.EqualTo(a.name, _))
    case ce.EqualNullSafe(l: ce.Literal, a: ce.AttributeReference) =>
      litVal(l).map(sf.EqualTo(a.name, _))
    case ce.GreaterThan(a: ce.AttributeReference, l: ce.Literal) =>
      litVal(l).map(sf.GreaterThan(a.name, _))
    case ce.GreaterThan(l: ce.Literal, a: ce.AttributeReference) =>
      litVal(l).map(sf.LessThan(a.name, _))
    case ce.GreaterThanOrEqual(a: ce.AttributeReference, l: ce.Literal) =>
      litVal(l).map(sf.GreaterThanOrEqual(a.name, _))
    case ce.GreaterThanOrEqual(l: ce.Literal, a: ce.AttributeReference) =>
      litVal(l).map(sf.LessThanOrEqual(a.name, _))
    case ce.LessThan(a: ce.AttributeReference, l: ce.Literal) =>
      litVal(l).map(sf.LessThan(a.name, _))
    case ce.LessThan(l: ce.Literal, a: ce.AttributeReference) =>
      litVal(l).map(sf.GreaterThan(a.name, _))
    case ce.LessThanOrEqual(a: ce.AttributeReference, l: ce.Literal) =>
      litVal(l).map(sf.LessThanOrEqual(a.name, _))
    case ce.LessThanOrEqual(l: ce.Literal, a: ce.AttributeReference) =>
      litVal(l).map(sf.GreaterThanOrEqual(a.name, _))
    case ce.In(a: ce.AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[ce.Literal]) =>
      val vals = vs.map(v => litVal(v.asInstanceOf[ce.Literal]))
      if (vals.forall(_.isDefined)) Some(sf.In(a.name, vals.map(_.get).toArray))
      else None
    case ce.InSet(a: ce.AttributeReference, set) if set.nonEmpty =>
      // values are already internal; nulls inside lower to
      // unconvertible and keep the file (sound)
      Some(sf.In(a.name, set.toArray))
    case ce.IsNull(a: ce.AttributeReference) => Some(sf.IsNull(a.name))
    case ce.IsNotNull(a: ce.AttributeReference) => Some(sf.IsNotNull(a.name))
    case ce.StartsWith(a: ce.AttributeReference, ce.Literal(p: UTF8String, _)) =>
      Some(sf.StringStartsWith(a.name, p.toString))
    case _ => None
  }

  /** A literal's internal value, only for types whose internal form is
    * comparable against the stats classes ('l'/'s'/'b'). Null → None
    * (a null comparison matches nothing, but Spark never pushes one
    * except through null-safe equality, handled above). */
  private def litVal(l: ce.Literal): Option[Any] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | BooleanType | StringType =>
        Some(l.value)
      case _ => None
    }

  // -------------------------------------------------------------- mayMatch

  /** Can any row of a file with these stats satisfy the filter? False
    * only on proof. Malformed stats values degrade to keep, never to a
    * failed read. */
  def mayMatch(fs: FileStats, filter: sf.Filter): Boolean =
    if (fs.rows == 0L) false // an empty segment satisfies no predicate
    else try eval(fs, filter)
    catch { case scala.util.control.NonFatal(_) => true }

  private sealed trait Col
  private case object Opaque extends Col // unprunable name shape
  private case object AllNull extends Col // file predates the column
  private final case class Known(c: ColStats) extends Col

  private def colOf(fs: FileStats, name: String): Col =
    if (name.indexOf('.') >= 0) Opaque
    else fs.cols.get(name.toLowerCase(java.util.Locale.ROOT)) match {
      case Some(c) => Known(c)
      case None => AllNull
    }

  private def eval(fs: FileStats, filter: sf.Filter): Boolean = filter match {
    case sf.And(l, r) => eval(fs, l) && eval(fs, r)
    case sf.Or(l, r) => eval(fs, l) || eval(fs, r)
    case sf.EqualTo(a, v) => cmp(fs, a, v, Eq)
    case sf.EqualNullSafe(a, v) =>
      if (v == null) eval(fs, sf.IsNull(a)) else cmp(fs, a, v, Eq)
    case sf.GreaterThan(a, v) => cmp(fs, a, v, Gt)
    case sf.GreaterThanOrEqual(a, v) => cmp(fs, a, v, Ge)
    case sf.LessThan(a, v) => cmp(fs, a, v, Lt)
    case sf.LessThanOrEqual(a, v) => cmp(fs, a, v, Le)
    case sf.In(a, vs) => colOf(fs, a) match {
      case Opaque => true
      case AllNull => false
      case Known(c) => vs.nonEmpty && vs.exists(knownCmp(fs, c, _, Eq))
    }
    case sf.IsNull(a) => colOf(fs, a) match {
      case Opaque => true
      case AllNull => true
      case Known(c) => !c.nulls.contains(0L)
    }
    case sf.IsNotNull(a) => colOf(fs, a) match {
      case Opaque => true
      case AllNull => false
      case Known(c) => !c.nulls.contains(fs.rows)
    }
    case sf.StringStartsWith(a, p) => colOf(fs, a) match {
      case Opaque => true
      case AllNull => false
      case Known(c) if c.tag == 's' =>
        if (c.nulls.contains(fs.rows)) false
        else {
          val pu = UTF8String.fromString(p)
          // s startsWith p ⟹ s >= p, and code-point prefixes are
          // monotone under byte order ⟹ prefix|p|(s) >= prefix|p|(min)
          val maxOk = c.max.forall(mx =>
            UTF8String.fromString(mx).compareTo(pu) >= 0)
          val minOk = c.min.forall { mn =>
            val mnu = UTF8String.fromString(mn)
            val pref = if (mnu.numChars > pu.numChars)
              mnu.substring(0, pu.numChars) else mnu
            pref.compareTo(pu) <= 0
          }
          maxOk && minOk
        }
      case _ => true
    }
    case _ => true // Not and friends: never invert bounds logic
  }

  private sealed trait Cmp
  private case object Eq extends Cmp
  private case object Gt extends Cmp
  private case object Ge extends Cmp
  private case object Lt extends Cmp
  private case object Le extends Cmp

  private def cmp(fs: FileStats, name: String, v: Any, op: Cmp): Boolean =
    colOf(fs, name) match {
      case Opaque => true
      case AllNull => false // comparing an all-NULL column matches nothing
      case Known(c) => knownCmp(fs, c, v, op)
    }

  private def knownCmp(fs: FileStats, c: ColStats, v: Any, op: Cmp): Boolean = {
    if (c.nulls.contains(fs.rows)) return false // every value NULL
    c.tag match {
      case 'l' =>
        judge(c.min.map(_.toLong), c.max.map(_.toLong), toL(v), op)
      case 's' =>
        judge(c.min.map(UTF8String.fromString),
          c.max.map(UTF8String.fromString), toU(v), op)(utf8Ord)
      case 'b' =>
        judge(c.min, c.max, toB(v).map(b => if (b) "1" else "0"), op)
      case _ => true // 'd' (NaN-unsound) and 'x': null counts only
    }
  }

  /** Keep iff a value in [min,max] could satisfy `col op v`; absent
    * bound or unconvertible value → keep. */
  private def judge[T](min: Option[T], max: Option[T], v: Option[T],
      op: Cmp)(implicit o: Ordering[T]): Boolean = v match {
    case None => true
    case Some(x) => op match {
      case Eq => min.forall(o.lteq(_, x)) && max.forall(o.gteq(_, x))
      case Gt => max.forall(o.gt(_, x))
      case Ge => max.forall(o.gteq(_, x))
      case Lt => min.forall(o.lt(_, x))
      case Le => min.forall(o.lteq(_, x))
    }
  }

  private val utf8Ord: Ordering[UTF8String] =
    (a: UTF8String, b: UTF8String) => a.compareTo(b)

  /** Catalyst-internal values compare directly; EXTERNAL date/time
    * values (DSv2 deleteWhere hands `sources.Filter`s with external
    * values) go through Spark's own converters so the epoch-day/micros
    * mapping is bit-identical to what the stats serialized. */
  private def toL(v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    v match {
      case b: Byte => Some(b.toLong)
      case s: Short => Some(s.toLong)
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d).toLong)
      case d: java.time.LocalDate => Some(DateTimeUtils.localDateToDays(d).toLong)
      case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
      case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
      case l: java.time.LocalDateTime => Some(DateTimeUtils.localDateTimeToMicros(l))
      case _ => None
    }
  }
  private def toU(v: Any): Option[UTF8String] = v match {
    case u: UTF8String => Some(u)
    case s: String => Some(UTF8String.fromString(s))
    case _ => None
  }
  private def toB(v: Any): Option[Boolean] = v match {
    case b: Boolean => Some(b)
    case _ => None
  }
}
