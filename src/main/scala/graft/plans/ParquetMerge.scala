package graft.plans

import graft.operators.DataMerge
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Coalesce, EqualTo, Expression, If, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, Project, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** SQL `MERGE INTO` for parquet catalog tables — the reference's Delta
  * MERGE surface (`PostgresToDataLake_Ingestion_Notebook.py:373-415`)
  * without Delta on the classpath. Spark's parser already produces
  * [[MergeIntoTable]]; the built-in analyzer only supports it for v2
  * row-level-operation tables and rejects v1/parquet. This rule
  * (injected via `graft.GraftExtensions`) intercepts the upsert shape
  *
  *   MERGE INTO t USING s ON t.k = s.k [AND ...]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *
  * before the v1 rejection fires, and lowers it to
  * [[graft.operators.DataMerge]] — partition-pruned for single-column-
  * partitioned tables, staged whole-table rewrite for unpartitioned
  * ones. `UPDATE t SET … WHERE …` and `DELETE FROM t WHERE …` (the
  * reference's S10 statements, `Config:136-140`) are lowered the same
  * way, as staged rewrites of a projection/filter over the table.
  * General statements — multi-clause `WHEN MATCHED` chains with
  * per-clause conditions, multiple conditional inserts, and
  * `WHEN NOT MATCHED BY SOURCE` UPDATE/DELETE — are lowered by
  * [[GeneralMergeCommand]] with ANSI first-true-clause-wins
  * semantics. Shapes it can't honor exactly (nested struct-field
  * assignments) are left untouched so Spark's own
  * unsupported-operation error surfaces rather than silently-wrong
  * semantics. Multi-level partitioned
  * targets (the reference's year/month/day layout, `Ingest:460`) are
  * fully supported: scoping and dir swaps operate on partition TUPLES.
  */
case class ResolveParquetMerge(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable
        if m.targetTable.resolved && m.sourceTable.resolved &&
          m.notMatchedBySourceActions.isEmpty &&
          isUpsertShape(m) =>
      (relationOf(m.targetTable), keysOf(m.mergeCondition)) match {
        case (Some((table, partCols)), Some(keys)) if keys.nonEmpty =>
          ParquetMergeCommand(table, partCols, keys, m.sourceTable)
        case _ => m
      }

    // General MERGE — the reference's LITERAL statement shape
    // (`Ingest:373-415`) and beyond: expression-based ON (e.g.
    // lower(T.c) = lower(S.c)), chained conditional WHEN MATCHED
    // UPDATE/DELETE clauses, multiple conditional INSERT clauses, and
    // WHEN NOT MATCHED BY SOURCE UPDATE/DELETE (the clause an
    // incremental ingest needs to retire rows that vanished upstream).
    // Lowered to the three-branch join union with first-true-clause-
    // wins per ANSI. Star actions never reach here: the analyzer
    // expands them to column-level assignments (or the upsert path
    // above catches the pure star upsert first).
    case m: MergeIntoTable
        if m.resolved && isGeneralShape(m) =>
      relationOf(m.targetTable) match {
        case Some((table, partCols)) => GeneralMergeCommand(table, partCols, m)
        case _ => snapshotOf(m.targetTable) match {
          // catalog snapshot (Versioned) target: the same lowering,
          // committed as one manifest version pinned to the version
          // the resolved scan read
          case Some((path, version)) => VersionedMergeCommand(path, version, m)
          case _ => m
        }
      }

    // UPDATE t SET c = expr, ... [WHERE cond] (S10, `Config:136-140`):
    // lowered to a projection over the target — assigned columns become
    // If(cond, newExpr, old) — written back via staged overwrite. With
    // a single-column-partitioned target and a WHERE, only partitions
    // CONTAINING matched rows are rewritten (matchedParts below).
    case u: UpdateTable
        // every SET target must be a plain column — a struct-field or
        // otherwise nested assignment would be silently DROPPED by the
        // collect below, completing the statement without applying it;
        // fall through to Spark's own unsupported-operation error instead
        if u.resolved &&
          u.assignments.forall(_.key.isInstanceOf[AttributeReference]) =>
      relationOf(u.table) match {
        case Some((table, partCols)) =>
          val targets = u.assignments.map(
            _.key.asInstanceOf[AttributeReference].name)
          // standard SQL rejects duplicate assignment targets; a
          // silent .toMap would make SET x=1, x=2 a quiet coin-flip
          // (the SnapshotDml path refuses identically)
          val dupTargets = targets.groupBy(identity)
            .collect { case (n, g) if g.size > 1 => n }
          require(dupTargets.isEmpty,
            s"duplicate UPDATE assignment target(s): " +
              dupTargets.mkString(", "))
          val assigned: Map[String, Expression] = u.assignments.map { a =>
            a.key.asInstanceOf[AttributeReference].name -> a.value
          }.toMap
          val cond = u.condition.getOrElse(Literal(true))
          val projections = u.table.output.map { attr =>
            assigned.get(attr.name) match {
              case Some(newV) =>
                Alias(If(Coalesce(Seq(cond, Literal(false))), newV, attr),
                  attr.name)()
              case None => attr
            }
          }
          // an UPDATE that assigns a PARTITION column can move rows
          // across partitions: the partition-scoped rewrite (scope from
          // OLD values, filter on NEW values) would drop moved rows, so
          // such statements pay the whole-table staged rewrite
          val movesPartitions = partCols.exists(pc =>
            assigned.keys.exists(_.equalsIgnoreCase(pc)))
          ParquetRewriteCommand(table, partCols,
            Project(projections, u.table),
            if (movesPartitions) None
            else matchedParts(u.table, partCols, u.condition),
            deleteMissing = false)
        case None => snapshotOf(u.table) match {
          // catalog snapshot target: name-rebound assignments over the
          // shared stats-scoped COW / DV write-back
          case Some((path, _)) =>
            UpdateSnapshotV2Command(path,
              u.assignments.map(a =>
                (a.key.asInstanceOf[AttributeReference].name, a.value)),
              u.condition)
          case None => u
        }
      }

    // DELETE FROM t [WHERE cond]: survivors are rows where cond is not
    // true (NULL-cond rows survive, per SQL DELETE semantics). Same
    // touched-partition restriction; a partition whose every row is
    // deleted has no staging dir and is dropped (deleteMissing).
    case d: DeleteFromTable if d.resolved =>
      relationOf(d.table) match {
        case Some((table, partCols)) =>
          val keep = Not(Coalesce(Seq(d.condition, Literal(false))))
          ParquetRewriteCommand(table, partCols, Filter(keep, d.table),
            matchedParts(d.table, partCols, Some(d.condition)),
            deleteMissing = true)
        case None => snapshotOf(d.table) match {
          // catalog snapshot target: ARBITRARY conditions (the
          // SupportsDelete pushdown path only covers translatable
          // filters; this lowering takes everything), DV-conf-routed
          case Some((path, _)) =>
            DeleteSnapshotV2Command(path, Some(d.condition))
          case None => d
        }
      }
  }

  /** Plan computing the DISTINCT partition tuples containing rows the
    * condition matches — the rewrite scope. None when the table is
    * unpartitioned or there is no condition (whole-table). */
  private def matchedParts(target: LogicalPlan, partCols: Seq[String],
      condition: Option[Expression]): Option[LogicalPlan] =
    condition match {
      case Some(cond) if partCols.nonEmpty =>
        val attrs = partCols.flatMap(p =>
          target.output.find(_.name.equalsIgnoreCase(p)))
        if (attrs.size == partCols.size)
          Some(Project(attrs, Filter(cond, target)))
        else None
      case _ => None
    }

  /** WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *,
    * both unconditional. */
  private def isUpsertShape(m: MergeIntoTable): Boolean =
    (m.matchedActions match {
      case Seq(UpdateStarAction(None)) => true
      case _ => false
    }) && (m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => true
      case _ => false
    })

  /** Any number of matched / not-matched / not-matched-by-source
    * clauses, each optionally conditional: matched and NMBS clauses
    * must be column-level UPDATE or DELETE, not-matched clauses
    * explicit-columns INSERT. Star actions are handled by the upsert
    * path above (or expanded by the analyzer before reaching here). */
  private def isGeneralShape(m: MergeIntoTable): Boolean = {
    // nested/struct-field SET targets would be silently dropped by
    // assignMap — reject the shape so Spark's own error surfaces
    def plainUpdateOrDelete(a: MergeAction): Boolean = a match {
      case u: UpdateAction =>
        u.assignments.forall(_.key.isInstanceOf[AttributeReference])
      case _: DeleteAction => true
      case _ => false
    }
    (m.matchedActions.nonEmpty || m.notMatchedActions.nonEmpty ||
      m.notMatchedBySourceActions.nonEmpty) &&
      m.matchedActions.forall(plainUpdateOrDelete) &&
      m.notMatchedActions.forall {
        case i: InsertAction =>
          i.assignments.forall(_.key.isInstanceOf[AttributeReference])
        case _ => false
      } &&
      m.notMatchedBySourceActions.forall(plainUpdateOrDelete)
  }

  /** The (path, resolved version) behind the target when it is a
    * WRITABLE graft snapshot table (DSv2 relation over the latest
    * version; pinned time-travel targets stay read-only). */
  private def snapshotOf(plan: LogicalPlan): Option[(String, Long)] =
    plan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if graft.sources.GraftCatalog.writableSnapshotOf(r.table).isDefined =>
        graft.sources.GraftCatalog.writableSnapshotOf(r.table).get
    }

  /** The target's catalog entry + partition columns, if it is a
    * parquet-backed v1 catalog table. */
  private def relationOf(plan: LogicalPlan): Option[(CatalogTable, Seq[String])] =
    plan.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, Some(table), _, _)
          if fs.fileFormat.toString.toLowerCase.contains("parquet") =>
        (table, fs.partitionSchema.fieldNames.toSeq)
    }

  /** Equi-join key names from a conjunction of `t.k = s.k` terms; None
    * for any other condition shape. */
  private def keysOf(cond: Expression): Option[Seq[String]] = cond match {
    case And(l, r) =>
      for (a <- keysOf(l); b <- keysOf(r)) yield a ++ b
    case EqualTo(l, r) =>
      (nameOf(l), nameOf(r)) match {
        case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => Some(Seq(a))
        case _ => None
      }
    case _ => None
  }

  private def nameOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case _ => None
  }
}

/** Eagerly-executed UPDATE/DELETE. With a partitioned target and a
  * WHERE condition, the rewrite is SCOPED: `matchedParts` computes the
  * distinct partition values containing matched rows (a partition-
  * pruned scan when the condition constrains the partition column),
  * only those partitions are rewritten to staging, and only their dirs
  * are swapped — untouched partitions are never read or renamed, the
  * same cost shape Delta's row-level operations target. Unconditioned
  * or unpartitioned statements fall back to the staged whole-table
  * rewrite (the honest cost of v1 in that case). */
case class ParquetRewriteCommand(table: CatalogTable, partCols: Seq[String],
    rewritten: LogicalPlan, matchedParts: Option[LogicalPlan],
    deleteMissing: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(rewritten)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.GraftShims.ofRows
    import org.apache.spark.sql.functions.col
    val path = table.location.toString
    (partCols, matchedParts) match {
      case (ps, Some(mp)) if ps.nonEmpty =>
        val touched: Seq[Seq[Any]] = // bounded by #partitions
          DataMerge.collectTuples(ofRows(spark, mp), ps)
        if (touched.nonEmpty) {
          val df = DataMerge.scopeToTuples(spark,
            ofRows(spark, rewritten), ps, touched)
          val staging = DataMerge.hiddenSibling(path, ".merge-staging")
          df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .partitionBy(ps: _*).parquet(staging)
          DataMerge.swapPartitions(spark, path, staging, ps, touched,
            deleteMissing)
          syncCatalog(spark)
        } // no matched rows -> statement is a no-op, nothing rewritten
      case _ =>
        DataMerge.stagedOverwrite(spark,
          path, ofRows(spark, rewritten), partCols)
        syncCatalog(spark)
    }
    Seq.empty
  }

  private def syncCatalog(spark: SparkSession): Unit = {
    if (partCols.nonEmpty)
      // SYNC adds newly-created partition dirs AND drops vanished ones
      // (a fully-deleted partition disappears from disk)
      spark.sql(
        s"MSCK REPAIR TABLE ${table.identifier.quotedString} SYNC PARTITIONS")
    spark.catalog.refreshTable(table.identifier.quotedString)
  }
}

/** Eagerly-executed general MERGE (any number of clauses per branch,
  * each optionally conditional): the three-branch lowering every MERGE
  * engine uses —
  *
  *   matched   = target ⋈ source ON cond  → matched clause chain
  *   untouched = target ⟕̸ source (anti)   → NOT MATCHED BY SOURCE chain
  *                                          (unchanged when absent)
  *   inserts   = source ⟕̸ target (anti)   → insert clause chain
  *
  * Clause chains follow ANSI first-true-clause-wins: each row is
  * tagged with the index of the first clause whose condition holds
  * (−1: none — the row passes through unchanged for matched/NMBS,
  * is discarded for inserts), DELETE-selected rows are dropped, and
  * each UPDATE clause's assignments apply only to its own rows.
  *
  * Written back partition-scoped: partitions receiving matched/insert
  * rows, partitions matched rows came from (updates may move rows
  * across partitions, deletes empty them), and partitions holding
  * NMBS-affected rows are rewritten and swapped. The ANSI at-most-one-
  * source-match contract is ENFORCED (count check) — multiple matches
  * raise the cardinality error instead of silently duplicating rows. */
case class GeneralMergeCommand(table: CatalogTable, partCols: Seq[String],
    merge: MergeIntoTable) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(merge)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val low = new MergeLowering(spark, merge)
    import low.{CL, applyChain, changed, matchedSemi, nmbsActs, taggedNmbs, untouched}
    try {
    low.checkCardinality()
    val path = table.location.toString

    partCols match {
      case ps if ps.nonEmpty =>
        def assignsPartCol(a: MergeAction): Boolean = a match {
          case UpdateAction(_, assigns, _) => assigns.exists(x =>
            x.key match {
              case ar: AttributeReference =>
                ps.exists(_.equalsIgnoreCase(ar.name))
              case _ => false
            })
          case _ => false
        }
        // scope = partitions receiving NEW content ∪ partitions where
        // matched rows USED to live ∪ partitions holding NMBS-affected
        // rows. The matched old-location collect is needed only when
        // matched rows can LEAVE their partition (an UPDATE assigning
        // a partition column) or vanish (a DELETE clause) — a plain-
        // column UPDATE keeps every matched row in place, so
        // touchedOld ⊆ touchedNew and the extra job is skipped. Same
        // discipline for NMBS new locations: collected only when an
        // NMBS UPDATE can move rows across partitions.
        val movesPossible = merge.matchedActions.exists {
          case _: DeleteAction => true
          case a => assignsPartCol(a)
        }
        val touchedNew: Seq[Seq[Any]] =
          DataMerge.collectTuples(changed, ps)
        val touchedOld: Seq[Seq[Any]] =
          if (movesPossible) DataMerge.collectTuples(matchedSemi, ps)
          else Nil
        val nmbsFired = taggedNmbs.map(_.where(col(CL) >= 0))
        val nmbsOld: Seq[Seq[Any]] = nmbsFired
          .map(DataMerge.collectTuples(_, ps)).getOrElse(Nil)
        val nmbsNew: Seq[Seq[Any]] =
          if (nmbsActs.exists(assignsPartCol))
            nmbsFired.map(f =>
              DataMerge.collectTuples(applyChain(f, nmbsActs), ps))
              .getOrElse(Nil)
          else Nil
        val scope = (touchedNew ++ touchedOld ++ nmbsOld ++ nmbsNew).distinct
        if (scope.nonEmpty) {
          val merged = DataMerge.scopeToTuples(spark,
            changed.unionByName(untouched), ps, scope)
          val staging = DataMerge.hiddenSibling(path, ".merge-staging")
          merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .partitionBy(ps: _*).parquet(staging)
          // every scoped partition's content is FULLY recomputed in
          // staging (changed ∪ untouched restricted to scope), so a
          // scoped dir absent from staging now holds zero rows → drop it
          DataMerge.swapPartitions(spark, path, staging, ps, scope,
            deleteMissing = true)
        }
        spark.sql(
          s"MSCK REPAIR TABLE ${table.identifier.quotedString} SYNC PARTITIONS")
      case _ =>
        DataMerge.stagedOverwrite(spark, path,
          changed.unionByName(untouched), Nil)
    }
    spark.catalog.refreshTable(table.identifier.quotedString)
    } finally low.release()
    Seq.empty
  }
}

/** The three-branch MERGE lowering every MERGE engine uses, shared by
  * the hive-dir ([[GeneralMergeCommand]]) and snapshot-table
  * ([[VersionedMergeCommand]]) write-backs —
  *
  *   matched   = target ⋈ source ON cond  → matched clause chain
  *   untouched = target ⟕̸ source (anti)   → NOT MATCHED BY SOURCE chain
  *                                          (unchanged when absent)
  *   inserts   = source ⟕̸ target (anti)   → insert clause chain
  *
  * Clause chains follow ANSI first-true-clause-wins: each row is
  * tagged with the index of the first clause whose condition holds
  * (−1: none — the row passes through unchanged for matched/NMBS, is
  * discarded for inserts), DELETE-selected rows are dropped, and each
  * UPDATE clause's assignments apply only to its own rows. The
  * expensive joins are persisted for the statement's duration; the
  * caller MUST `release()` in a finally. */
private[plans] final class MergeLowering(spark: SparkSession,
    merge: MergeIntoTable) {
  import org.apache.spark.sql.GraftShims.{ofRows, toColumn}
  import org.apache.spark.sql.functions.{coalesce, col, lit, when}
  import org.apache.spark.sql.{Column, DataFrame}

  private val target = ofRows(spark, merge.targetTable)
  private val source = ofRows(spark, merge.sourceTable)
  private val cond = toColumn(merge.mergeCondition)
  private val tCols = merge.targetTable.output

  private def assignMap(assigns: Seq[Assignment]): Map[String, Expression] =
    assigns.collect {
      case a if a.key.isInstanceOf[AttributeReference] =>
        a.key.asInstanceOf[AttributeReference].name.toLowerCase -> a.value
    }.toMap

  // ---- clause-chain machinery (shared by all three branches) ----
  // A NULL clause condition is "no match" per SQL, hence the coalesce.
  val CL = "__graft_clause__"
  private def gateOf(c: Option[Expression]): Column =
    c.map(e => coalesce(toColumn(e), lit(false))).getOrElse(lit(true))
  /** Tag each row with the index of the FIRST clause whose condition
    * holds (−1: no clause fires). */
  def tagClauses(df: DataFrame, actions: Seq[MergeAction]): DataFrame =
    df.withColumn(CL,
      actions.map(a => gateOf(a.condition)).zipWithIndex
        .foldRight(lit(-1): Column) { case ((g, i), acc) =>
          when(g, lit(i)).otherwise(acc)
        })
  /** Apply an UPDATE/DELETE chain to a tagged frame: rows whose
    * selected clause is a DELETE are dropped; each UPDATE clause
    * rewrites its assigned columns for its own rows; unfired rows
    * (−1) pass through unchanged. Projecting tCols drops CL. */
  def applyChain(tagged: DataFrame, actions: Seq[MergeAction]): DataFrame = {
    val deleteIdx: Seq[Any] = actions.zipWithIndex.collect {
      case (_: DeleteAction, i) => i
    }
    val kept =
      if (deleteIdx.isEmpty) tagged
      else tagged.where(!col(CL).isin(deleteIdx: _*))
    val updates = actions.zipWithIndex.collect {
      case (u: UpdateAction, i) => i -> assignMap(u.assignments)
    }
    kept.select(tCols.map { attr =>
      updates.foldRight(toColumn(attr): Column) { case ((i, m), acc) =>
        m.get(attr.name.toLowerCase) match {
          case Some(v) =>
            when(col(CL) === i, toColumn(v).cast(attr.dataType))
              .otherwise(acc)
          case None => acc
        }
      }.as(attr.name)
    }: _*)
  }

  val nmbsActs: Seq[MergeAction] = merge.notMatchedBySourceActions

  // matched branch — one MERGE evaluates this join for the contract
  // check, the scope collects, and the staging write, so PERSIST it
  // for the statement's duration (non-equi ON conditions, the reason
  // this path exists, are the expensive joins to recompute)
  private val joined = target.join(source, cond, "inner").persist()
  val matchedSemi: DataFrame = target.join(source, cond, "left_semi")
    .select(tCols.map(a => toColumn(a).as(a.name)): _*).persist()
  // the RAW anti-join keeps the target's original attribute ids —
  // NMBS clause conditions and assignments reference those, so the
  // chain must run before any re-aliasing projection
  private val untouchedRaw = target.join(source, cond, "left_anti")
  // NMBS conditions reference only target columns (analyzer-checked),
  // so the chain evaluates directly on the anti-join. Persisted: it
  // feeds the output AND up to two scope collects.
  val taggedNmbs: Option[DataFrame] =
    if (nmbsActs.isEmpty) None
    else Some(tagClauses(untouchedRaw, nmbsActs).persist())

  /** ANSI MERGE contract: a target row may match at most ONE source
    * row, else the matched projection would silently write one output
    * row PER source match. Two counts, checked only when a matched
    * clause could multiply rows. Call inside the caller's try: a
    * violation must still release the cached datasets. */
  def checkCardinality(): Unit =
    if (merge.matchedActions.nonEmpty) {
      val semiCnt = matchedSemi.count()
      val innerCnt = joined.count()
      require(innerCnt == semiCnt,
        s"MERGE: $innerCnt source matches for $semiCnt matched target " +
          "rows — a target row matches multiple source rows (ANSI MERGE " +
          "cardinality violation)")
    }

  private val matchedOut: DataFrame =
    if (merge.matchedActions.isEmpty)
      // no matched clause: matched rows pass through unchanged — the
      // SEMI join keeps them single even with multiple source matches
      matchedSemi
    else applyChain(tagClauses(joined, merge.matchedActions),
      merge.matchedActions)

  // insert branch: first-firing clause picks the projection; rows no
  // clause fires on are not inserted. Unassigned columns are NULL.
  private val insertsOut: Option[DataFrame] =
    if (merge.notMatchedActions.isEmpty) None
    else {
      val base = source.join(target, cond, "left_anti")
      val tagged = tagClauses(base, merge.notMatchedActions)
        .where(col(CL) >= 0)
      val inserts = merge.notMatchedActions.zipWithIndex.collect {
        case (ia: InsertAction, i) => i -> assignMap(ia.assignments)
      }
      Some(tagged.select(tCols.map { attr =>
        inserts.foldRight(lit(null).cast(attr.dataType): Column) {
          case ((i, m), acc) =>
            m.get(attr.name.toLowerCase) match {
              case Some(v) =>
                when(col(CL) === i, toColumn(v).cast(attr.dataType))
                  .otherwise(acc)
              case None => acc // this clause leaves the column NULL
            }
        }.as(attr.name)
      }: _*))
    }

  val untouched: DataFrame = taggedNmbs match {
    case None => untouchedRaw
      .select(tCols.map(a => toColumn(a).as(a.name)): _*)
    case Some(tagged) => applyChain(tagged, nmbsActs)
  }
  val changed: DataFrame = insertsOut.foldLeft(matchedOut)(_ unionByName _)

  /** The merge's target-side key domain as stats filters: for each
    * equi conjunct `t.k = s.k` of the ON condition, the source's
    * [min, max] window on that key. A file whose manifest stats
    * exclude every window provably holds no row this MERGE could
    * match — the append-rebase write-skew guard. Empty when no equi
    * conjunct lowers (the caller then refuses any interleave); an
    * empty/all-NULL source key yields a match-nothing filter (equality
    * with NULL never matches, so appends are trivially out of
    * scope). ONE folded source aggregate computes every key's bounds
    * (the MoR upsert sink's shape) — the source plan is not persisted,
    * so a per-key `.agg().head()` would re-execute it once per key. */
  def sourceKeyBounds(): Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.{sources => sf}
    import org.apache.spark.sql.functions.{max => aggMax, min => aggMin}
    val tSet = merge.targetTable.outputSet
    val sSet = merge.sourceTable.outputSet
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    val pairs = split(merge.mergeCondition).flatMap {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (tSet.contains(a) && sSet.contains(b)) Some((a, b))
        else if (tSet.contains(b) && sSet.contains(a)) Some((b, a))
        else None
      case _ => None
    }
    if (pairs.isEmpty) Nil
    else {
      val aggs = pairs.flatMap { case (_, sAttr) =>
        Seq(aggMin(toColumn(sAttr)), aggMax(toColumn(sAttr))) }
      val row = source.agg(aggs.head, aggs.tail: _*).head()
      pairs.zipWithIndex.map { case ((tAttr, _), i) =>
        if (row.isNullAt(2 * i)) sf.In(tAttr.name, Array.empty[Any])
        else sf.And(
          sf.GreaterThanOrEqual(tAttr.name, row.get(2 * i)),
          sf.LessThanOrEqual(tAttr.name, row.get(2 * i + 1)))
      }
    }
  }

  def release(): Unit = {
    joined.unpersist()
    matchedSemi.unpersist()
    taggedNmbs.foreach(_.unpersist())
  }
}

/** Eagerly-executed general MERGE over a [[graft.operators.Versioned]]
  * SNAPSHOT table (catalog form: `MERGE INTO graft.ns.t USING …`) —
  * the Delta MERGE surface on the manifest-log lake format. The
  * shared [[MergeLowering]] computes the merged snapshot; the
  * write-back is ONE atomic manifest commit (`operation=merge`)
  * pinned to the exact version the scan plan resolved: a concurrent
  * commit landing mid-statement makes the commit REFUSE (the merged
  * snapshot was computed against a superseded base — recomputing
  * needs a re-resolved plan, so the statement fails loudly for the
  * user to re-run rather than silently dropping the interleaved
  * commit). A bucketed target re-buckets the merged snapshot under
  * its declared spec, so the SPJ layout survives; a DV-bearing target
  * reads DV-correct (the V1 fallback) and the merge commit folds the
  * vectors. Pre-merge state stays time-travelable until VACUUM.
  *
  * Cost shape: the merged snapshot is fully rewritten (Delta-without-
  * file-pruning). The partition- and stats-scoped incremental shapes
  * remain on the hive-dir MERGE and the DataMerge/Scd2 APIs; snapshot
  * MERGE buys atomicity + history on the lake format. */
case class VersionedMergeCommand(path: String, baseVersion: Long,
    merge: MergeIntoTable) extends LeafRunnableCommand {
  import graft.operators.Versioned

  override def innerChildren: Seq[LogicalPlan] = Seq(merge)

  override def run(spark: SparkSession): Seq[Row] = {
    val low = new MergeLowering(spark, merge)
    try {
      low.checkCardinality()
      val out = low.changed.unionByName(low.untouched)
      val spec = Versioned.bucketSpec(spark, path, Some(baseVersion))
      // Append-only interleaves REBASE instead of refusing: the
      // appended lines are carried verbatim into the merged snapshot
      // when the source-key stats guard proves they are outside the
      // MERGE's match domain — a per-batch streaming appender no
      // longer starves a concurrent MERGE. Not under NMBS clauses
      // (they claim EVERY target row absent from the source, appended
      // rows included) and not under a column mapping (carried
      // physical-name files would mix with the logical-name snapshot).
      val allowRebase = merge.notMatchedBySourceActions.isEmpty &&
        Versioned.columnMapping(spark, path, Some(baseVersion)).isEmpty
      Versioned.commitIfAppendRebase(out, path,
        Map("operation" -> "merge"), expectedBase = baseVersion,
        bucket = spec, guard = () => low.sourceKeyBounds(),
        rebase = allowRebase) match {
        case Some(_) => Seq.empty
        case None => throw new IllegalStateException(
          s"MERGE into $path lost the commit race: the table advanced " +
            s"past version $baseVersion while the statement ran (an " +
            "interleaved commit touched rows the merge may have " +
            "matched) — re-run the statement against the new latest " +
            "version")
      }
    } finally low.release()
  }
}

/** Eagerly-executed MERGE: reads the source, runs the join-based upsert
  * against the table's files, refreshes the catalog entry. */
case class ParquetMergeCommand(table: CatalogTable, partCols: Seq[String],
    keys: Seq[String], source: LogicalPlan) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val updates = org.apache.spark.sql.GraftShims.ofRows(spark, source)
    val path = table.location.toString
    if (partCols.nonEmpty)
      DataMerge.mergeIntoParquet(spark, path, updates, keys, partCols)
    else
      DataMerge.mergeIntoParquetFull(spark, path, updates, keys)
    // the dir-swap commit bypasses the catalog's partition tracking:
    // SYNC re-discovers new dirs from inserts AND drops entries for
    // dirs emptied by cross-partition moves, then caches are dropped
    if (partCols.nonEmpty)
      spark.sql(
        s"MSCK REPAIR TABLE ${table.identifier.quotedString} SYNC PARTITIONS")
    spark.catalog.refreshTable(table.identifier.quotedString)
    Seq.empty
  }
}
