package graft.plans

import graft.operators.DataMerge
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Coalesce, EqualTo, Expression, If, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, DeleteFromTable, Filter, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateStarAction, UpdateTable}
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
  * way, as staged rewrites of a projection/filter over the table. Any
  * other MERGE shape (multi-clause chains, NOT MATCHED BY SOURCE) is
  * left untouched so Spark's own unsupported-operation error surfaces
  * rather than silently-wrong semantics. Multi-level partitioned
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

    // General single-clause MERGE — the reference's LITERAL statement
    // shape (`Ingest:373-415`): expression-based ON (e.g.
    // lower(T.c) = lower(S.c)), column-level UPDATE SET, conditional
    // `WHEN NOT MATCHED AND <cond> THEN INSERT (cols) VALUES (exprs)`.
    // Lowered to the three-branch join union; at most one matched and
    // one not-matched clause (multi-clause chains fall through).
    case m: MergeIntoTable
        if m.resolved && m.notMatchedBySourceActions.isEmpty &&
          isGeneralShape(m) =>
      relationOf(m.targetTable) match {
        case Some((table, partCols)) => GeneralMergeCommand(table, partCols, m)
        case _ => m
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
        case None => u
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
        case None => d
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

  /** At most one matched clause (column-level UPDATE or DELETE) and at
    * most one not-matched clause (explicit-columns INSERT), any of them
    * conditional. Star actions are handled by the upsert path above. */
  private def isGeneralShape(m: MergeIntoTable): Boolean =
    m.matchedActions.size <= 1 && m.notMatchedActions.size <= 1 &&
      (m.matchedActions.nonEmpty || m.notMatchedActions.nonEmpty) &&
      m.matchedActions.forall {
        // nested/struct-field SET targets would be silently dropped by
        // assignMap — reject the shape so Spark's own error surfaces
        case u: UpdateAction =>
          u.assignments.forall(_.key.isInstanceOf[AttributeReference])
        case _: DeleteAction => true
        case _ => false
      } &&
      m.notMatchedActions.forall {
        case i: InsertAction =>
          i.assignments.forall(_.key.isInstanceOf[AttributeReference])
        case _ => false
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
          val df = ofRows(spark, rewritten)
            .where(DataMerge.tupleFilter(ps, touched))
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

/** Eagerly-executed general MERGE (single matched + single not-matched
  * clause): the three-branch lowering every MERGE engine uses —
  *
  *   matched   = target ⋈ source ON cond  → UPDATE projection / DELETE
  *   untouched = target ⟕̸ source (anti)   → unchanged
  *   inserts   = source ⟕̸ target (anti)   → INSERT projection (+ cond)
  *
  * written back partition-scoped: partitions receiving matched/insert
  * rows AND partitions matched rows came from (updates may move rows
  * across partitions) are rewritten and swapped. The ANSI at-most-one-
  * source-match contract is ENFORCED (count check) — multiple matches
  * raise the cardinality error instead of silently duplicating rows. */
case class GeneralMergeCommand(table: CatalogTable, partCols: Seq[String],
    merge: MergeIntoTable) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(merge)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.GraftShims.{ofRows, toColumn}
    import org.apache.spark.sql.functions.{col, lit}
    val target = ofRows(spark, merge.targetTable)
    val source = ofRows(spark, merge.sourceTable)
    val cond = toColumn(merge.mergeCondition)
    val tCols = merge.targetTable.output

    def assignMap(assigns: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment])
        : Map[String, Expression] =
      assigns.collect {
        case a if a.key.isInstanceOf[AttributeReference] =>
          a.key.asInstanceOf[AttributeReference].name.toLowerCase -> a.value
      }.toMap

    // matched branch — one MERGE evaluates this join for the contract
    // check, the scope collects, and the staging write, so PERSIST it
    // for the command's duration (non-equi ON conditions, the reason
    // this path exists, are the expensive joins to recompute)
    val joined = target.join(source, cond, "inner").persist()
    val matchedSemi = target.join(source, cond, "left_semi")
      .select(tCols.map(a => toColumn(a).as(a.name)): _*).persist()
    try {
    // ANSI MERGE contract: a target row may match at most ONE source
    // row, else the matched projection would silently write one output
    // row PER source match. Two counts, checked only when a matched
    // clause could multiply rows. Inside the try: a violation must
    // still unpersist both cached datasets, not leak them for the
    // session lifetime.
    if (merge.matchedActions.nonEmpty) {
      val semiCnt = matchedSemi.count()
      val innerCnt = joined.count()
      require(innerCnt == semiCnt,
        s"MERGE: $innerCnt source matches for $semiCnt matched target " +
          "rows — a target row matches multiple source rows (ANSI MERGE " +
          "cardinality violation)")
    }
    val matchedOut = merge.matchedActions.headOption match {
      case Some(UpdateAction(c, assigns, _)) =>
        val m = assignMap(assigns)
        val gate = c.map(toColumn).getOrElse(lit(true))
        joined.select(tCols.map { attr =>
          m.get(attr.name.toLowerCase) match {
            case Some(v) => org.apache.spark.sql.functions
              .when(gate, toColumn(v).cast(attr.dataType))
              .otherwise(toColumn(attr)).as(attr.name)
          case None => toColumn(attr).as(attr.name)
          }
        }: _*)
      case Some(DeleteAction(c)) =>
        val gate = c.map(toColumn).getOrElse(lit(true))
        joined.where(!org.apache.spark.sql.functions.coalesce(gate, lit(false)))
          .select(tCols.map(a => toColumn(a).as(a.name)): _*)
      case _ =>
        // no matched clause: matched rows pass through unchanged — the
        // SEMI join keeps them single even with multiple source matches
        matchedSemi
    }

    // insert branch
    val insertsOut = merge.notMatchedActions.headOption match {
      case Some(InsertAction(c, assigns)) =>
        val m = assignMap(assigns)
        val base = source.join(target, cond, "left_anti")
        val gated = c.map(g => base.where(toColumn(g))).getOrElse(base)
        Some(gated.select(tCols.map { attr =>
          m.get(attr.name.toLowerCase) match {
            case Some(v) => toColumn(v).cast(attr.dataType).as(attr.name)
            case None => lit(null).cast(attr.dataType).as(attr.name)
          }
        }: _*))
      case _ => None
    }

    val untouched = target.join(source, cond, "left_anti")
      .select(tCols.map(a => toColumn(a).as(a.name)): _*)
    val changed = insertsOut.foldLeft(matchedOut)(_ unionByName _)
    val path = table.location.toString

    partCols match {
      case ps if ps.nonEmpty =>
        // scope = partitions receiving NEW content ∪ partitions where
        // matched rows USED to live. The old-location collect is needed
        // only when matched rows can LEAVE their partition (an UPDATE
        // assigning a partition column) or vanish (a DELETE clause) —
        // a plain-column UPDATE keeps every matched row in place, so
        // touchedOld ⊆ touchedNew and the extra job is skipped.
        val movesPossible = merge.matchedActions.headOption.exists {
          case UpdateAction(_, assigns, _) => assigns.exists(a =>
            a.key match {
              case ar: AttributeReference =>
                ps.exists(_.equalsIgnoreCase(ar.name))
              case _ => false
            })
          case _: DeleteAction => true
          case _ => false
        }
        val touchedNew: Seq[Seq[Any]] =
          DataMerge.collectTuples(changed, ps)
        val touchedOld: Seq[Seq[Any]] =
          if (movesPossible) DataMerge.collectTuples(matchedSemi, ps)
          else Nil
        val scope = (touchedNew ++ touchedOld).distinct
        if (scope.nonEmpty) {
          val merged = changed.unionByName(untouched)
            .where(DataMerge.tupleFilter(ps, scope))
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
    } finally {
      joined.unpersist()
      matchedSemi.unpersist()
    }
    Seq.empty
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
