package graft.sources

import graft.operators.Versioned
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog plugin over [[graft.operators.Versioned]] snapshot
  * tables — the read path that makes manifest-log tables first-class
  * in SQL, including Spark's NATIVE time-travel syntax (the Delta
  * reading surface the reference relies on, re-expressed through the
  * public connector API):
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /lake
  *
  *   SELECT * FROM graft.ns.t                          -- latest
  *   SELECT * FROM graft.ns.t VERSION AS OF 2          -- pinned version
  *   SELECT * FROM graft.ns.t TIMESTAMP AS OF '…'      -- as-of commit time
  *   SHOW TABLES IN graft.ns
  * }}}
  *
  * Read planning is O(manifest): a version resolves to its exact file
  * list (never a directory glob), handed to Spark's own ParquetTable —
  * so vectorized reads, pushdown, pruning, and AQE all apply
  * unchanged. SQL WRITES are first-class on the LATEST version:
  * CREATE TABLE / CTAS / INSERT INTO / INSERT OVERWRITE each land as
  * one atomic manifest commit (V1Write bridge → `Versioned.commit`);
  * pinned time-travel loads stay read-only. Destructive DDL is still
  * refused — alterTable/renameTable throw and dropTable refuses, so
  * retention goes through VACUUM and roll-back through RESTORE, and
  * SQL cannot silently destroy history the data plane references.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  /** FunctionCatalog face — the `bucket` function is what lets Spark
    * resolve a bucketed scan's KeyGroupedPartitioning report and plan
    * storage-partitioned joins (zero-shuffle co-bucketed joins). */
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(namespace, "bucket"))
    else Array.empty
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace.isEmpty && ident.name.equalsIgnoreCase("bucket"))
      GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new
        IllegalArgumentException(
          s"set spark.sql.catalog.$name.root to the lake root directory"))
  }

  override def name(): String = catalogName

  private def tablePath(ident: Identifier): String = {
    // identifier segments become PATH segments: a backquoted name
    // carrying '/', '\' or '..' would escape the configured lake root
    // (read AND write anywhere the process can) — refuse, never join
    (ident.namespace.toSeq :+ ident.name).foreach { seg =>
      require(seg.nonEmpty && seg != "." && seg != ".." &&
        !seg.contains('/') && !seg.contains('\\'),
        s"illegal table identifier segment '$seg' — identifier parts " +
          "must stay within the lake root (no empty, '.', '..', '/' " +
          "or '\\' segments)")
    }
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")
  }

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val spark = SparkSession.active
    val path = tablePath(ident)
    val versions = Versioned.versions(spark, path)
    if (versions.isEmpty) throw new NoSuchTableException(ident)
    // a missing VERSION AS OF must be a clean error, not a leaked
    // FileNotFoundException from the manifest read
    version.foreach(v => if (!versions.contains(v))
      throw new IllegalArgumentException(
        s"version $v of ${ident.toString} not found " +
          s"(committed versions: ${versions.mkString(", ")})"))
    val resolved = version.getOrElse(versions.last)
    val files = Versioned.versionFiles(spark, path, Some(resolved))
    // mergeSchema: an appended segment may carry ADDED columns
    // (additive evolution, Versioned.read parity) — the table schema
    // is the union across the version's segments. The union is served
    // by versionSchema (carrier / per-segment-representative cache):
    // passing it as the user schema keeps query COMPILATION free of a
    // per-query footer-merge job over the version's full file list
    val opts = new java.util.HashMap[String, String]()
    opts.put("mergeSchema", "true")
    val reader = ParquetTable(ident.name, spark,
      new CaseInsensitiveStringMap(opts),
      files.toIndexedSeq,
      Versioned.versionSchema(spark, path, Some(resolved)),
      classOf[ParquetFileFormat])
    // bucketSpec validates layout (declared AND every file in a bucket
    // dir) — a half-bucketed version reports None and scans normally
    val bucket = Versioned.bucketSpec(spark, path, Some(resolved))
    // a version carrying deletion vectors OR a column mapping cannot
    // ride the raw ParquetTable scan (it would resurrect DV-deleted
    // rows / surface physical instead of logical column names): it
    // degrades to a V1 relation over the mapping- and DV-aware read —
    // correct but unoptimized (no stats pruning, no SPJ) until
    // OPTIMIZE/overwrite folds vectors and materializes logical names,
    // which restores this fast path
    // … a declared-schema carrier (widened table) also degrades: the
    // raw ParquetTable's mergeSchema union would throw on the widened
    // column, while Versioned.read resolves under the declared types
    val readTable: Table with SupportsRead =
      if (Versioned.hasDv(spark, path, resolved) ||
          Versioned.schemaCarrier(spark, path, Some(resolved)).isDefined ||
          !Versioned.columnMapping(spark, path, Some(resolved)).isEmpty)
        new GraftDvReadTable(path, resolved, ident.name,
          Versioned.read(spark, path, Some(resolved)).schema)
      else new GraftSnapshotReadTable(path, resolved, files,
        reader, bucket)
    // latest-version loads are writable (INSERT INTO/OVERWRITE land as
    // manifest commits); a pinned time-travel load stays read-only
    if (version.isEmpty) new GraftWritableTable(path, readTable)
    else readTable
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF v` */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(scala.util.Try(version.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"version must be a number, got '$version'"))))

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROseconds. Existence
    * is checked FIRST so a missing table surfaces as the same
    * NoSuchTableException the non-time-travel path produces. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val spark = SparkSession.active
    val path = tablePath(ident)
    if (Versioned.versions(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    load(ident, Some(Versioned.versionAt(spark, path, timestamp)))
  }

  override def tableExists(ident: Identifier): Boolean =
    Versioned.versions(SparkSession.active, tablePath(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val spark = SparkSession.active
    val ns = new Path((root +: namespace.toSeq).mkString("/"))
    val fs = ns.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    fs.listStatus(ns).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, Versioned.LogDir)))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  /** CREATE TABLE / the create half of CTAS: committed as version 0
    * with an empty segment carrying the schema, so the subsequent
    * INSERT (or a later append) is just the next manifest commit.
    * `PARTITIONED BY (bucket(n, col))` declares the storage-
    * partitioned-join layout from birth — version 0 commits bucketed
    * (empty, schema-carrying) and every INSERT inherits the routing,
    * the declarative SQL face of [[Versioned.commitBucketed]] (the
    * same DDL shape Iceberg's bucket partition transform uses). Other
    * transforms are rejected: the lake's layout vocabulary is bucket
    * hashing; temporal/range organization comes from stats skipping
    * and OPTIMIZE ZORDER instead. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val bucket = partitions match {
      case Array() => None
      case Array(t) =>
        Some(org.apache.spark.sql.GraftShims.bucketTransformSpec(t)
          .getOrElse(throw new UnsupportedOperationException(
            s"graft snapshot tables support only PARTITIONED BY " +
              s"(bucket(n, col)), got $t; other layouts come from " +
              "stats skipping and OPTIMIZE ZORDER")))
      case _ => throw new UnsupportedOperationException(
        "graft snapshot tables support only a single bucket(n, col) " +
          "partition transform")
    }
    val spark = SparkSession.active
    val path = tablePath(ident)
    if (Versioned.versions(spark, path).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException((ident.namespace :+ ident.name).toSeq)
    // TBLPROPERTIES are not a surface this catalog persists: refuse
    // loudly instead of silently discarding them (the user believes
    // they were stored). Spark-managed reserved keys are fine; a
    // COMMENT that fits the meta grammar rides the create commit.
    val reserved = Set("comment", "provider", "location", "owner",
      "external", "transient_lastDdlTime")
    val userProps = {
      import scala.jdk.CollectionConverters._
      properties.asScala.filterNot { case (k, _) =>
        reserved.contains(k.toLowerCase(java.util.Locale.ROOT)) ||
          k.startsWith("option.") || k.startsWith("spark.sql.") }
    }
    if (userProps.nonEmpty) throw new UnsupportedOperationException(
      s"graft snapshot tables do not persist TBLPROPERTIES " +
        s"(got ${userProps.keys.mkString(", ")}); per-commit metadata " +
        "rides commit meta instead (Versioned.commit's meta argument, " +
        "surfaced by DESCRIBE HISTORY)")
    val commentMeta = Option(properties.get("comment"))
      .filter(c => !c.contains('\n') && !c.contains('='))
      .map("comment" -> _).toMap
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // "create" refuses ATOMICALLY inside the commit CAS: two racing
    // CREATE TABLEs can never both land version 0 (the pre-check
    // above is just the fast path for the common case)
    try bucket match {
      case Some((c, n)) => Versioned.commitBucketed(empty, path, c, n,
        "create", meta = Map("operation" -> "create") ++ commentMeta)
      case None => Versioned.commit(empty, path, "create",
        meta = Map("operation" -> "create") ++ commentMeta)
    } catch {
      case _: Versioned.CreateConflict =>
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException((ident.namespace :+ ident.name).toSeq)
    }
    loadTable(ident)
  }

  /** ALTER TABLE — ADDITIVE evolution only, as a commit: `ADD COLUMN`
    * (top-level, nullable) appends an empty schema-carrier segment
    * with the widened schema, so the column surfaces as NULL on every
    * existing row through the normal mergeSchema union — the same
    * mechanism an appended wider segment uses, now drivable from DDL.
    * The DDL is itself a version (`operation=add_columns`): time
    * travel to before it reads the old schema. Anything else (drops,
    * renames, type changes, nested adds) still refuses — destructive
    * schema surgery on an immutable-segment lake would either lie
    * about existing files or require rewriting them. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val spark = SparkSession.active
    val path = tablePath(ident)
    if (Versioned.versions(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    // pass 1 — VALIDATE every change's shape before applying ANY:
    // alterTable's contract is apply-atomically, so a batch carrying
    // one unsupported change (REPLACE COLUMNS lowers to deletes+adds)
    // must alter nothing, not drop half the table and then throw
    val ops = changes.map {
      case a: TableChange.AddColumn
          if a.fieldNames.length == 1 && a.isNullable => Left(a)
      // RENAME/DROP COLUMN: metadata-only commits through the column
      // mapping (stable physical names) — segments stay untouched,
      // time travel reads each version under its own names
      case r: TableChange.RenameColumn if r.fieldNames.length == 1 =>
        Right(Versioned.RenameCol(r.fieldNames()(0), r.newName))
      case d: TableChange.DeleteColumn if d.fieldNames.length == 1 =>
        Right(Versioned.DropCol(d.fieldNames()(0), d.ifExists))
      case other => throw new UnsupportedOperationException(
        s"graft catalog supports top-level nullable ADD COLUMN and " +
          s"top-level RENAME/DROP COLUMN; got $other. Type changes " +
          "and nested surgery would misdescribe immutable committed " +
          "segments")
    }
    // pass 2 — apply: all mapping changes land as ONE commit
    // (all-or-nothing, one version); adds follow as one more
    val mapOps = ops.collect { case Right(o) => o }
    val adds = ops.collect { case Left(a) => a }
    if (mapOps.nonEmpty) Versioned.alterColumns(spark, path, mapOps)
    if (adds.isEmpty) return loadTable(ident)
    val cur = Versioned.read(spark, path).schema
    val widened = adds.foldLeft(cur) { (s, a) =>
      val name = a.fieldNames()(0)
      require(!s.fieldNames.exists(_.equalsIgnoreCase(name)),
        s"column $name already exists in ${ident.toString}")
      s.add(name, a.dataType(), nullable = true)
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], widened)
    // Re-ADDing a name whose default physical slot is TOMBSTONED (a
    // prior DROP) or OCCUPIED (the physical backing a renamed column)
    // assigns a FRESH physical name — Iceberg's fresh-field-ID
    // behavior: the new column must never alias old on-disk data.
    val mapping0 = Versioned.columnMapping(spark, path)
    val lower = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
    val taken = scala.collection.mutable.Set.empty[String]
    taken ++= cur.fieldNames.map(lower)
    taken ++= cur.fieldNames.map(n => lower(mapping0.physicalOf(n)))
    taken ++= mapping0.dropped.map(lower)
    taken ++= mapping0.renames.map(p => lower(p._2))
    taken ++= adds.map(a => lower(a.fieldNames()(0)))
    val mapping = adds.foldLeft(mapping0) { (m, a) =>
      val name = a.fieldNames()(0)
      val default = m.physicalOf(name)
      val occupied = !m.logicalOf(default).equalsIgnoreCase(name)
      if (!m.isDropped(default) && !occupied) m
      else {
        var i = 2
        while (taken.contains(lower(s"${name}_$i"))) i += 1
        val fresh = s"${name}_$i"
        graft.operators.ColumnMapping.validateName(fresh)
        taken += lower(fresh)
        m.copy(renames = m.renames :+ (name -> fresh))
      }
    }
    val meta = Map("operation" -> "add_columns",
      "columns" -> adds.map(_.fieldNames()(0)).mkString(",")) ++
      mapping.toMeta
    Versioned.bucketSpec(spark, path) match {
      case Some((c, n)) => // the carrier keeps the bucket layout
        Versioned.commitBucketed(empty, path, c, n, "append", meta)
      case None => Versioned.commit(empty, path, "append", meta)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog does not drop tables: use VACUUM for retention")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog does not rename tables")
}

/** Read view of one resolved snapshot version: scans delegate to
  * Spark's own ParquetTable (vectorized reads, row-group pushdown,
  * column pruning, aggregate pushdown all intact) AFTER the version's
  * file list is cut down by [[StatsPruner]] against the manifest's
  * per-file statistics. At 100 TB this is the difference between
  * scheduling a million file splits and scheduling the handful whose
  * [min,max] windows intersect the query's predicate — decided from
  * ONE manifest read at plan time, no footer probing, no listing. */
object GraftCatalog {
  /** The (table path, resolved version) behind a catalog Table when it
    * is a WRITABLE graft snapshot table (latest-version load) — what
    * lets the MERGE resolution rule recognize a snapshot target and
    * pin its commit to the exact version the scan plan read. Pinned
    * time-travel loads return None: they are read-only by contract. */
  private[graft] def writableSnapshotOf(t: Table): Option[(String, Long)] =
    t match {
      case w: GraftWritableTable => w.reader match {
        case r: GraftSnapshotReadTable => Some((w.path, r.snapVersion))
        case r: GraftDvReadTable => Some((w.path, r.snapVersion))
        case _ => None
      }
      case _ => None
    }
}

/** Catalog face of a deletion-vector-bearing version: a V1 relation
  * scan over the DV-aware [[Versioned.read]]. Correctness-first
  * fallback — Delta solves this with DV-native scan machinery; here
  * the contract is that DVs are a TRANSIENT state between a cheap
  * merge-on-read DELETE and the next OPTIMIZE, so the degraded scan
  * (no manifest-stats pruning, no storage-partitioned joins) is paid
  * only in that window. */
private[sources] class GraftDvReadTable(path: String,
    snapshotVersion: Long,
    tableName: String, tableSchema: StructType)
    extends Table with SupportsRead {
  private[sources] def snapVersion: Long = snapshotVersion
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.V1Scan {
          override def readSchema(): StructType = tableSchema
          override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan](
              context: org.apache.spark.sql.SQLContext): T =
            new org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan {
              override def sqlContext: org.apache.spark.sql.SQLContext = context
              override def schema: StructType = tableSchema
              override def buildScan()
                  : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
                Versioned.read(context.sparkSession, path, Some(snapshotVersion)).rdd
            }.asInstanceOf[T]
        }
    }
}

private[sources] class GraftSnapshotReadTable(path: String,
    snapshotVersion: Long,
    files: Seq[String], delegate: ParquetTable,
    bucket: Option[(String, Int)] = None)
    extends Table with SupportsRead {
  private[sources] def snapVersion: Long = snapshotVersion
  override def name(): String = delegate.name
  override def schema(): StructType = delegate.schema
  override def capabilities(): java.util.Set[TableCapability] =
    delegate.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PruningScanBuilder(SparkSession.active, delegate.name, path,
      snapshotVersion, files, schema(), options, bucket)
}

/** ScanBuilder that intercepts Spark's pushed predicates, drops every
  * file the manifest stats prove irrelevant, and hands the survivors
  * to a ParquetScanBuilder which then applies the SAME predicates at
  * row-group granularity. The table schema is passed down explicitly
  * so pruning can never change the scan's schema (a filter that drops
  * the only segment carrying an evolved column must not un-declare
  * that column). All other pushdown surfaces (columns, aggregates)
  * forward unchanged. */
private[sources] final class PruningScanBuilder(
    spark: SparkSession, tableName: String, tablePath: String,
    version: Long, files: Seq[String], tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    bucket: Option[(String, Int)] = None)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
  import org.apache.spark.sql.connector.expressions.filter.Predicate
  import org.apache.spark.sql.connector.read.Scan
  import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder

  private var inner: ParquetScanBuilder = _
  private var sawFilters = false
  // replay state for the runtime-filter rebuild (RuntimeSkippingScan):
  // the file list the delegate was built over, the catalyst filters
  // Spark pushed, the pruned schema, and whether an aggregate was
  // pushed INTO the parquet scan (aggregated output must not be
  // re-planned over a different file list)
  private var builtFiles: Seq[String] = files
  private var savedPushed: Seq[Expression] = Seq.empty
  private var savedPruned: Option[StructType] = None
  private var aggPushed = false
  // manifest-answered aggregation: candidate set by
  // supportCompletePushDown, promoted by the pushAggregation call
  // Spark makes right after a `true` answer (so a probe that is never
  // pushed can't hijack build())
  private var statsCandidate: Option[(StructType,
    org.apache.spark.sql.catalyst.InternalRow)] = None
  private var statsAnswer: Option[(StructType,
    org.apache.spark.sql.catalyst.InternalRow)] = None

  private def ensure(fileList: Seq[String]): ParquetScanBuilder = {
    if (inner == null) {
      builtFiles = fileList
      inner = ParquetTable(tableName, spark, options, fileList.toIndexedSeq,
        Some(tableSchema), classOf[ParquetFileFormat]).newScanBuilder(options)
    }
    inner
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    // filters arrive ONCE, before column/aggregate pushdown and
    // build() — the one moment the delegate's file list is still open
    sawFilters ||= filters.nonEmpty
    if (inner == null && filters.nonEmpty) {
      val lowered = filters.flatMap(StatsPruner.translate)
      // bucket pruning: equality/IN on the bucket column keeps only
      // the buckets its literals hash to (layout-hash pruning,
      // orthogonal to the min/max stats pruning below)
      val keepBuckets = BucketPruning.resolve(bucket, tableSchema)(
        (c, dt, n) => BucketPruning.targets(filters, c, dt, n))
      if (lowered.nonEmpty || keepBuckets.isDefined) {
        // one manifest read; files without stats are kept unprunable
        val stats = Versioned.fileStats(spark, tablePath, Some(version))
        // bloom point-lookup skipping: equality/IN conjuncts consult
        // the per-file bloom sidecars — the pruner min/max cannot be
        // on high-cardinality unordered keys. False-positive-only:
        // a miss PROVES absence, everything else keeps the file.
        val eqTargets = graft.operators.BloomIndex.equalityTargets(lowered)
        val blooms =
          if (eqTargets.isEmpty) Map.empty[String, (String, String)]
          else Versioned.bloomRefs(spark, tablePath, Some(version))
        val rootPath = new org.apache.hadoop.fs.Path(tablePath)
        def bloomKeeps(f: String): Boolean =
          eqTargets.isEmpty || (blooms.get(f) match {
            case None => true
            case Some((rel, sidecar)) => eqTargets.forall {
              case (c, vs) => graft.operators.BloomIndex.mightContain(
                spark, rootPath, sidecar, rel, c, vs)
            }
          })
        ensure(files.filter { f =>
          stats.get(f).forall(st =>
            lowered.forall(StatsPruner.mayMatch(st, _))) &&
            BucketPruning.keeps(keepBuckets)(f) && bloomKeeps(f)
        })
      }
    }
    savedPushed = filters
    ensure(files).pushFilters(filters)
  }
  override def pushedFilters: Array[Predicate] = ensure(files).pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (statsAnswer.isEmpty) {
      savedPruned = Some(requiredSchema)
      ensure(files).pruneColumns(requiredSchema)
    }
  override def pushAggregation(aggregation: Aggregation): Boolean =
    if (statsCandidate.isDefined) { statsAnswer = statsCandidate; true }
    else {
      aggPushed = ensure(files).pushAggregation(aggregation)
      aggPushed
    }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = {
    // a filterless, group-less aggregation provable from manifest
    // stats never touches data: build() serves ONE precomputed row
    // (see ManifestAggregates — any un-provable part bails here)
    if (!sawFilters) statsCandidate = ManifestAggregates.answer(
      Versioned.fileStats(spark, tablePath, Some(version)),
      files, tableSchema, aggregation)
    statsCandidate.isDefined ||
      ensure(files).supportCompletePushDown(aggregation)
  }
  override def build(): Scan = statsAnswer match {
    case Some((sch, row)) => new ManifestStatsScan(sch, row, tablePath, version)
    case None =>
      val base = ensure(files).build()
      // aggregated scans emit pre-aggregated rows — re-planning them
      // over a runtime-pruned file list would change the answer
      if (aggPushed) base
      else new RuntimeSkippingScan(spark, tableName, tablePath, version,
        builtFiles, tableSchema, options, savedPushed, savedPruned, base,
        bucket)
  }
}

/** Runtime file skipping for snapshot-table scans — the DSv2 face of
  * dynamic partition pruning. Declaring every top-level column
  * filterable lets Catalyst inject a `DynamicPruningSubquery` under a
  * star-schema join: after the (broadcast) dim side executes, Spark
  * hands the fact scan the dim's actual join-key values as an `In`
  * filter, and the scan re-prunes its segment list through the SAME
  * manifest min/max statistics the plan-time path uses
  * ([[StatsPruner]]) before input partitions are planned. At 100 TB
  * this is the join-shaped complement to static skipping: a fact
  * table laid out by commit key (date, region, tenant) only schedules
  * splits for the segments the filtered dim actually references —
  * decided at execution time, no re-compile, no data read (Iceberg's
  * runtime filtering reproduces Delta's DPP behavior the same way).
  *
  * The wrapper delegates to the already-built ParquetScan and swaps
  * the delegate only if the runtime filter proves some segments
  * irrelevant; `BatchScanExec` re-invokes `toBatch` after `filter`,
  * so the narrowed plan is picked up at partition-planning time.
  * Filters that don't lower, files without stats, and empty filter
  * batches all degrade to keep-everything (pruning is an optimization,
  * never a correctness gate). */
private[sources] final class RuntimeSkippingScan(
    spark: SparkSession, tableName: String, private val tablePath: String,
    private val version: Long, private val initialFiles: Seq[String],
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    private val pushedCatalyst:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    private val prunedSchema: Option[StructType],
    initial: org.apache.spark.sql.connector.read.Scan,
    bucketSpec: Option[(String, Int)] = None)
  extends org.apache.spark.sql.connector.read.Scan
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics}
  import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
  import org.apache.spark.sql.{sources => sf}
  import java.util.OptionalLong

  private var delegate: Scan = initial
  /** Segments surviving runtime filtering (spec probe). */
  private[sources] var currentFiles: Seq[String] = initialFiles
  /** The wrapped (possibly runtime-narrowed) parquet scan. */
  private[sources] def delegateScan: Scan = delegate

  override def readSchema(): StructType = delegate.readSchema()

  /** The bucket layout this scan may ADVERTISE: declared on the
    * version, every (statically pruned) file in a bucket dir, and —
    * the r4 filterAttributes lesson — the bucket column still present
    * in the PRUNED output, because Spark resolves the reported
    * `bucket(n, col)` transform against the scan's output attributes
    * and a dangling reference is a plan-time crash, not a skipped
    * optimization. The reported name is the table schema's exact
    * spelling (meta may differ in case). */
  private def activeBucket: Option[(String, Int)] =
    bucketSpec.flatMap { case (c, n) =>
      val visible = delegate.readSchema().fieldNames
        .exists(_.equalsIgnoreCase(c))
      if (!visible) None
      else tableSchema.fieldNames.find(_.equalsIgnoreCase(c))
        .filter(_ => currentFiles.forall(f =>
          graft.operators.Versioned.bucketIdOf(f).isDefined))
        .map(exact => (exact, n))
    }

  /** Storage-partitioned-join report: each bucket is one input
    * partition keyed by its bucket id, clustered by `bucket(n, col)`
    * (resolved through the catalog's FunctionCatalog face). Two graft
    * tables committed with the same spec then join with NO exchange on
    * either side — at 100 TB the write-time shuffle is paid once and
    * every subsequent fact-fact join is co-located, the lake-format
    * equivalent of Hive bucketing (Iceberg SPJ is the public
    * precedent). Unbucketed versions report unknown partitioning,
    * which Spark treats exactly as before. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    activeBucket match {
      case Some((c, n)) =>
        // numPartitions here is NOMINAL (distinct bucket count):
        // BatchScanExec derives the real partitioning by grouping the
        // planned per-split partitions on their own keys and never
        // consults this count — the per-split report is what lets
        // partially-clustered distribution keep a hot bucket's splits
        // as separate tasks
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            Array(org.apache.spark.sql.connector.expressions.Expressions
              .bucket(n, c)),
            currentFiles.flatMap(graft.operators.Versioned.bucketIdOf)
              .distinct.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  override def toBatch: Batch = activeBucket match {
    case Some(_) => new BucketGroupedBatch(delegate.toBatch)
    case None => delegate.toBatch
  }
  override def description(): String = delegate.description()
  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    delegate.supportedCustomMetrics()
  override def reportDriverMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    delegate.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()

  /** Join sizing: the planner reads statistics off THIS scan, not the
    * delegate — without forwarding, a snapshot dim would report the
    * default (effectively infinite) size and never auto-broadcast.
    * sizeInBytes is the delegate's (file-size-based, post static
    * pruning); numRows is EXACT from the manifest when the scan is
    * filterless and every file carries stats — one small manifest
    * read buys the optimizer a number v1 file sources only get from
    * ANALYZE TABLE. */
  private lazy val manifestRows: Option[Long] = {
    val stats = Versioned.fileStats(spark, tablePath, Some(version))
    val known = initialFiles.flatMap(stats.get)
    // pushed filters normally make the manifest count an upper bound —
    // EXCEPT when the stats prove each filter drops nothing in any
    // file. The one case that matters is the join-planner's implicit
    // `IsNotNull(joinKey)` over a null-free column: without this
    // carve-out every dim under a join loses its exact row count (and
    // with it the auto-broadcast decision) to a filter that cannot
    // remove a single row.
    def nonReducing(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Boolean = e match {
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(
          a: org.apache.spark.sql.catalyst.expressions.Attribute) =>
        val lower = a.name.toLowerCase(java.util.Locale.ROOT)
        known.forall(_.cols.get(lower).exists(_.nulls.contains(0L)))
      case _ => false
    }
    if (known.size == initialFiles.size && pushedCatalyst.forall(nonReducing))
      Some(known.map(_.rows).sum)
    else None
  }
  /** sizeInBytes from the manifest's `bytes=` stats (already
    * harvested at commit time): the sum over the statically-pruned
    * file set, so the broadcast decision on a snapshot table needs
    * ZERO delegate file listing — at 100 TB the planner sizes a dim
    * from one cached manifest read instead of a directory walk.
    * Stats-less lines (legacy manifests) fall back to the delegate. */
  private lazy val manifestSize: Option[Long] = {
    val stats = Versioned.fileStats(spark, tablePath, Some(version))
    val known = initialFiles.map(f => stats.get(f).flatMap(_.bytes))
    if (known.forall(_.isDefined)) Some(known.flatten.sum) else None
  }
  override def estimateStatistics(): Statistics = {
    val base = delegate match {
      case s: SupportsReportStatistics => Some(s.estimateStatistics())
      case _ => None
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong =
        manifestSize.map(OptionalLong.of).getOrElse(
          base.map(_.sizeInBytes()).getOrElse(OptionalLong.empty()))
      override def numRows(): OptionalLong =
        manifestRows.map(OptionalLong.of).getOrElse(
          base.map(_.numRows()).getOrElse(OptionalLong.empty()))
    }
  }

  /** Only columns the (possibly pruned) scan still OUTPUTS are
    * runtime-filterable: Spark resolves these names against the scan's
    * output attributes, so declaring a pruned-away column makes
    * `PartitionPruning.getFilterableTableScan` throw an
    * `AnalysisException` at planning time — e.g. a bare `count()` over
    * a column-pruned catalog join would fail outright. Stats-based
    * re-pruning in `filter` only ever narrows the file list, so
    * restricting the declared set loses nothing but the crash. */
  override def filterAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val visible = delegate.readSchema().fieldNames.toSet
    tableSchema.fieldNames.filter(visible)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
  }

  // stable-field equality (table, version, file list, pushdown state):
  // ParquetScan is a case class, so same-table scans used to compare
  // equal and ReuseExchange deduplicated self-join subtrees — the
  // wrapper must not lose that (Iceberg's scans override equality for
  // the same reason). The MUTABLE runtime-filter state stays out:
  // BatchScanExec equality already separates nodes by their runtime
  // filters, so differently-filtered instances never merge.
  override def equals(other: Any): Boolean = other match {
    case r: RuntimeSkippingScan =>
      tablePath == r.tablePath && version == r.version &&
        initialFiles == r.initialFiles &&
        pushedCatalyst == r.pushedCatalyst &&
        prunedSchema == r.prunedSchema
    case _ => false
  }
  override def hashCode(): Int =
    (tablePath, version, initialFiles).hashCode()

  override def filter(filters: Array[sf.Filter]): Unit =
    if (filters.nonEmpty) {
      val stats = Versioned.fileStats(spark, tablePath, Some(version))
      // runtime bucket pruning: a DPP In-filter on the bucket column
      // (the dim side's actual join keys) hashes straight to the
      // reachable buckets — stats and layout prune independently
      val keepBuckets = BucketPruning.resolve(bucketSpec, tableSchema)(
        (c, dt, n) => BucketPruning.targetsSource(filters.toSeq, c, dt, n))
      val kept = currentFiles.filter { f =>
        stats.get(f).forall(st =>
          filters.forall(StatsPruner.mayMatch(st, _))) &&
          BucketPruning.keeps(keepBuckets)(f)
      }
      if (kept.size < currentFiles.size) {
        currentFiles = kept
        val b: ParquetScanBuilder =
          ParquetTable(tableName, spark, options, kept.toIndexedSeq,
            Some(tableSchema), classOf[ParquetFileFormat])
            .newScanBuilder(options)
        if (pushedCatalyst.nonEmpty) b.pushFilters(pushedCatalyst)
        prunedSchema.foreach(b.pruneColumns)
        delegate = b.build()
      }
    }
}

/** Writable view of a snapshot table: reads delegate to the pruning
  * read table (vectorization/pushdown/file skipping intact); writes go
  * through the V1Write bridge — the batch DataFrame lands as ONE
  * atomic manifest commit (`Versioned.commit`), append for INSERT
  * INTO, overwrite for INSERT OVERWRITE. Executors never write into
  * live segment dirs: the commit stages a fresh uuid segment and
  * renames the manifest, so a failed INSERT leaves the table untouched
  * (no Hadoop commit-protocol half-states — the lake format's
  * invariant extends to SQL writes). */
private[sources] class GraftWritableTable(
    private[sources] val path: String,
    private[sources] val reader: Table with SupportsRead)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  import org.apache.spark.sql.{sources => f}
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, coalesce, not}

  /** Translate a pushed v1 filter to a Column; None = can't, so Spark
    * reports an unsupported-DELETE error instead of silently matching
    * nothing. */
  private def toColumn(filter: f.Filter): Option[Column] = filter match {
    case f.EqualTo(a, v) => Some(col(a) === lit(v))
    case f.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case f.GreaterThan(a, v) => Some(col(a) > lit(v))
    case f.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case f.LessThan(a, v) => Some(col(a) < lit(v))
    case f.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case f.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case f.IsNull(a) => Some(col(a).isNull)
    case f.IsNotNull(a) => Some(col(a).isNotNull)
    case f.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case f.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case f.StringContains(a, v) => Some(col(a).contains(v))
    case f.And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case f.Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case f.Not(c) => toColumn(c).map(not)
    case _: f.AlwaysTrue => Some(lit(true))
    case _: f.AlwaysFalse => Some(lit(false))
    case _ => None
  }

  override def canDeleteWhere(filters: Array[f.Filter]): Boolean =
    filters.forall(toColumn(_).isDefined)

  /** `DELETE FROM graft.ns.t WHERE …` — the surviving rows are
    * committed as a new version (operation=delete): readers never see
    * a partial delete, and the pre-delete state stays time-travelable
    * until VACUUM (Delta's DELETE discipline on the manifest log). SQL
    * NULL semantics: rows where the predicate is NULL are KEPT.
    * Copy-on-write: the pushed filters scope the rewrite through the
    * manifest stats, so segments provably free of matches are carried
    * forward without being read. */
  override def deleteWhere(filters: Array[f.Filter]): Unit = {
    val spark = SparkSession.active
    val cond = filters.flatMap(toColumn(_)).reduceOption(_ && _)
      .getOrElse(lit(true))
    val scope: graft.operators.SegmentStats.FileStats => Boolean =
      if (filters.isEmpty) _ => true
      else st => filters.forall(StatsPruner.mayMatch(st, _))
    Versioned.rewrite(spark, path, scope, cond,
      subset => subset.where(not(coalesce(cond, lit(false)))),
      Map("operation" -> "delete"),
      Versioned.bloomLinePruner(spark, path, filters.toIndexedSeq))
    ()
  }

  override def name(): String = reader.name
  override def schema(): StructType = reader.schema
  override def capabilities(): java.util.Set[TableCapability] = {
    val s = new java.util.HashSet[TableCapability](reader.capabilities())
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    reader.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                legacyOverwrite: Boolean): Unit = {
              val mode =
                if (overwrite || legacyOverwrite) "overwrite" else "append"
              // SQL writes keep a bucketed table bucketed: an INSERT
              // that silently de-bucketed would cost every later join
              // its co-partitioning (Hive/Spark reject such writes;
              // re-bucketing the increment is strictly better)
              Versioned.bucketSpec(SparkSession.active, path) match {
                case Some((c, n)) =>
                  Versioned.commitBucketed(data, path, c, n, mode)
                case None => Versioned.commit(data, path, mode)
              }
              ()
            }
          }
      }
    }
}
