package graft.streaming

import graft.operators.Versioned
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming source tailing a [[Versioned]] snapshot table's
  * commit log — the Delta streaming-source surface (Delta's own
  * `DeltaSource` is this same v1 `Source` shape) for graft's lake
  * format:
  *
  * {{{
  *   spark.readStream
  *     .format("graft-changes")
  *     .option("path", "/lake/ns/t")
  *     .load()
  * }}}
  *
  * Offsets are COMMIT VERSIONS: micro-batch (v1, v2] reads exactly the
  * data files version v2 references that v1 didn't (append deltas;
  * an overwrite surfaces its new snapshot — file-level semantics,
  * same contract as [[Versioned.changes]]). Spark's checkpointed
  * offset log makes restarts resume from the last committed version,
  * so with an idempotent sink (e.g. [[UpsertSink]] keyed MERGE) the
  * pipeline is effectively-once — this supersedes the hand-rolled
  * cursor of [[Versioned.consumeChanges]] when the consumer is a
  * streaming query rather than a batch job.
  *
  * Scale: getOffset is O(log listing); a batch plan is O(manifest
  * diff) and hands Spark an explicit parquet file list — vectorized
  * reads, pushdown and AQE apply unchanged. No directory globs, no
  * per-record state. A vacuumed start version degrades to a full
  * re-read of the latest snapshot (logged), mirroring
  * consumeChanges' at-least-once recovery rather than dying.
  */
class ChangeFeedSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def pathOf(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "graft-changes source requires .option(\"path\", <table dir>)"))

  private def cdfOf(params: Map[String, String]): Boolean =
    params.get("readChangeFeed").exists(_.trim.equalsIgnoreCase("true"))

  /** Stream schema: the table schema, plus the CDF tag columns when
    * `readChangeFeed` is on (Delta's `readChangeFeed` option shape). */
  private def schemaFor(ctx: SQLContext, schema: Option[StructType],
      params: Map[String, String]): StructType = {
    val base = schema.getOrElse(
      Versioned.read(ctx.sparkSession, pathOf(params)).schema)
    if (!cdfOf(params)) base
    else {
      // each tag column is added INDEPENDENTLY if absent: a table that
      // materialized a prior CDF output legitimately carries
      // _change_type without _commit_version — gating both on the
      // first would freeze a schema that silently projects the
      // version tag away from every micro-batch
      var s = base
      if (!s.fieldNames.contains(Versioned.ChangeTypeCol))
        s = s.add(Versioned.ChangeTypeCol,
          org.apache.spark.sql.types.StringType, nullable = false)
      if (!s.fieldNames.contains(Versioned.CommitVersionCol))
        s = s.add(Versioned.CommitVersionCol,
          org.apache.spark.sql.types.LongType, nullable = false)
      s
    }
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) =
    // schema is frozen at stream start from the LATEST version (the
    // standard streaming-source contract; additive columns appearing
    // mid-stream surface on restart)
    ("graft-changes", schemaFor(ctx, schema, params))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val path = pathOf(params)
    val frozen = schemaFor(ctx, schema, params)
    val pace = params.get("maxVersionsPerTrigger").map { v =>
      val n = v.toLong
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
      n
    }
    val byteBudget = params.get("maxBytesPerTrigger").map { v =>
      // Delta's option shape: plain bytes or a size string ("512m")
      val n = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
      require(n >= 1, s"maxBytesPerTrigger must be >= 1 byte, got $v")
      n
    }
    val startingVersion = params.get("startingVersion").map { v =>
      val n = v.toLong
      require(n >= 0, s"startingVersion must be >= 0, got $n")
      n
    }
    new ChangeFeedSource(ctx, path, frozen, pace, startingVersion,
      rowCdf = cdfOf(params), metadataPath = metadataPath,
      maxBytesPerTrigger = byteBudget)
  }
}

class ChangeFeedSource(ctx: SQLContext, table: String,
    frozenSchema: StructType,
    // admission control (the Delta maxFilesPerTrigger analog): at most
    // this many VERSIONS per micro-batch after the initial snapshot, so
    // a consumer restarted after long downtime drains a deep backlog in
    // bounded batches instead of one giant catch-up job
    maxVersionsPerTrigger: Option[Long] = None,
    // Delta's startingVersion: the FIRST batch delivers only data
    // committed in versions >= this, instead of the full snapshot —
    // the "tail from here, skip history" entry point. Ignored once a
    // checkpoint exists (the offset log wins on restart).
    startingVersion: Option[Long] = None,
    // Delta's readChangeFeed: each micro-batch delivers ROW-LEVEL
    // change rows ([[Versioned.rowChanges]]) tagged _change_type /
    // _commit_version instead of raw added-file rows, so a COW
    // UPDATE/DELETE surfaces its exact row deltas downstream. The
    // initial snapshot arrives as `insert` rows, same as Delta's
    // startingVersion=0 CDF read.
    rowCdf: Boolean = false,
    metadataPath: String = "",
    // Delta's maxBytesPerTrigger: a SOFT byte cap per micro-batch from
    // the manifests' bytes= stats — versions are admitted until the
    // cumulative ADDED bytes would exceed the budget, always at least
    // one (progress is never starved). This is the knob a production
    // tailer actually sets: after long downtime the backlog's depth in
    // VERSIONS says nothing about batch cost, its bytes do.
    maxBytesPerTrigger: Option[Long] = None) extends Source
    with SupportsTriggerAvailableNow with Logging {

  override def schema: StructType = frozenSchema

  /** Trigger.AvailableNow: pin the end of the run to the versions
    * committed when the trigger fired — commits racing in mid-run wait
    * for the next one. */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Versioned.versions(ctx.sparkSession, table).lastOption
    logInfo(s"AvailableNow run capped at version $availableNowCap of $table")
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control offset: latest committed version, clamped to
    * the AvailableNow cap when one is armed and paced by
    * maxVersionsPerTrigger once a start offset exists (the initial
    * snapshot batch is always whole — it reads one version's files). */
  override def latestOffset(start: ConnectorOffset,
      limit: ReadLimit): ConnectorOffset = {
    val latest = Versioned.versions(ctx.sparkSession, table).lastOption
    val capped = availableNowCap match {
      case Some(c) => latest.map(math.min(_, c))
      case None => latest
    }
    val paced = (Option(start), maxVersionsPerTrigger) match {
      case (Some(s), Some(m)) => capped.map(math.min(_, versionOf(s) + m))
      case _ => capped
    }
    val byted = (Option(start), maxBytesPerTrigger) match {
      case (Some(s), Some(budget)) =>
        paced.map(cap => admitByBytes(versionOf(s), cap, budget))
      case _ => paced
    }
    byted.map(LongOffset(_)).orNull
  }

  /** Walk versions (from, cap] admitting while the cumulative added
    * bytes stay within budget — at least one, soft overshoot on the
    * last (Delta's maxBytesPerTrigger semantics). Only the manifests
    * of versions actually admitted (+1) are consulted, so a deep
    * backlog costs O(admitted) manifest diffs per trigger, not
    * O(backlog). */
  private def admitByBytes(from: Long, cap: Long, budget: Long): Long = {
    var end = from
    var acc = 0L
    var v = from + 1
    while (v <= cap && acc < budget) {
      acc += bytesAddedIn(v)
      end = v
      v += 1
    }
    end
  }

  /** Bytes the manifest says version v ADDED over v-1: stats-borne
    * (`bytes=`) where present, file-status fallback for legacy lines,
    * and a budget-filling sentinel when the diff itself is unreadable
    * (e.g. a vacuumed predecessor) — conservative single-version
    * admission beats a dead stream or an unbounded batch. */
  private def bytesAddedIn(v: Long): Long = {
    val spark = ctx.sparkSession
    try {
      val added = Versioned.changedFiles(spark, table, v - 1, v)._1
      if (added.isEmpty) 0L
      else {
        val stats = Versioned.fileStats(spark, table, Some(v))
        added.iterator.map { f =>
          stats.get(f).flatMap(_.bytes).getOrElse {
            val p = new org.apache.hadoop.fs.Path(f)
            val fs = p.getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            try fs.getFileStatus(p).getLen
            catch { case _: java.io.FileNotFoundException => 0L }
          }
        }.sum
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"could not size version $v of $table for " +
          s"maxBytesPerTrigger (${e.getMessage}); admitting it alone")
        Long.MaxValue / 4
    }
  }

  /** Latest committed version, as the stream's high-water offset. */
  override def getOffset: Option[Offset] =
    Versioned.versions(ctx.sparkSession, table).lastOption.map(LongOffset(_))

  /** Micro-batch (start, end]: the parquet files end references that
    * start didn't. Offsets arrive as LongOffset in-session and as
    * SerializedOffset after a checkpoint restart — `json` is the
    * version number in both. The result plan must be tagged
    * isStreaming=true (MicroBatchExecution asserts it), so the file
    * list goes through GraftShims.streamingParquetFrame; the frozen
    * schema is passed as the user schema, which also pins the stream's
    * column set when later segments carry added columns. */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    if (rowCdf) return getCdfBatch(start, end)
    val spark = ctx.sparkSession
    val endV = versionOf(end)
    val live = Versioned.versions(spark, table)
    // VACUUM can outrun the checkpoint on either end of the batch: a
    // replayed batch's END version (offset logged, commit log behind)
    // or the committed START version may both be gone. At-least-once
    // means never losing rows, so a vacuumed endpoint degrades to the
    // latest surviving snapshot (possible duplicates, never loss,
    // never a dead stream) — the consumeChanges recovery contract.
    val files = start.map(versionOf) match {
      case _ if !live.contains(endV) =>
        logWarning(s"change-feed end version $endV of $table was " +
          "vacuumed (batch replay after vacuum); delivering the " +
          "latest surviving snapshot")
        Versioned.versionFiles(spark, table, None)
      case Some(fromV) if !live.contains(fromV) =>
        logWarning(s"change-feed start version $fromV of $table was " +
          s"vacuumed; re-reading full snapshot at version $endV")
        Versioned.versionFiles(spark, table, Some(endV))
      case Some(fromV) =>
        Versioned.changedFiles(spark, table, fromV, endV)._1
      case None => startingVersion match {
        // first batch with a starting version: only data committed in
        // versions >= sv (the (sv-1, endV] manifest diff); sv=0 or a
        // vacuumed sv-1 degrade to the endV snapshot (never loss)
        case Some(sv) if sv > 0 && sv <= endV && live.contains(sv - 1) =>
          Versioned.changedFiles(spark, table, sv - 1, endV)._1
        case Some(sv) if sv > endV =>
          Seq.empty // nothing committed at/after sv yet
        case Some(sv) if sv > 0 =>
          logWarning(s"startingVersion ${sv}'s predecessor manifest of " +
            s"$table is vacuumed; delivering the full version-$endV " +
            "snapshot instead")
          Versioned.versionFiles(spark, table, Some(endV))
        case _ => Versioned.versionFiles(spark, table, Some(endV))
      }
    }
    val frame = org.apache.spark.sql.GraftShims.streamingParquetFrame(
      spark, if (files.nonEmpty) files
             else Versioned.versionFiles(spark, table, Some(endV)),
      frozenSchema)
    if (files.nonEmpty) frame else frame.limit(0)
  }

  /** Row-CDF micro-batch: compute [[Versioned.rowChanges]] for
    * (start, end], MATERIALIZE it under the stream's own metadata dir,
    * and hand Spark a streaming scan of the materialized files. The
    * staging hop is load-bearing twice over: (a) the diff plan
    * contains Except, which Spark's streaming unsupported-operations
    * check rejects inside a streaming plan — a file scan is always
    * admissible; (b) a replayed batch re-reads its already-staged
    * files byte-identically, even after a VACUUM removed the versions
    * it was diffed from (the `_SUCCESS`-guarded reuse), which is a
    * stronger replay story than the raw feed's
    * degrade-to-latest-snapshot. Staging cost tracks the consumed
    * delta per batch; the dirs live inside the checkpoint location
    * and go with it.
    *
    * Fallbacks mirror the raw feed's at-least-once discipline: a
    * vacuumed start/end or a diff range with vacuumed interior
    * versions degrades to the latest surviving snapshot delivered as
    * `insert` rows (logged), never a dead stream. */
  private def getCdfBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val spark = ctx.sparkSession
    val endV = versionOf(end)
    val live = Versioned.versions(spark, table)
    def snapshotInserts(v: Long): DataFrame = {
      val snapV = if (live.contains(v)) Some(v) else None
      // the tag must name the version actually READ: a vacuumed `v`
      // degrades to the latest surviving snapshot, and stamping that
      // data as the older `v` would let a version-deduping consumer
      // ("already processed <= v") silently discard the whole batch —
      // turning the at-least-once recovery into data loss
      val readV = snapV.orElse(live.lastOption).getOrElse(v)
      Versioned.read(spark, table, snapV)
        .withColumn(Versioned.ChangeTypeCol, lit("insert"))
        .withColumn(Versioned.CommitVersionCol, lit(readV))
    }
    def diffOr(fromV: Long): DataFrame =
      if (((fromV + 1) to endV).forall(live.contains))
        Versioned.rowChanges(spark, table, fromV, endV)
      else {
        logWarning(s"row-CDF range ($fromV, $endV] of $table has " +
          "vacuumed versions; delivering the latest surviving " +
          "snapshot as inserts")
        snapshotInserts(endV)
      }
    val fromTag = start.map(versionOf)
    val batch: DataFrame = fromTag match {
      case _ if !live.contains(endV) =>
        logWarning(s"row-CDF end version $endV of $table was vacuumed " +
          "(batch replay after vacuum); delivering the latest " +
          "surviving snapshot as inserts")
        snapshotInserts(endV)
      case Some(fromV) if live.contains(fromV) => diffOr(fromV)
      case Some(_) => snapshotInserts(endV)
      case None => startingVersion match {
        case Some(sv) if sv > endV => snapshotInserts(endV).limit(0)
        case Some(sv) if sv > 0 && live.contains(sv - 1) => diffOr(sv - 1)
        case _ => snapshotInserts(endV)
      }
    }
    val stageDir = new org.apache.hadoop.fs.Path(
      metadataPath, s"cdf/${fromTag.getOrElse(-1L)}_$endV")
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new org.apache.hadoop.fs.Path(stageDir, "_SUCCESS")
    if (!fs.exists(success)) // half-written stage (crash): overwrite
      batch.write.mode("overwrite").parquet(stageDir.toString)
    // retention: a batch whose END precedes this batch's START belongs
    // to a COMMITTED offset range (Spark replays at most the last
    // uncommitted batch, and offsets advance in order) — its stage can
    // never be read again, so drop it instead of accreting one dir per
    // micro-batch for the stream's lifetime
    fromTag.foreach { start =>
      try {
        val cdfRoot = new org.apache.hadoop.fs.Path(metadataPath, "cdf")
        if (fs.exists(cdfRoot)) fs.listStatus(cdfRoot).foreach { st =>
          val name = st.getPath.getName
          val endOf = name.split('_').lastOption
            .flatMap(s => scala.util.Try(s.toLong).toOption)
          if (endOf.exists(_ < start)) fs.delete(st.getPath, true)
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    val files = fs.listStatus(stageDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    // an all-empty-tasks write can stage zero part files; the batch
    // plan still needs a scan, so borrow the snapshot's files under
    // the CDF schema (absent columns read null) and emit no rows
    if (files.nonEmpty)
      org.apache.spark.sql.GraftShims.streamingParquetFrame(
        spark, files, frozenSchema)
    else
      org.apache.spark.sql.GraftShims.streamingParquetFrame(
        spark, Versioned.versionFiles(spark, table,
          if (live.contains(endV)) Some(endV) else None),
        frozenSchema).limit(0)
  }

  private def versionOf(o: ConnectorOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()
}
