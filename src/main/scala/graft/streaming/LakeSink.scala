package graft.streaming

import graft.operators.Versioned
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming sink committing each micro-batch as a [[Versioned]]
  * snapshot version — the write half of the lake's streaming surface
  * ([[ChangeFeedSource]] is the read half, so a lake-to-lake pipeline
  * is one streaming query end to end):
  *
  * {{{
  *   df.writeStream
  *     .format("graft-lake")
  *     .option("path", "/lake/ns/t")      // append commits (default)
  *     .option("mode", "overwrite")       // or: re-snapshot per batch
  *     .option("checkpointLocation", cp)
  *     .start()
  * }}}
  *
  * Exactly-once without an idempotent payload: the committed manifest
  * carries the (queryId, batchId) PAIR as metadata — one rename
  * commits data and marker atomically (the AggSink discipline), so a
  * replayed batch after a crash sees `batchId <=` this query's latest
  * marker and skips, and a batch that crashed pre-rename left only an
  * invisible segment dir for vacuum to sweep. The marker lookup walks
  * the version history backward PAST commits that aren't this query's
  * (batch appends, DML, another query's batches) to the newest marker
  * carrying the same queryId — the same txnAppId/txnVersion discipline
  * Delta's sink uses, and what makes the guarantee survive interleaved
  * writers. Dedup on the pair rather than a bare batchId matters
  * twice over: a FRESH query (new checkpoint) restarting at batchId 0
  * against a table with old markers must not silently skip its first
  * batches, and an interleaved non-sink commit must not erase the
  * marker and let a replay commit twice. queryId is the streaming
  * query's checkpoint-stable id (read from the spark-local property
  * the stream execution sets), so the guarantee spans restarts.
  * Downstream consumers see exactly one version per folded batch, in
  * order, with the offset provenance readable via `DESCRIBE HISTORY`.
  */
class LakeSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  override def createSink(ctx: SQLContext, params: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val path = params.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake sink requires .option(\"path\", <table dir>)"))
    val mode = params.getOrElse("mode", "append")
    require(mode == "append" || mode == "overwrite",
      s"graft-lake mode must be append or overwrite, got '$mode'")
    // optional bucketed layout: every micro-batch commits with the
    // same bucket routing, so the streamed table is co-bucketable
    // with batch tables and joins downstream with zero exchanges —
    // streaming ingestion paying the layout shuffle per batch instead
    // of a giant retroactive rewrite
    val bucket = (params.get("bucketcolumn"), params.get("numbuckets")) match {
      case (Some(c), Some(n)) =>
        // fail at sink creation with the option named, not with a bare
        // NumberFormatException (or, for 0/-1, deep inside the first
        // micro-batch's commit)
        val parsed = scala.util.Try(n.trim.toInt).toOption.filter(_ > 0)
          .getOrElse(throw new IllegalArgumentException(
            s"graft-lake .option(\"numBuckets\", ...) must be a " +
              s"positive integer, got '$n'"))
        Some((c, parsed))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "graft-lake bucketing needs BOTH .option(\"bucketColumn\", c) " +
          "and .option(\"numBuckets\", n)")
    }
    new LakeSink(path, mode, bucket)
  }
}

object LakeSink {
  /** Newest committed batchId for `queryId` (−1 if none), plus the
    * number of manifests the backward walk actually opened. The walk
    * stops at the FIRST marker belonging to this query, so in
    * steady-state (this sink is the only writer) it opens exactly one
    * manifest per batch; interleaved non-sink commits bound it by the
    * interleave depth since this query's last commit, never by table
    * history — except a fresh query's very first batch on a table with
    * no marker of its own, which must prove the negative once.
    * Exposed for the bounded-scan assertion in ChangeFeedSourceSpec. */
  private[streaming] def lastCommitted(
      spark: org.apache.spark.sql.SparkSession, table: String,
      queryId: Option[String]): (Long, Int) = {
    var scanned = 0
    val last = Versioned.versions(spark, table).reverseIterator
      .map { v => scanned += 1; Versioned.readMeta(spark, table, v) }
      .collectFirst {
        // newest marker of THIS query, skipping interleaved non-sink
        // commits and other queries' markers
        case m if m.contains("batchId") && m.get("queryId") == queryId =>
          m("batchId").toLong
      }.getOrElse(-1L)
    (last, scanned)
  }
}

class LakeSink(table: String, mode: String,
    bucket: Option[(String, Int)] = None) extends Sink with Logging {

  override def name(): String = s"graft-lake [$table]"

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // checkpoint-stable query identity; set by MicroBatchExecution on
    // the thread running addBatch. Absent only when addBatch is driven
    // outside a streaming query (tests) — then dedup keys on the
    // marker-bearing history alone, preserving the old behavior.
    val queryId = Option(spark.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime
        .StreamExecution.QUERY_ID_KEY))
    val (lastCommitted, _) =
      LakeSink.lastCommitted(spark, table, queryId)
    if (batchId <= lastCommitted) {
      logInfo(s"skipping replayed batch $batchId for $table " +
        s"(queryId=$queryId latest committed batchId=$lastCommitted)")
      return
    }
    // the DataFrame handed to a v1 sink rides the micro-batch's
    // IncrementalExecution — new actions on it (like a parquet write)
    // must go through a re-wrapped batch frame over the same rows
    val batch = org.apache.spark.sql.GraftShims.unstream(data)
    val meta = Map("batchId" -> batchId.toString) ++
      queryId.map("queryId" -> _)
    bucket match {
      case Some((c, n)) =>
        Versioned.commitBucketed(batch, table, c, n, mode, meta)
      case None => Versioned.commit(batch, table, mode, meta)
    }
    ()
  }
}
