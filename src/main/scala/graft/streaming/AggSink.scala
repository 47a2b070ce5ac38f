package graft.streaming

import graft.operators.Versioned
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of a materialized aggregate — the rollup table
  * a BI layer reads, kept current per micro-batch instead of recomputed
  * nightly over the whole lake (the reference's consumers re-aggregate
  * everything downstream of `Ingest:329-415`; this is the streaming
  * form of [[graft.operators.IncrementalAgg]]).
  *
  * Unlike [[UpsertSink]], an aggregate fold is NOT idempotent: replaying
  * a micro-batch after a crash would double-count it. Exactly-once here
  * comes from committing each fold as a [[Versioned]] snapshot whose
  * manifest carries the folded `batchId` as metadata — manifest rename
  * is the single atomic commit point, so the data and the batch marker
  * can never disagree. A replayed batch sees `batchId <=` the latest
  * version's marker and skips; a batch that crashed before the rename
  * left only an orphaned (invisible) segment dir, swept by vacuum.
  *
  * Each fold re-aggregates ONLY the groups present in the batch
  * (anti-join keeps untouched groups' rows as-is) and commits a new
  * full snapshot; at 100 TB the commit cost is the snapshot WRITE, so
  * the production variant partitions the aggregate table and commits
  * only touched partitions' segments — same manifest discipline, noted
  * in Versioned's scaladoc.
  */
object AggSink {

  /** Start a foreachBatch fold of `stream` into the Versioned aggregate
    * table at `table`: group by `keys`, count as `countAs`, sum each
    * `sums` source column into its alias. */
  def start(stream: DataFrame, table: String, keys: Seq[String],
      countAs: String, sums: Seq[(String, String)],
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, table, keys, countAs, sums, batchId)
      }
      .start()

  /** Fold one micro-batch (exposed for replay testing). No-op when the
    * latest committed version already covers `batchId`. */
  def foldBatch(batch: DataFrame, table: String, keys: Seq[String],
      countAs: String, sums: Seq[(String, String)], batchId: Long): Unit = {
    val spark = batch.sparkSession
    val latest = Versioned.versions(spark, table).lastOption
    val lastFolded = latest
      .flatMap(v => Versioned.readMeta(spark, table, v).get("batchId"))
      .map(_.toLong).getOrElse(-1L)
    if (batchId <= lastFolded) return // checkpoint replay: already folded

    val batchAgg = batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countAs),
        sums.map { case (src, al) => sum(col(src)).as(al) }: _*)
    val snapshot = latest match {
      case None => batchAgg
      case Some(v) =>
        val existing = Versioned.read(spark, table, Some(v))
        val untouched =
          existing.join(batchAgg.select(keys.map(col): _*), keys, "left_anti")
        val combined = existing
          .join(batchAgg.select(keys.map(col): _*), keys, "left_semi")
          .unionByName(batchAgg)
          .groupBy(keys.map(col): _*)
          .agg(sum(col(countAs)).cast("long").as(countAs),
            sums.map { case (_, al) =>
              sum(col(al)).cast(existing.schema(al).dataType).as(al)
            }: _*)
        untouched.unionByName(combined)
    }
    Versioned.commit(snapshot, table, "overwrite",
      meta = Map("batchId" -> batchId.toString))
    ()
  }
}
