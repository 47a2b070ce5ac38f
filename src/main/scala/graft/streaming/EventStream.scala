package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming components (SURVEY.md §2.9): the reference's
  * hand-built incremental semantics (watermark predicate + chunk loop +
  * MERGE state) re-expressed on Spark's streaming engine.
  *
  *  - `tumblingCounts`: windowed aggregation with a real event-time
  *    watermark (the streaming analogue of the chunk loop — the engine
  *    owns chunk boundaries and late-data handling; the reference's
  *    80-hour lag maps onto `withWatermark`).
  *  - `runningUserCounts`: keyed running state via mapGroupsWithState —
  *    the `TableLoadDetails`-MERGE pattern (per-key state updated each
  *    micro-batch) without hand-rolled MERGE.
  */
object EventStream {

  final case class UserCount(user_id: Long, n_events: Long)

  /** Tumbling-window counts with an event-time watermark allowing
    * `lateness` of late data (append mode → only finalized windows). */
  def tumblingCounts(events: DataFrame, window_ : String,
      lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"))

  /** Per-user running event count held in group state across
    * micro-batches (update mode: emits the refreshed count per key per
    * batch). */
  def runningUserCounts(events: Dataset[(Long, Long)]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          UserCount(uid, total)
      }
  }
}
