package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful processing v2 (`transformWithState`, the Spark
  * 4.x successor to flatMapGroupsWithState): the same 30-minute-gap
  * sessionization fold st3 hand-rolls, re-expressed on the new API —
  * one typed per-key [[ValueState]] (last-seen ts, session count,
  * event count) in the RocksDB state store, update-mode emissions of
  * the running totals after each micro-batch.
  *
  * Scale shape: state per key is three longs regardless of event
  * volume, the store is keyed by the groupBy shuffle partitioning, and
  * TTL (here NONE for oracle determinism; production sets a horizon)
  * bounds key cardinality over unbounded streams — strictly better
  * operational behavior than the HDFS-backed store the v1 API defaults
  * to, because RocksDB keeps hot state off-heap with changelog
  * checkpoints. */
class SessionCountProcessor(gapMicros: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Long)]("sess",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long)] = {
    val times = rows.map(_._2).toArray
    java.util.Arrays.sort(times)
    var (last, sess, nev) =
      if (state.exists()) state.get() else (Long.MinValue, 0L, 0L)
    times.foreach { t =>
      if (last == Long.MinValue || t - last > gapMicros) sess += 1
      last = t; nev += 1
    }
    state.update((last, sess, nev))
    Iterator((key, sess, nev))
  }
}
