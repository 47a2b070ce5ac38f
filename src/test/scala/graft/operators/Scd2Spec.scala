package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("applyChanges closes changed rows, inserts new versions and keys, " +
    "leaves equal-attr and absent keys untouched") {
    val history = Seq(
      // k=1 has a closed old version + a current one
      (1L, "v1", ts("2024-01-01 00:00:00"), Option(ts("2024-02-01 00:00:00"))),
      (1L, "v2", ts("2024-02-01 00:00:00"), None),
      (2L, "w1", ts("2024-01-15 00:00:00"), None),
      (3L, "x1", ts("2024-01-20 00:00:00"), None))
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "v3", ts("2024-03-01 00:00:00")), // changed -> close + insert
      (2L, "w1", ts("2024-03-01 00:00:00")), // equal attrs -> no-op
      (4L, "y1", ts("2024-03-01 00:00:00"))) // new key -> insert
      .toDF("k", "attr", "ts")

    val out = Scd2.applyChanges(history, updates, Seq("k"), Seq("attr"), "ts")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet

    assert(out == Set(
      (1L, "v1", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00"))),
      (1L, "v2", ts("2024-02-01 00:00:00"), Some(ts("2024-03-01 00:00:00"))),
      (1L, "v3", ts("2024-03-01 00:00:00"), None),
      (2L, "w1", ts("2024-01-15 00:00:00"), None), // not churned
      (3L, "x1", ts("2024-01-20 00:00:00"), None), // absent from batch
      (4L, "y1", ts("2024-03-01 00:00:00"), None)))
    // invariant: exactly one current row per live key
    val currents = out.filter(_._4.isEmpty).groupBy(_._1).map(_._2.size)
    assert(currents.forall(_ == 1))
  }
}
