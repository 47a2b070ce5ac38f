package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CheckSpec extends SparkSpec {
  import spark.implicits._

  test("each rule counts exactly its injected violations") {
    val child = Seq(
      (1L, Some("a"), 5.0), (2L, None: Option[String], 60.0), // null s; v>50
      (2L, Some("c"), 7.0), (2L, Some("c2"), 8.0),            // dup key 2 ×3
      (9L, Some("x"), 9.0))                                   // orphan
      .toDF("k", "s", "v")
    val parent = Seq(1L, 2L).toDF("pk")

    val got = Check.run(Seq(
      Check.notNull(child, Seq("s")),
      Check.unique(child, Seq("k")),
      Check.referential(child, parent, "k", "pk"),
      Check.satisfies(child, "v_range", $"v".between(0, 50))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(got("not_null(s)") == 1)
    assert(got("unique(k)") == 2, "three rows with k=2 -> two extras")
    assert(got("ref(k->pk)") == 1)
    assert(got("v_range") == 1)
  }

  test("a clean frame yields all-zero violations") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val got = Check.run(Seq(
      Check.notNull(df, Seq("k", "s")),
      Check.unique(df, Seq("k"))))
      .select(sum($"violations")).head().getLong(0)
    assert(got == 0L)
  }
}
