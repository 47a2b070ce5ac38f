package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke coverage: every declared query runs and returns rows at
  * sf0.001 (except those documented as sf-dependent), and the
  * entry/oracle contract is self-consistent. The value-level check is
  * the DuckDB oracle gate (scripts/check.py / driver t2). */
class QuerySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key is a declared query") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracle without query: $undeclared")
  }

  test("all declared queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
