package graft.sources

import graft.SparkSpec

/** S1 live-JDBC end-to-end against embedded Derby (on the Spark
  * classpath — it backs the Hive metastore), upgrading JdbcSource from
  * compile-only to tested: full-table scan, query pushdown, and
  * `partitionColumn` parallel reads. */
class JdbcSpec extends SparkSpec {

  // keep Derby's derby.log out of the repo root
  System.setProperty("derby.stream.error.file",
    System.getProperty("java.io.tmpdir") + "/derby.log")

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private lazy val populated: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE visits (id INT PRIMARY KEY, qty DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO visits VALUES (?, ?)")
      (0 until 100).foreach { i =>
        ps.setInt(1, i); ps.setDouble(2, i * 1.5); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("full-table scan via JDBC") {
    populated
    val src = new JdbcSource(url, "", "")
    val df = src.table(spark, "visits")
    assert(df.count() == 100)
    assert(df.columns.map(_.toLowerCase).sorted.toSeq == Seq("id", "qty"))
  }

  test("query pushdown + partitionColumn spreads the read over " +
    "parallel range partitions") {
    populated
    val src = new JdbcSource(url, "", "")
    val df = src.query(spark, "SELECT id, qty FROM visits WHERE id >= 10",
      partitionColumn = Some(("id", 10L, 100L, 4)))
    assert(df.rdd.getNumPartitions == 4, "expected 4 JDBC range partitions")
    assert(df.count() == 90)
    // every partition actually carries rows (ranges cover [10, 100))
    import spark.implicits._
    val perPart = df.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) >= 2, s"rows per partition: ${perPart.toSeq}")
    // the WHERE in the pushed query applied remotely: no id < 10 surfaced
    assert(df.where($"id" < 10).count() == 0)
  }
}
