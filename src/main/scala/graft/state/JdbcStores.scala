package graft.state

import graft.model.{ConfigValue, TableLoadDetail}
import java.sql.{Connection, DriverManager, Timestamp}

/** JDBC-backed state stores — the production write-back path the
  * reference uses against its PostgreSQL metastore
  * (`PostgresToDataLake_Ingestion_Notebook.py:373-415` MERGEs
  * `configurations.TableLoadDetails`; `insert_Postgres_Configs.py:136-140`
  * inserts `configurations.configvalues`). The parquet stores in
  * [[Stores]] serve the offline harness; these persist the SAME state
  * through the same contract ([[WatermarkStoreApi]]/[[ConfigStoreApi]])
  * into any JDBC database.
  *
  * MERGE semantics are expressed as UPDATE-then-INSERT inside one
  * transaction — portable across Derby/Postgres/SQLServer, and exactly
  * the reference's `WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED AND
  * insertconfig THEN INSERT` branch structure. These are CONTROL-PLANE
  * tables (hundreds of rows, one row per commit): plain driver-side
  * JDBC, no Spark job — the reference likewise runs its MERGE on the
  * notebook driver, not the cluster.
  *
  * Concurrency: the UPDATE-first transaction is safe for the
  * single-writer-per-table discipline the pipeline already enforces
  * (parallel loads touch DIFFERENT table keys). Unlike the parquet
  * read-modify-overwrite, two writers on different keys never lose each
  * other's rows here — row-level UPDATEs don't rewrite the table.
  */
object JdbcStateSchema {
  val WatermarkTable = "table_load_details"
  val ConfigTable = "config_values"

  val WatermarkDdl: String =
    s"""CREATE TABLE $WatermarkTable (
       |  tableloaddetailsid BIGINT PRIMARY KEY,
       |  system_type VARCHAR(64) NOT NULL,
       |  database_name VARCHAR(128) NOT NULL,
       |  table_name VARCHAR(128) NOT NULL,
       |  last_load_date TIMESTAMP,
       |  sql_created_date TIMESTAMP NOT NULL,
       |  sql_updated_date TIMESTAMP)""".stripMargin

  val ConfigDdl: String =
    s"""CREATE TABLE $ConfigTable (
       |  group_name VARCHAR(128) NOT NULL,
       |  config_name VARCHAR(128) NOT NULL,
       |  config_value VARCHAR(4000) NOT NULL,
       |  is_active SMALLINT NOT NULL,
       |  is_encrypt SMALLINT NOT NULL,
       |  PRIMARY KEY (group_name, config_name))""".stripMargin

  /** Create a state table if absent. DDL probing via metadata keeps it
    * portable (Derby has no CREATE TABLE IF NOT EXISTS). The probe is
    * scoped to the connection's CURRENT schema — a wildcard scan would
    * see a same-named table in ANOTHER schema, skip the DDL, and every
    * later unqualified statement would fail with table-not-found on
    * the default schema. getSchema can itself be unsupported (older
    * drivers) — then the probe degrades to the wildcard with the
    * documented caveat rather than failing ensure outright. */
  /** (url, table) pairs already ensured by THIS process: a 1000-table
    * run issues thousands of store calls, and the getTables catalog
    * scan must not ride every one. An external DROP mid-process goes
    * unnoticed until the next statement fails — acceptable for
    * control-plane tables nothing legitimately drops. */
  private val ensured =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensure(conn: Connection, table: String, ddl: String): Unit = {
    val urlKey =
      try conn.getMetaData.getURL
      catch { case _: Throwable => "?" }
    val memoKey = s"$urlKey|$table"
    if (ensured.contains(memoKey)) return
    def probe(): Boolean = {
      val schema =
        try Option(conn.getSchema).filter(_.nonEmpty).orNull
        catch { case _: Throwable => null }
      val rs = conn.getMetaData.getTables(null, schema, null,
        Array("TABLE"))
      var found = false
      try {
        while (rs.next() && !found)
          found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      } finally rs.close()
      found
    }
    if (!probe()) {
      val st = conn.createStatement()
      try st.execute(ddl)
      catch {
        // create-if-absent must tolerate LOSING the race: concurrent
        // first-run callers all miss the probe and all issue the DDL —
        // only a table still missing after the failure is a real fault
        case e: java.sql.SQLException => if (!probe()) throw e
      }
      finally st.close()
    }
    ensured.add(memoKey)
  }

  /** Missing-table SQLStates across the databases this layer targets:
    * Derby 42X05, Postgres 42P01, MySQL/ODBC 42S02, SQL Server S0002.
    * Walked through BOTH linkage conventions — the JDBC
    * `getNextException` chain AND the `getCause` chain (pools and
    * wrappers like HikariCP/Spring re-throw with the stateful
    * exception as the cause) — bounded and cycle-safe. */
  private val MissingTableStates = Set("42X05", "42P01", "42S02", "S0002")

  private[state] def isMissingTable(e: java.sql.SQLException): Boolean = {
    // walk BOTH linkage conventions, bounded: the JDBC spec chains
    // via getNextException, but pools/wrappers (HikariCP, Spring)
    // re-throw with the stateful exception as the CAUSE instead
    var frontier: List[Throwable] = List(e)
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    var hops = 0
    while (frontier.nonEmpty && hops < 16) {
      val t = frontier.head
      frontier = frontier.tail
      if (seen.add(t)) {
        t match {
          case s: java.sql.SQLException =>
            if (MissingTableStates.contains(
                Option(s.getSQLState).getOrElse(""))) return true
            if (s.getNextException != null)
              frontier = s.getNextException :: frontier
          case _ =>
        }
        if (t.getCause != null && (t.getCause ne t))
          frontier = t.getCause :: frontier
        // count DISTINCT throwables against the budget: a node can be
        // enqueued twice (nextException + cause) before its dedup-on-
        // pop, and duplicates must not eat traversal depth
        hops += 1
      }
    }
    false
  }

  /** Ensure + run, SELF-HEALING the memo: a database dropped and
    * recreated under the same JDBC URL in-process (in-memory Derby in
    * tests, an ops-side reset) would otherwise skip the DDL probe
    * forever — the memo has no external invalidation. On a downstream
    * missing-table failure, drop the memo entry, re-probe/re-create,
    * and retry the body ONCE; any other failure (or a second
    * missing-table) propagates untouched. */
  def withEnsured[A](conn: Connection, table: String, ddl: String)(
      body: => A): A = {
    ensure(conn, table, ddl)
    try body
    catch {
      case e: java.sql.SQLException if isMissingTable(e) =>
        val urlKey =
          try conn.getMetaData.getURL
          catch { case _: Throwable => "?" }
        ensured.remove(s"$urlKey|$table")
        ensure(conn, table, ddl)
        body
    }
  }
}

final class JdbcWatermarkStore(url: String, user: String, password: String)
    extends WatermarkStoreApi {
  import JdbcStateSchema._

  // every method touches only WatermarkTable, so the ensure (and its
  // missing-table self-heal retry) rides the connection wrapper once
  private def withConn[A](f: Connection => A): A = {
    val conn =
      if (user.isEmpty) DriverManager.getConnection(url)
      else DriverManager.getConnection(url, user, password)
    try withEnsured(conn, WatermarkTable, WatermarkDdl)(f(conn))
    finally conn.close()
  }

  private def key(systemType: String, db: String, table: String): Long = {
    // deterministic id for the logical key — same derivation as the
    // parquet store, replacing the reference's race-prone MAX(id)+1
    // sequence (`Ingest:368-369`)
    val s = s"${systemType.toLowerCase}|${db.toLowerCase}|${table.toLowerCase}"
    java.util.UUID.nameUUIDFromBytes(s.getBytes("UTF-8"))
      .getMostSignificantBits & Long.MaxValue
  }

  def lastLoad(systemType: String, db: String,
      table: String): Option[Timestamp] = withConn { conn =>
    val ps = conn.prepareStatement(
      s"SELECT last_load_date FROM $WatermarkTable WHERE tableloaddetailsid = ?")
    try {
      ps.setLong(1, key(systemType, db, table))
      val rs = ps.executeQuery()
      try {
        if (!rs.next()) None else Option(rs.getTimestamp(1))
      } finally rs.close()
    } finally ps.close()
  }

  /** The reference's MERGE (`Ingest:373-415`): WHEN MATCHED THEN UPDATE
    * last_load_date + sql_updated_date; WHEN NOT MATCHED AND
    * insertIfMissing THEN INSERT. One transaction. */
  def commit(systemType: String, db: String, table: String,
      lastLoad: Timestamp, insertIfMissing: Boolean): Unit = withConn { conn =>
    conn.setAutoCommit(false)
    try {
      val now = new Timestamp(System.currentTimeMillis())
      val up = conn.prepareStatement(
        s"""UPDATE $WatermarkTable
           |SET last_load_date = ?, sql_updated_date = ?
           |WHERE tableloaddetailsid = ?""".stripMargin)
      val updated = try {
        up.setTimestamp(1, lastLoad)
        up.setTimestamp(2, now)
        up.setLong(3, key(systemType, db, table))
        up.executeUpdate()
      } finally up.close()
      if (updated == 0 && insertIfMissing) {
        val ins = conn.prepareStatement(
          s"""INSERT INTO $WatermarkTable (tableloaddetailsid, system_type,
             |  database_name, table_name, last_load_date, sql_created_date,
             |  sql_updated_date)
             |VALUES (?, ?, ?, ?, ?, ?, NULL)""".stripMargin)
        try {
          ins.setLong(1, key(systemType, db, table))
          ins.setString(2, systemType)
          ins.setString(3, db)
          ins.setString(4, table.toLowerCase)
          ins.setTimestamp(5, lastLoad)
          ins.setTimestamp(6, now)
          ins.executeUpdate()
        } finally ins.close()
      }
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    }
  }

  /** All rows — audit/debug surface (mirrors the parquet store's
    * all(), driver-side since the table is control-plane small). */
  def all(): Seq[TableLoadDetail] = withConn { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"""SELECT tableloaddetailsid, system_type, database_name,
           |  table_name, last_load_date, sql_created_date, sql_updated_date
           |FROM $WatermarkTable""".stripMargin)
      val out = Seq.newBuilder[TableLoadDetail]
      try {
        while (rs.next()) out += TableLoadDetail(
          rs.getLong(1), rs.getString(2), rs.getString(3), rs.getString(4),
          Option(rs.getTimestamp(5)), rs.getTimestamp(6),
          Option(rs.getTimestamp(7)))
      } finally rs.close()
      out.result()
    } finally st.close()
  }
}

final class JdbcConfigStore(url: String, user: String, password: String)
    extends ConfigStoreApi {
  import JdbcStateSchema._

  // every method touches only ConfigTable — ensure + self-heal retry
  // rides the connection wrapper (see JdbcWatermarkStore)
  private def withConn[A](f: Connection => A): A = {
    val conn =
      if (user.isEmpty) DriverManager.getConnection(url)
      else DriverManager.getConnection(url, user, password)
    try withEnsured(conn, ConfigTable, ConfigDdl)(f(conn))
    finally conn.close()
  }

  def activeGroup(group: String): Map[String, String] = withConn { conn =>
    val ps = conn.prepareStatement(
      s"""SELECT config_name, config_value FROM $ConfigTable
         |WHERE is_active = 1 AND LOWER(group_name) = LOWER(?)""".stripMargin)
    try {
      ps.setString(1, group)
      val rs = ps.executeQuery()
      val out = Map.newBuilder[String, String]
      try {
        while (rs.next()) out += rs.getString(1) -> rs.getString(2)
      } finally rs.close()
      out.result()
    } finally ps.close()
  }

  def value(group: String, name: String): Option[String] = withConn { conn =>
    val ps = conn.prepareStatement(
      s"""SELECT config_value FROM $ConfigTable
         |WHERE is_active = 1 AND LOWER(group_name) = LOWER(?)
         |  AND LOWER(config_name) = LOWER(?)""".stripMargin)
    try {
      ps.setString(1, group)
      ps.setString(2, name)
      val rs = ps.executeQuery()
      try {
        if (rs.next()) Some(rs.getString(1)) else None
      } finally rs.close()
    } finally ps.close()
  }

  def allValues(): Seq[ConfigValue] = withConn { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"""SELECT group_name, config_name, config_value, is_active,
           |  is_encrypt FROM $ConfigTable""".stripMargin)
      val out = Seq.newBuilder[ConfigValue]
      try {
        while (rs.next()) out += ConfigValue(
          rs.getString(1), rs.getString(2), rs.getString(3),
          rs.getInt(4) == 1, rs.getInt(5) == 1)
      } finally rs.close()
      out.result()
    } finally st.close()
  }

  /** Insert-or-update on (group_name, config_name) — the
    * `insert_Postgres_Configs.py:136-140` write, upgraded from blind
    * INSERT to a keyed upsert so re-running config deployment is
    * idempotent. */
  def upsert(row: ConfigValue): Unit = withConn { conn =>
    conn.setAutoCommit(false)
    try {
      val up = conn.prepareStatement(
        s"""UPDATE $ConfigTable SET config_value = ?, is_active = ?,
           |  is_encrypt = ?
           |WHERE LOWER(group_name) = LOWER(?)
           |  AND LOWER(config_name) = LOWER(?)""".stripMargin)
      val updated = try {
        up.setString(1, row.config_value)
        up.setInt(2, if (row.is_active) 1 else 0)
        up.setInt(3, if (row.is_encrypt) 1 else 0)
        up.setString(4, row.group_name)
        up.setString(5, row.config_name)
        up.executeUpdate()
      } finally up.close()
      if (updated == 0) {
        val ins = conn.prepareStatement(
          s"""INSERT INTO $ConfigTable (group_name, config_name,
             |  config_value, is_active, is_encrypt)
             |VALUES (?, ?, ?, ?, ?)""".stripMargin)
        try {
          ins.setString(1, row.group_name)
          ins.setString(2, row.config_name)
          ins.setString(3, row.config_value)
          ins.setInt(4, if (row.is_active) 1 else 0)
          ins.setInt(5, if (row.is_encrypt) 1 else 0)
          ins.executeUpdate()
        } finally ins.close()
      }
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    }
  }
}
