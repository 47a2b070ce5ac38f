package graft.state

import graft.model.{ConfigValue, TableLoadDetail}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Parquet-backed state stores with MERGE semantics (SURVEY.md §2.1
  * S9/S10, §2.8 C6). Delta is not on the offline classpath, so MERGE is
  * implemented as read-modify-overwrite through a staging directory with
  * an atomic directory swap — same visible semantics for the
  * single-writer control plane (the reference's MERGE is also a
  * single-writer pattern; its MAX(id)+1 key generation at `Ingest:368`
  * would race under concurrency, which is why ids here are
  * deterministic hashes of the logical key).
  *
  * Scale note: these are control tables (hundreds of rows), not data
  * tables; full-rewrite cost is constant. Data-plane writes never go
  * through this path.
  */
object ParquetMerge {
  /** Overwrite `path` with `ds` via write-new + swap (best-effort atomic
    * on a local/posix fs; on an object store use a manifest instead).
    * Staging/backup use hidden sibling names (ignored by Spark's
    * FileIndex) and a crash between the two renames — table only at the
    * backup — is repaired on the next overwrite, same contract as
    * [[graft.operators.DataMerge.stagedOverwrite]]. */
  def overwrite[T](ds: Dataset[T], path: String): Unit = {
    import graft.operators.DataMerge.hiddenSibling
    val tmp = hiddenSibling(path, ".staging")
    ds.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), ds.sparkSession.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(hiddenSibling(path, ".old"))
    if (fs.exists(bak) && !fs.exists(dst)) fs.rename(bak, dst) // crash repair
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(bak, true)
  }
}

/** Store contracts — the parquet-backed stores below serve the offline
  * harness; [[JdbcConfigStore]]/[[JdbcWatermarkStore]] persist the same
  * state into a JDBC metastore the way the reference writes its
  * PostgreSQL `configurations.*` tables. */
trait ConfigStoreApi {
  def activeGroup(group: String): Map[String, String]
  def value(group: String, name: String): Option[String]
  def upsert(row: ConfigValue): Unit
  /** Every row, driver-side — config tables are control-plane small. */
  def allValues(): Seq[ConfigValue]
}

trait WatermarkStoreApi {
  def lastLoad(systemType: String, db: String, table: String): Option[Timestamp]
  def commit(systemType: String, db: String, table: String,
      lastLoad: Timestamp, insertIfMissing: Boolean): Unit
}

/** Key-value config store (`configurations.configvalues`,
  * `Ingest:68-130`; SURVEY §1.1). */
final class ConfigStore(spark: SparkSession, path: String)
    extends ConfigStoreApi {
  import spark.implicits._

  def all(): Dataset[ConfigValue] = {
    // crash repair BEFORE the existence probe: after a crash inside a
    // prior overwrite's commit window the table lives only at the
    // hidden .old backup — an exists-check alone would read EMPTY,
    // and the next upsert would then commit just its own row,
    // permanently wiping every other config value
    graft.operators.DataMerge.recoverStagedOverwrite(spark, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.emptyDataset[ConfigValue]
    else spark.read.parquet(path).as[ConfigValue]
  }

  def allValues(): Seq[ConfigValue] = all().collect().toSeq

  /** Active values of a group as name->value (the `rdd.collectAsMap()`
    * pattern at `Ingest:97,104` — config tables are tiny by contract). */
  def activeGroup(group: String): Map[String, String] =
    // case-insensitive like `value` and the JDBC backend — the two
    // ConfigStoreApi implementations must agree on row matching
    all().filter(c => c.is_active && c.group_name.equalsIgnoreCase(group))
      .collect().map(c => c.config_name -> c.config_value).toMap

  /** Single config value; case-insensitive name match (P11,
    * `Config:114`). Missing-config is an error, as `Ingest:78-79`. */
  def value(group: String, name: String): Option[String] =
    all().filter(c => c.is_active &&
        c.group_name.equalsIgnoreCase(group) &&
        c.config_name.equalsIgnoreCase(name))
      .collect().headOption.map(_.config_value)

  /** Insert-or-update on (group_name, config_name) — S10/C8 semantics
    * (`Config:106-140`). */
  def upsert(row: ConfigValue): Unit = this.synchronized {
    // synchronized for the same reason as WatermarkStore.commit
    val rest = all().collect().filterNot(c =>
      c.group_name.equalsIgnoreCase(row.group_name) &&
        c.config_name.equalsIgnoreCase(row.config_name))
    ParquetMerge.overwrite(spark.createDataset(rest :+ row), path)
  }
}

/** Watermark state store (`configurations.TableLoadDetails`,
  * `Ingest:366-415`; SURVEY §2.8 C3/C6). */
final class WatermarkStore(spark: SparkSession, path: String)
    extends WatermarkStoreApi {
  import spark.implicits._

  private def key(systemType: String, db: String, table: String): Long = {
    // deterministic id for the logical key (replaces MAX(id)+1)
    val s = s"${systemType.toLowerCase}|${db.toLowerCase}|${table.toLowerCase}"
    java.util.UUID.nameUUIDFromBytes(s.getBytes("UTF-8"))
      .getMostSignificantBits & Long.MaxValue
  }

  def all(): Dataset[TableLoadDetail] = {
    // same read-side crash repair as ConfigStore.all — a lost
    // watermark table would re-load every table from scratch
    graft.operators.DataMerge.recoverStagedOverwrite(spark, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.emptyDataset[TableLoadDetail]
    else spark.read.parquet(path).as[TableLoadDetail]
  }

  /** `GetMaxTimestampUsingPython` equivalent (C3, `Ingest:453-459`). */
  def lastLoad(systemType: String, db: String, table: String): Option[Timestamp] =
    all().filter(d =>
        d.systemType.equalsIgnoreCase(systemType) &&
        d.databaseName.equalsIgnoreCase(db) &&
        d.tableName.equalsIgnoreCase(table))
      .collect().headOption.flatMap(_.lastLoadDate)

  /** MERGE WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED AND insertConfig
    * THEN INSERT (`Ingest:373-415`). The reference only inserts on the
    * chunked path (`insertconfig`, `Ingest:426,431`) — same flag here.
    * `lastLoad` is already lagged by the caller (−80h, F4). */
  def commit(systemType: String, db: String, table: String,
      lastLoad: Timestamp, insertIfMissing: Boolean): Unit = this.synchronized {
    // synchronized: parallel table loads (Ingest.run(parallelism))
    // commit DIFFERENT table rows through the same read-modify-
    // overwrite file — interleaved rewrites would lose updates
    val now = new Timestamp(System.currentTimeMillis())
    val existing = all().collect()
    val matches = existing.filter(d =>
      d.systemType.equalsIgnoreCase(systemType) &&
        d.databaseName.equalsIgnoreCase(db) &&
        d.tableName.equalsIgnoreCase(table))
    val updated: Seq[TableLoadDetail] =
      if (matches.nonEmpty)
        existing.toSeq.map { d =>
          if (matches.contains(d))
            d.copy(lastLoadDate = Some(lastLoad), sqlUpdatedDate = Some(now))
          else d
        }
      else if (insertIfMissing)
        existing.toSeq :+ TableLoadDetail(
          key(systemType, db, table), systemType, db, table.toLowerCase,
          Some(lastLoad), now, None)
      else existing.toSeq
    // rewrite only when the merge changed something: matched rows were
    // updated, or an insert happened (no-match + !insertIfMissing is the
    // one no-op path)
    if (matches.nonEmpty || insertIfMissing)
      ParquetMerge.overwrite(spark.createDataset(updated), path)
  }
}
