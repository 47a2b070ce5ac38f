package graft.pipeline

import graft.model.ConfigValue
import graft.state.{ConfigStore, ConfigStoreApi, JdbcConfigStore}
import org.apache.spark.sql.SparkSession

/** Config administration CLI (SURVEY.md §2.8 C8, E2 —
  * `insert_Postgres_Configs.py:30-157`). Widget-driven in the reference;
  * args-driven here:
  *
  *   runMain graft.pipeline.ConfigAdmin <store> set <group> <name> <value>
  *   runMain graft.pipeline.ConfigAdmin <store> add-tables <task> <db> <t1,t2,…>
  *   runMain graft.pipeline.ConfigAdmin <store> list
  *   runMain graft.pipeline.ConfigAdmin <store> interactive
  *
  * `<store>` is either a parquet path (offline harness) or a
  * `jdbc:` URL — the production metastore the reference's notebook
  * writes (`insert_Postgres_Configs.py:136-140`); JDBC administration
  * needs no SparkSession at all (control-plane rows, driver-side).
  *
  * `add-tables` reproduces the reference's list-merge semantics
  * (`Config:76-90`): append new tables to the existing comma list,
  * skipping ones already present; a table already registered under a
  * *different* task gets a `task__` prefix tag (`Config:83-86`).
  */
object ConfigAdmin {

  def mergeTableLists(existing: Seq[String], incoming: Seq[String],
      task: String, tablesElsewhere: Set[String]): Seq[String] = {
    val have = existing.map(_.toLowerCase).toSet
    val additions = incoming
      .map(_.trim).filter(_.nonEmpty)
      // already present UNDER EITHER SPELLING: the bare name, or the
      // task-prefixed tag a prior merge stored it as — without the
      // tagged check, re-running add-tables appends the tagged form
      // again on every invocation
      .filterNot { t =>
        val lt = t.toLowerCase
        have.contains(lt) ||
          have.contains(s"${task.toLowerCase}__$lt")
      }
      .map(t =>
        if (tablesElsewhere.contains(t.toLowerCase)) s"${task}__$t" else t)
    existing ++ additions
  }

  /** The command logic against any store backend — shared by the
    * parquet and JDBC front ends and called directly by specs. */
  def run(store: ConfigStoreApi, args: Seq[String]): Unit = args.head match {
    case "set" =>
      val Seq(_, group, name, value) = args
      store.upsert(ConfigValue(group, name, value, is_active = true))
      println(s"set $group/$name")
    case "add-tables" =>
      val Seq(_, task, db, tables) = args
      val group = "dcx_postgresql_table_settings"
      val key = s"${task}_tables"
      store.upsert(ConfigValue("dcx_postgresql_db_settings",
        s"${task}_db_name", db, is_active = true))
      val existing = store.value(group, key)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      val elsewhere = store.allValues()
        .filter(c => c.group_name.equalsIgnoreCase(group) &&
          !c.config_name.equalsIgnoreCase(key))
        .flatMap(_.config_value.split(",")).map(_.trim.toLowerCase).toSet
      val merged = mergeTableLists(existing,
        tables.split(",").toSeq, task, elsewhere)
      store.upsert(ConfigValue(group, key, merged.mkString(","),
        is_active = true))
      println(s"$key = ${merged.mkString(",")}")
    case "list" =>
      store.allValues().sortBy(c => (c.group_name, c.config_name))
        .foreach(c => println(
          s"${c.group_name} | ${c.config_name} = ${c.config_value}" +
            s"${if (c.is_active) "" else " (inactive)"}"))
    case "interactive" =>
      interactive(store, () => scala.io.StdIn.readLine(), println(_))
    case other => sys.error(s"unknown command: $other")
  }

  private val DbGroup = "dcx_postgresql_db_settings"
  private val TableGroup = "dcx_postgresql_table_settings"
  private val WatermarkGroup = "dcx_postgresql_watermark_settings"

  /** Widget-parity interactive mode (`insert_Postgres_Configs.py:30-50`
    * creates six text widgets; here six stdin prompts — same names,
    * same order, same conditional apply as the notebook's final cell):
    *
    *  - the DB config is INSERTED only when absent and both its name
    *    and value were given (`:133-135`);
    *  - the table list is MERGED — inserted alongside a new DB config,
    *    otherwise UPDATED in place with the merged comma list
    *    (`:136-143`), names already present skipped, names registered
    *    under another task's list prefix-tagged;
    *  - the watermark column list is inserted ONLY when its config is
    *    absent (`:148-149`) — an existing watermark config is never
    *    overwritten interactively.
    *
    * `readLine`/`echo` are injected so a spec can drive the exact
    * path a human sees; blank answers skip a section like the
    * notebook's empty widgets do. */
  def interactive(store: ConfigStoreApi, readLine: () => String,
      echo: String => Unit): Unit = {
    def ask(widget: String, hint: String): String = {
      echo(s"$widget ($hint): ")
      Option(readLine()).map(_.trim).getOrElse("")
    }
    val dbConfigName = ask("DatabaseConfigName", "e.g. <project>_db_name")
    val dbName = ask("DatabaseName", "valid database name")
    val tableConfigName = ask("TableConfigName", "e.g. <project>_tables")
    val tablesName = ask("TablesName", "comma-separated table names")
    val wmConfigName = ask("WatermarkConfigName",
      "e.g. <project>_<table>_watermarks")
    val wmName = ask("WatermarksName", "comma-separated column names")

    val dbExisting = store.value(DbGroup, dbConfigName)
    val task = tableConfigName.split('_').headOption.getOrElse(tableConfigName)
    val existingTables = store.value(TableGroup, tableConfigName)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val elsewhere = store.allValues()
      .filter(c => c.group_name.equalsIgnoreCase(TableGroup) &&
        !c.config_name.equalsIgnoreCase(tableConfigName))
      .flatMap(_.config_value.split(",")).map(_.trim.toLowerCase).toSet
    val merged = mergeTableLists(existingTables,
      tablesName.split(",").toSeq, task, elsewhere)

    if (dbExisting.isEmpty && dbConfigName.nonEmpty && dbName.nonEmpty) {
      store.upsert(ConfigValue(DbGroup, dbConfigName, dbName,
        is_active = true))
      echo(s"$dbConfigName has been inserted into config")
      if (tableConfigName.nonEmpty && merged.nonEmpty) {
        store.upsert(ConfigValue(TableGroup, tableConfigName,
          merged.mkString(","), is_active = true))
        echo(s"$tableConfigName has been inserted into config")
      }
    } else if (tableConfigName.nonEmpty && merged.nonEmpty) {
      if (dbExisting.nonEmpty)
        echo(s"$dbConfigName already exists in config")
      store.upsert(ConfigValue(TableGroup, tableConfigName,
        merged.mkString(","), is_active = true))
      echo(s"Tables ${merged.mkString(",")} have been added to config " +
        tableConfigName)
    }

    val wmExisting = store.value(WatermarkGroup, wmConfigName)
    val wmCols = wmName.split(",").map(_.trim).filter(_.nonEmpty)
    if (wmExisting.isEmpty && wmConfigName.nonEmpty && wmCols.nonEmpty) {
      store.upsert(ConfigValue(WatermarkGroup, wmConfigName,
        wmCols.mkString(","), is_active = true))
      echo(s"$wmConfigName has been inserted into config")
    } else if (wmExisting.nonEmpty)
      echo(s"$wmConfigName already exists in config")
  }

  def main(args: Array[String]): Unit = {
    val target = args(0)
    if (target.startsWith("jdbc:")) {
      // production metastore path: plain JDBC, no Spark needed
      run(new JdbcConfigStore(target,
        sys.env.getOrElse("GRAFT_JDBC_USER", ""),
        sys.env.getOrElse("GRAFT_JDBC_PASSWORD", "")), args.drop(1).toSeq)
    } else {
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try run(new ConfigStore(spark, target), args.drop(1).toSeq)
      finally spark.stop()
    }
  }
}
