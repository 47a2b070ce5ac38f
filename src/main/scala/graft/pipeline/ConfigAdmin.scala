package graft.pipeline

import graft.model.ConfigValue
import graft.state.ConfigStore
import org.apache.spark.sql.SparkSession

/** Config administration CLI (SURVEY.md §2.8 C8, E2 —
  * `insert_Postgres_Configs.py:30-157`). Widget-driven in the reference;
  * args-driven here:
  *
  *   runMain graft.pipeline.ConfigAdmin <configPath> set <group> <name> <value>
  *   runMain graft.pipeline.ConfigAdmin <configPath> add-tables <task> <db> <t1,t2,…>
  *   runMain graft.pipeline.ConfigAdmin <configPath> list
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
      .filterNot(t => have.contains(t.toLowerCase))
      .map(t =>
        if (tablesElsewhere.contains(t.toLowerCase)) s"${task}__$t" else t)
    existing ++ additions
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val configPath = args(0)
      val store = new ConfigStore(spark, configPath)
      args(1) match {
        case "set" =>
          val Array(_, _, group, name, value) = args
          store.upsert(ConfigValue(group, name, value, is_active = true))
          println(s"set $group/$name")
        case "add-tables" =>
          val Array(_, _, task, db, tables) = args
          val group = "dcx_postgresql_table_settings"
          val key = s"${task}_tables"
          store.upsert(ConfigValue("dcx_postgresql_db_settings",
            s"${task}_db_name", db, is_active = true))
          val existing = store.value(group, key)
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Seq.empty)
          val elsewhere = store.all().collect()
            .filter(c => c.group_name == group && c.config_name != key)
            .flatMap(_.config_value.split(",")).map(_.trim.toLowerCase).toSet
          val merged = mergeTableLists(existing,
            tables.split(",").toSeq, task, elsewhere)
          store.upsert(ConfigValue(group, key, merged.mkString(","),
            is_active = true))
          println(s"$key = ${merged.mkString(",")}")
        case "list" =>
          store.all().collect().sortBy(c => (c.group_name, c.config_name))
            .foreach(c => println(
              s"${c.group_name} | ${c.config_name} = ${c.config_value}" +
                s"${if (c.is_active) "" else " (inactive)"}"))
        case other => sys.error(s"unknown command: $other")
      }
    } finally spark.stop()
  }
}
