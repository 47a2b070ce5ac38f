package graft.state

import graft.SparkSpec
import graft.model.ConfigValue
import java.sql.Timestamp

class StoresSpec extends SparkSpec {

  test("ConfigStore upsert inserts then updates on (group,name)") {
    val store = new ConfigStore(spark, tmpDir("cfg") + "/config")
    store.upsert(ConfigValue("g", "a", "1", is_active = true))
    store.upsert(ConfigValue("g", "b", "2", is_active = true))
    store.upsert(ConfigValue("g", "A", "3", is_active = true)) // ci update
    assert(store.value("g", "a").contains("3"))
    assert(store.value("g", "b").contains("2"))
    assert(store.value("g", "missing").isEmpty)
    assert(store.activeGroup("g") == Map("A" -> "3", "b" -> "2"))
  }

  test("WatermarkStore MERGE: update-when-matched, insert-only-when-flagged") {
    val store = new WatermarkStore(spark, tmpDir("wm") + "/wm")
    val t1 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2026-02-01 00:00:00")

    // NOT MATCHED + insertIfMissing=false → no row (reference full-load path)
    store.commit("sys", "db", "T1", t1, insertIfMissing = false)
    assert(store.lastLoad("sys", "db", "T1").isEmpty)

    // NOT MATCHED + insertIfMissing=true → insert, name lowercased
    store.commit("sys", "db", "T1", t1, insertIfMissing = true)
    assert(store.lastLoad("sys", "db", "t1").contains(t1))

    // MATCHED → update even with insert flag off
    store.commit("sys", "db", "t1", t2, insertIfMissing = false)
    assert(store.lastLoad("SYS", "DB", "T1").contains(t2))

    // different key untouched
    store.commit("sys", "db", "T2", t1, insertIfMissing = true)
    assert(store.lastLoad("sys", "db", "t1").contains(t2))
    assert(store.all().count() == 2)
  }
}
