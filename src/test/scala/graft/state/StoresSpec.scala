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

  test("a crash inside a prior overwrite's commit window never wipes " +
    "the store: reads AND the next upsert recover the hidden backup") {
    val path = tmpDir("cfgcrash") + "/config"
    val store = new ConfigStore(spark, path)
    store.upsert(ConfigValue("g", "a", "1", is_active = true))
    store.upsert(ConfigValue("g", "b", "2", is_active = true))
    // simulate the window: table only at the hidden .old backup
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(
        graft.operators.DataMerge.hiddenSibling(path, ".old"))))
    // pre-fix: all() saw a missing path -> empty -> this upsert
    // committed ONLY row c, permanently losing a and b
    store.upsert(ConfigValue("g", "c", "3", is_active = true))
    assert(store.activeGroup("g") ==
      Map("a" -> "1", "b" -> "2", "c" -> "3"))
    // activeGroup is case-insensitive like value() and the JDBC form
    assert(store.activeGroup("G") == store.activeGroup("g"))
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

  test("watermark never regresses under the lagged-max commit protocol " +
    "(ScalaCheck, SURVEY §5.2)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val lagMillis = 80L * 3600 * 1000 // the reference's 80h lag (F4)
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    // a run sequence = batches of event-time offsets (hours); the
    // pipeline persists each batch, then commits max(persisted) - 80h —
    // exactly what Ingest.commitWatermark computes from the lake re-read
    val runsGen = Gen.listOfN(5, Gen.listOf(Gen.choose(0L, 10000L)))
    val prop = Prop.forAll(runsGen) { runs =>
      val store = new WatermarkStore(spark, tmpDir("wmprop") + "/wm")
      var lakeMax = Long.MinValue // append-only lake → running max
      var prev = Long.MinValue
      runs.filter(_.nonEmpty).forall { batch =>
        lakeMax = math.max(lakeMax, batch.max * 3600 * 1000 + base)
        store.commit("sys", "db", "t", new Timestamp(lakeMax - lagMillis),
          insertIfMissing = true)
        val committed = store.lastLoad("sys", "db", "t").get.getTime
        val ok = committed >= prev &&          // never regresses
          committed == lakeMax - lagMillis     // exactly 80h behind the lake
        prev = committed
        ok
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
