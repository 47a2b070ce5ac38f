package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit-time CHECK / NOT NULL invariants: declared once (validated
  * against existing data), then every write that ADDS rows is gated
  * atomically — appends, overwrites, COW-update and DV-update
  * post-images, MERGE snapshots. A violating writer fails with a
  * named error and the table never transitions from clean to dirty. */
/** Executor-visible (same-JVM in local mode) evaluation counter for
  * the non-deterministic-lineage test — a closure-captured counter
  * would be serialized per task and never shared. */
object InvariantsSpecFlip {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
}

class InvariantsSpec extends SparkSpec {
  import Invariants.{CheckRule, NotNull}
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val t = tmpDir(prefix) + "/t"
    Versioned.commit((1 to 10).map(i => (i.toLong, i * 100L))
      .toDF("k", "cents").coalesce(1), t)
    t
  }

  test("ADD CONSTRAINT validates existing data; declared rules " +
    "round-trip; violating add refuses and commits nothing") {
    val t = freshTable("inv")
    Versioned.addInvariants(spark, t,
      Seq(NotNull("k"), CheckRule("cents_pos", "cents >= 0")))
    assert(Versioned.invariants(spark, t).map(_.name) ==
      Seq("not_null(k)", "cents_pos"))
    // a rule the CURRENT data violates refuses up front
    val before = Versioned.versions(spark, t)
    intercept[InvariantViolation] {
      Versioned.addInvariants(spark, t,
        Seq(CheckRule("too_strict", "cents > 500")))
    }
    assert(Versioned.versions(spark, t) == before)
    assert(Versioned.invariants(spark, t).size == 2)
  }

  test("appends and overwrites are gated: NULL keys and negative " +
    "cents refuse with the rule named; clean rows commit; the rules " +
    "survive overwrite and RESTORE") {
    val t = freshTable("invgate")
    Versioned.addInvariants(spark, t,
      Seq(NotNull("k"), CheckRule("cents_pos", "cents >= 0")))
    def rows(ks: Seq[(java.lang.Long, Long)]) = ks.toDF("k", "cents")
    val e = intercept[InvariantViolation] {
      Versioned.commit(rows(Seq((null, 1L), (20L, 5L))), t, "append")
    }
    assert(e.getMessage.contains("not_null(k)"))
    intercept[InvariantViolation] {
      Versioned.commit(rows(Seq((21L, -5L))), t, "append")
    }
    assert(Versioned.read(spark, t).count() == 10, "nothing may land")
    Versioned.commit(rows(Seq((22L, 7L))), t, "append")
    assert(Versioned.read(spark, t).count() == 11)
    // a column a rule references must be PRESENT in the append — its
    // rows would land NULL/unevaluable, exactly what the rule forbids
    intercept[InvariantViolation] {
      Versioned.commit(Seq(23L).toDF("k"), t, "append")
    }
    // overwrite: duties survive, violating snapshots refuse
    intercept[InvariantViolation] {
      Versioned.commit(rows(Seq((null, 1L))), t, "overwrite")
    }
    Versioned.commit(rows(Seq((30L, 1L))), t, "overwrite")
    assert(Versioned.invariants(spark, t).size == 2,
      "invariants must survive an overwrite")
    // RESTORE reinstates the restored version's rule set
    Versioned.restore(spark, t, 1L)
    assert(Versioned.invariants(spark, t).size == 2)
  }

  test("DML is gated on both paths: a COW UPDATE and a DV UPDATE whose " +
    "post-images violate refuse atomically — no sidecar, no segment, " +
    "no version") {
    val t = freshTable("invdml")
    Versioned.addInvariants(spark, t,
      Seq(CheckRule("cents_pos", "cents >= 0")))
    val vs = Versioned.versions(spark, t)
    // COW path (SQL UPDATE routes through rewrite)
    val e = intercept[InvariantViolation] {
      spark.sql(s"UPDATE '$t' SET cents = -1 WHERE k <= 3")
    }
    assert(e.getMessage.contains("cents_pos"))
    assert(Versioned.versions(spark, t) == vs)
    // DV path
    intercept[InvariantViolation] {
      Versioned.updateWithDv(spark, t, _ => true, $"k" <= 3,
        df => df.withColumn("cents", lit(-7L)))
    }
    assert(Versioned.versions(spark, t) == vs)
    assert(Versioned.dvDeletedCounts(spark, t).isEmpty,
      "a refused DV update must leave no sidecar refs")
    // clean updates still flow on both paths
    spark.sql(s"UPDATE '$t' SET cents = cents + 1 WHERE k <= 2")
    Versioned.updateWithDv(spark, t, _ => true, $"k" === 3L,
      df => df.withColumn("cents", col("cents") + 1))
    assert(Versioned.read(spark, t).agg(sum($"cents")).as[Long].head ==
      (1 to 10).map(_ * 100L).sum + 3)
    // deletes add no rows: never gated
    Versioned.deleteWithDv(spark, t, _ => true, $"k" === 10L)
    assert(Versioned.read(spark, t).count() == 9)
  }

  test("catalog SQL writes are gated: INSERT INTO and INSERT OVERWRITE " +
    "with violating rows refuse atomically, clean inserts land") {
    val root = tmpDir("invcat")
    val cat = "invcat" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val td = s"$root/lake/t"
    Versioned.commit((1 to 5).map(i => (i.toLong, i * 10L))
      .toDF("k", "cents").coalesce(1), td)
    spark.sql(s"ALTER TABLE $cat.lake.t ADD CONSTRAINT cents_pos " +
      "CHECK (cents >= 0)")
    val vs = Versioned.versions(spark, td)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.lake.t VALUES " +
        "(CAST(6 AS LONG), CAST(-1 AS LONG))")
    }
    assert(e.getMessage.contains("cents_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("cents_pos")),
      s"refusal must name the rule: ${e.getMessage}")
    assert(Versioned.versions(spark, td) == vs, "nothing may commit")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES " +
      "(CAST(6 AS LONG), CAST(60 AS LONG))")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake.t")
      .as[Long].head == 6L)
    intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $cat.lake.t VALUES " +
        "(CAST(1 AS LONG), CAST(-5 AS LONG))")
    }
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake.t")
      .as[Long].head == 6L, "a refused overwrite must change nothing")
  }

  test("enforcement validates the STAGED bytes: a frame whose lineage " +
    "flips between evaluations can never land rows the gate never saw") {
    val t = freshTable("invflip")
    Versioned.addInvariants(spark, t,
      Seq(CheckRule("cents_pos", "cents >= 0")))
    InvariantsSpecFlip.n.set(0)
    // first evaluation of this lineage yields clean rows, every later
    // one dirty rows — pre-fix, the gate validated evaluation 1 and
    // the write landed evaluation 2's dirty rows
    val rdd = spark.sparkContext.parallelize(1 to 4, 1).mapPartitions { it =>
      val dirty = InvariantsSpecFlip.n.getAndIncrement() > 0
      it.map(i => org.apache.spark.sql.Row(
        (i + 100).toLong, if (dirty) -1L else 1L))
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("cents", org.apache.spark.sql.types.LongType)
    try Versioned.commit(spark.createDataFrame(rdd, schema), t, "append")
    catch { case _: InvariantViolation => () } // a refusal is also sound
    assert(Versioned.read(spark, t).where($"cents" < 0).count() == 0,
      "the committed rows must be exactly the rows the gate validated")
  }

  test("drop by name removes exactly one rule (and the empty state " +
    "overrides inheritance); merge snapshot commits are gated too") {
    val t = freshTable("invdrop")
    Versioned.addInvariants(spark, t,
      Seq(NotNull("k"), CheckRule("cents_pos", "cents >= 0")))
    Versioned.dropInvariant(spark, t, "cents_pos")
    assert(Versioned.invariants(spark, t).map(_.name) == Seq("not_null(k)"))
    // negative cents now commit; NULL keys still refuse
    Versioned.commit(Seq((50L, -1L)).toDF("k", "cents"), t, "append")
    intercept[IllegalArgumentException] {
      Versioned.dropInvariant(spark, t, "ghost") }
    Versioned.dropInvariant(spark, t, "not_null(k)")
    assert(Versioned.invariants(spark, t).isEmpty)
    // a later metadata commit must NOT resurrect dropped rules
    Versioned.renameColumn(spark, t, "cents", "price")
    assert(Versioned.invariants(spark, t).isEmpty)
    // merge-snapshot gating (commitIf) on a fresh table
    val m = freshTable("invmerge")
    Versioned.addInvariants(spark, m, Seq(NotNull("cents")))
    val base = Versioned.versions(spark, m).last
    intercept[InvariantViolation] {
      Versioned.commitIf(
        Seq((1L, null: java.lang.Long)).toDF("k", "cents"),
        m, "overwrite", Map("operation" -> "merge"), base)
    }
    assert(Versioned.versions(spark, m).last == base)
  }
}
