package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal driver for the dd10 probe path: build the MinHash
  * band index from one corpus, probe it with a chunk derived from
  * ANOTHER (usually much smaller) corpus, and report wall + shuffle
  * volume for the probe against BOTH index layouts:
  *
  *  - `bucketed`: the production snapshot table (commitBucketed →
  *    KeyGroupedPartitioning → zero index-side Exchange);
  *  - `legacy`: the same rows as loose parquet (pre-bucketing layout,
  *    the path older indexes read through) — the probe must shuffle
  *    the index side every time.
  *
  * The claim under test (VERDICT r11/r12): probe cost tracks the
  * CHUNK, not the index — an index built from a 100× corpus must
  * probe a 1× chunk in ~1× time. Broadcast joins are disabled for the
  * probes so the measurement exercises the co-location machinery (at
  * 100 TB the index never fits a broadcast; at rehearsal sizes it
  * would, and the two scales would silently measure different plans).
  *
  * Shuffle volume comes from the executed plan's SQL metrics
  * (`shuffle bytes written` summed over every exchange) — the same
  * numbers the Spark UI shows, no listener race.
  *
  * Usage: ProbeRehearsal <corpusDir> <chunkDir> <workDir>
  * Prints one JSON line per layout plus a build line.
  */
object ProbeRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ProbeRehearsal <corpusDir> <chunkDir> <workDir>")
    val Array(corpusDir, chunkDir, workDir) = args
    require(workDir.startsWith("/tmp"), "workDir must be under /tmp")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-probe-rehearsal")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select($"doc_id", $"text").where($"doc_id" % 10 =!= 0)
    // the dd10 chunk recipe: unseen originals + injected corpus
    // copies + an in-chunk second copy of every 40th original
    val chunkDocs = spark.read.parquet(s"$chunkDir/documents.parquet")
      .select($"doc_id", $"text")
    val originals = chunkDocs.where($"doc_id" % 10 === 0)
    val chunk = originals
      .unionByName(chunkDocs.where($"doc_id" % 10 =!= 0 && $"doc_id" % 20 === 1)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
      .unionByName(originals.where($"doc_id" % 40 === 0)
        .select(($"doc_id" + 20000000L).as("doc_id"), $"text"))
      .localCheckpoint(true) // probe timings must not include chunk IO

    // ---- build both layouts
    val t0 = System.nanoTime()
    val bucketedPath = s"$workDir/index_bucketed"
    graft.operators.Dedup.writeBandIndex(corpus, $"text", "doc_id",
      bucketedPath)
    val buildS = (System.nanoTime() - t0) / 1e9
    val buckets = graft.operators.Versioned.bucketSpec(spark, bucketedPath)
      .map(_._2).getOrElse(-1)
    val legacyPath = s"$workDir/index_legacy"
    graft.operators.Dedup.withBands(
        graft.operators.Dedup.withMinhashSignature(
          corpus, $"text", shingleSize = 3, numHashes = 16),
        bands = 4, rowsPerBand = 4)
      .select($"band_id", $"band_hash", $"doc_id")
      .write.mode("overwrite").parquet(legacyPath)
    val indexRows = spark.read.parquet(legacyPath).count()
    println(f"""{"phase":"build","corpus":"$corpusDir","buckets":$buckets,"index_rows":$indexRows,"build_s":$buildS%.2f}""")

    // scanRows separates the probe's index-side scan term (linear in
    // the index, zero network, parallelizes with executors) from its
    // shuffle term (the one that must stay chunk-sized) — so "wall
    // grew because of the scan" is a measurement, not an inference
    import PlanMetrics.{shuffleBytes, scanRows}

    // ---- probe each layout twice, keep the better pass
    Seq("bucketed" -> bucketedPath, "legacy" -> legacyPath).foreach {
      case (label, path) =>
        var bestS = Double.MaxValue
        var bytes = 0L
        var scanned = 0L
        (1 to 2).foreach { _ =>
          val p0 = System.nanoTime()
          // collect() (chunk-bounded: flagged rows only) so the SQL
          // metrics land on THIS QueryExecution — count() would spawn
          // its own and read back zeros
          val flagsQ = graft.operators.Dedup.dedupChunkAgainstIndex(
              chunk, $"text", "doc_id", path)
            .where($"dup_of_corpus" || $"dup_in_chunk")
          val flagged = flagsQ.collect().length
          val s = (System.nanoTime() - p0) / 1e9
          if (s < bestS) {
            bestS = s; bytes = shuffleBytes(flagsQ); scanned = scanRows(flagsQ)
          }
          // both layouts: a zero-flag legacy probe (e.g. schema drift
          // in the loose-parquet index) would otherwise print a
          // plausible timing line and silently invalidate the
          // bucketed-vs-legacy comparison
          if (flagged == 0)
            sys.error(s"$label probe flagged nothing — chunk recipe broken")
        }
        println(f"""{"phase":"probe","layout":"$label","chunk":"$chunkDir","probe_s":$bestS%.2f,"shuffle_bytes":$bytes,"scan_rows":$scanned}""")
    }
    spark.stop()
  }
}
