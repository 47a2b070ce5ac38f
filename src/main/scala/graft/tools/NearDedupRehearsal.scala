package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the st17 COMPOSITION: one full
  * NearDedup.processBatch — gate-shaped chunk probe, flag/survivor
  * writes, ledgered band append — against band indexes built from
  * 1×/100×/1000× corpora (ScaleData `documents` mode). ProbeRehearsal
  * proved the PROBE's shuffle is byte-identical across index decades
  * and DeltaRehearsal proved st16's delta batch is flat; this closes
  * the chain by measuring the composed streaming batch itself: its
  * wall must track the CHUNK (fixed here), not the index, with the
  * residual growth attributable to the probe's parallelizable
  * index-side scan term (same scan_rows instrumentation).
  *
  * Usage: NearDedupRehearsal <corpusDir> <chunkDir> <workDir>
  * Prints a build line and one batch line (wall + probe shuffle bytes
  * + scan rows + outcome counts).
  */
object NearDedupRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: NearDedupRehearsal <corpusDir> <chunkDir> <workDir>")
    val Array(corpusDir, chunkDir, workDir) = args
    require(workDir.startsWith("/tmp"), "workDir must be under /tmp")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-neardedup-rehearsal")
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

    // corpus -> index (the stream's accumulated state at this decade)
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select($"doc_id", $"text").where($"doc_id" % 10 =!= 0)
    // fixed 1× chunk, the dd10 recipe: unseen originals + corpus
    // copies (caught via the index) + in-chunk second copies
    val chunkDocs = spark.read.parquet(s"$chunkDir/documents.parquet")
      .select($"doc_id", $"text")
    val originals = chunkDocs.where($"doc_id" % 10 === 0)
    val chunk = originals
      .unionByName(chunkDocs.where($"doc_id" % 10 =!= 0 && $"doc_id" % 20 === 1)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
      .unionByName(originals.where($"doc_id" % 40 === 0)
        .select(($"doc_id" + 20000000L).as("doc_id"), $"text"))
      .localCheckpoint(true) // batch timing must not include chunk IO

    val t0 = System.nanoTime()
    val indexPath = s"$workDir/index"
    val w = graft.operators.Dedup.writeBandIndex(corpus, $"text",
      "doc_id", indexPath)
    val buildS = (System.nanoTime() - t0) / 1e9
    val indexRows = graft.operators.Versioned.read(spark, indexPath).count()
    println(f"""{"phase":"build","corpus":"$corpusDir","buckets":${w.buckets},"index_rows":$indexRows,"build_s":$buildS%.2f}""")

    // metric attribution FIRST, against the pristine decade index (the
    // same plan ProbeRehearsal measures — probing after a processBatch
    // would count the batch's own appended bands in the scan term)
    val flagsQ = graft.operators.Dedup.dedupChunkAgainstIndex(
      chunk, $"text", "doc_id", indexPath)
      .where($"dup_of_corpus" || $"dup_in_chunk")
    flagsQ.collect()
    val shuffleBytes = PlanMetrics.shuffleBytes(flagsQ)
    val scanRows = PlanMetrics.scanRows(flagsQ)
    // batch 0: the composed sink against the pristine index — the
    // decade claim. Batch 1 re-processes the SAME chunk under a new id
    // (its docs are now IN the index, so everything flags corpus-dup):
    // semantically different, but the same code path over warm caches —
    // reported as the warm bound on per-batch machinery cost.
    val p0 = System.nanoTime()
    val o = graft.streaming.NearDedup.processBatch(chunk, 0L, $"text",
      "doc_id", indexPath, s"$workDir/out0")
    val batchS = (System.nanoTime() - p0) / 1e9
    require(!o.replayed && o.dupOfCorpus > 0 && o.dupInChunk > 0 &&
      o.survivors > 0, s"chunk recipe broken at $corpusDir: $o")
    val p1 = System.nanoTime()
    val o1 = graft.streaming.NearDedup.processBatch(chunk, 1L, $"text",
      "doc_id", indexPath, s"$workDir/out1")
    val warmS = (System.nanoTime() - p1) / 1e9
    require(!o1.replayed && o1.dupOfCorpus == o1.admitted,
      s"warm pass must see its own bands: $o1")
    println(f"""{"phase":"batch","chunk":"$chunkDir","batch_s":$batchS%.2f,"batch_warm_s":$warmS%.2f,"admitted":${o.admitted},"dup_of_corpus":${o.dupOfCorpus},"dup_in_chunk":${o.dupInChunk},"survivors":${o.survivors},"probe_shuffle_bytes":$shuffleBytes,"probe_scan_rows":$scanRows}""")
    spark.stop()
  }
}
