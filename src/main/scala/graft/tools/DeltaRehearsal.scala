package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale rehearsal for the st16 claim: an incremental curation
  * stream's micro-batch cost tracks the DELTA, not the table. The
  * benchmark query replays an entire corpus through the feed (so its
  * wall is linear in corpus bytes by construction); this driver
  * isolates the steady-state number that matters at 100 TB — commit a
  * `corpusDir`-sized baseline, let the stream absorb it UNTIMED, then
  * commit a fixed `chunkDir`-sized delta and time ONLY that
  * micro-batch (gate + stateful exact-dedup + parquet sink, st16's
  * exact operator chain). Run with 1× and 100× corpora and the same
  * 1× chunk: the timed number must not scale with the corpus.
  *
  * Usage: DeltaRehearsal <corpusDir> <chunkDir> <workDir>
  */
object DeltaRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: DeltaRehearsal <corpusDir> <chunkDir> <workDir>")
    val Array(corpusDir, chunkDir, workDir) = args
    require(workDir.startsWith("/tmp"), "workDir must be under /tmp")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-delta-rehearsal")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false") // stateful stream
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val table = s"$workDir/docs"
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select($"doc_id", $"text", $"n_chars")
    val t0 = System.nanoTime()
    graft.operators.Versioned.commit(corpus.repartition(8), table)
    val commitS = (System.nanoTime() - t0) / 1e9

    val q = spark.readStream.format("graft-changes")
      .option("path", table).load()
      .transform(graft.queries.CapstoneQueries.gate)
      .dropDuplicates("norm")
      .select($"doc_id", $"ws_tokens")
      .writeStream.format("parquet")
      .option("path", s"$workDir/out")
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append").start()
    try {
      val t1 = System.nanoTime()
      q.processAllAvailable() // absorb the baseline (untimed claim)
      val baselineS = (System.nanoTime() - t1) / 1e9
      // the fixed delta: chunk docs, ids shifted clear of any corpus
      // copy population (multiple of 97 preserves eval-gate behavior)
      val delta = spark.read.parquet(s"$chunkDir/documents.parquet")
        .select($"doc_id", $"text", $"n_chars")
        .withColumn("doc_id", $"doc_id" + 97L * 20600000L)
      graft.operators.Versioned.commit(
        delta.coalesce(2), table, "append")
      val t2 = System.nanoTime()
      q.processAllAvailable()
      val deltaS = (System.nanoTime() - t2) / 1e9
      val outRows = spark.read.parquet(s"$workDir/out").count()
      println(f"""{"corpus":"$corpusDir","chunk":"$chunkDir","commit_s":$commitS%.2f,"baseline_batch_s":$baselineS%.2f,"delta_batch_s":$deltaS%.2f,"out_rows":$outRows}""")
    } finally q.stop()
    spark.stop()
  }
}
