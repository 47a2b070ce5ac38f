package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing ([EXT] per the north star): image/audio/
  * video payloads are opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract run per-partition in batches.
  *
  * The PIXEL/SAMPLE decode here is a deterministic stand-in
  * (`decodeStub` — full codec libraries are not in this container),
  * exercising the Spark-side contract: schema, the per-partition batch
  * path (Scala's analogue of `mapInPandas`: `mapPartitions` over an
  * iterator, one decoder init per partition, streaming through rows
  * without collecting), and the deterministic output shape. The REAL
  * header decode — PNG/JPEG/WAV dimensions, bit depth, channels,
  * duration parsed from actual format bytes — lives in
  * [[MediaHeaders]] on the same batch shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("declared_frames", IntegerType, nullable = false))),
      nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = true)))

  /** Wrap a text table as a fake media table: payload = UTF-8 bytes
    * (deterministic stand-in for real image bytes), typed metadata. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (pmod(octet_length(encode(col("text"), "UTF-8")), lit(10)) + 1)
          .as("declared_frames")).as("meta"))

  /** Deterministic fake decode: a real decoder would parse the codec
    * here; the stub derives features from the raw bytes so results are
    * reproducible and oracle-checkable. One "decoder" per partition,
    * rows streamed — the exact batch shape a JNI/FFmpeg decoder needs. */
  private def decodeStub(payload: Array[Byte]): (Int, Array[Double]) = {
    val nFrames = payload.length % 10 + 1
    val feature = Array.tabulate(4) { i =>
      if (payload.isEmpty) 0.0
      // Long arithmetic: i * (len-1) overflows Int past ~715 MB —
      // a single large video payload would index negative and crash
      else payload((i.toLong * (payload.length - 1) / 3).toInt).toDouble
    }
    (nFrames, feature)
  }

  /** Per-partition batched decode/feature-extract over the media table. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      // decoder init would happen once per partition here
      it.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty)
        val (nFrames, feature) = decodeStub(payload)
        Row(id, payload.length.toLong, nFrames, feature.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling stub: emit every `stride`-th "frame" index with a
    * byte-derived fingerprint; shape of a video frame-sample stage. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be positive: $stride")
    media.select(col("doc_id"), col("meta.declared_frames").as("n"),
      col("payload"))
      // zero-frame media yields zero sampled frames — sequence(0, -1)
      // is an eval-time error that would fail the whole job on one
      // empty file, not an empty list
      .where(col("n") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"),
        xxhash64(col("payload"), col("frame_idx")).as("frame_hash"))
  }
}
