package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing ([EXT] per the north star): image/audio/
  * video payloads are opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract run per-partition in batches.
  *
  * PNG payloads get a REAL pixel decode ([[PngCodec]]: zlib inflate +
  * per-scanline defilter, pure JVM) — [[pngPixelStats]] for typed
  * per-channel statistics, and [[extractFeatures]] routes PNG bytes
  * through the same decoder. Formats without an in-container codec
  * (JPEG entropy decode, video frames) keep the deterministic
  * byte-stat fallback (`byteStatFallback`), exercising the Spark-side
  * contract: schema, the per-partition batch path (Scala's analogue
  * of `mapInPandas`: `mapPartitions` over an iterator, one decoder
  * init per partition, streaming through rows without collecting),
  * and the deterministic output shape. The header-only decode —
  * PNG/JPEG/WAV/MP4 dimensions, bit depth, channels, duration parsed
  * from actual format bytes — lives in [[MediaHeaders]] on the same
  * batch shape.
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

  /** Deterministic byte-stat features for formats WITHOUT an
    * in-container codec (a real JPEG/video decoder would slot in
    * here): derived from the raw bytes so results are reproducible
    * and oracle-checkable. One "decoder" per partition, rows streamed
    * — the exact batch shape a JNI/FFmpeg decoder needs. */
  private def byteStatFallback(payload: Array[Byte]): (Int, Array[Double]) = {
    val nFrames = payload.length % 10 + 1
    val feature = Array.tabulate(4) { i =>
      if (payload.isEmpty) 0.0
      // Long arithmetic: i * (len-1) overflows Int past ~715 MB —
      // a single large video payload would index negative and crash
      else payload((i.toLong * (payload.length - 1) / 3).toInt).toDouble
    }
    (nFrames, feature)
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == '\r' && b(5) == '\n' && b(6) == 0x1a &&
      b(7) == '\n'

  /** Per-partition batched decode/feature-extract over the media
    * table. PNG payloads get the REAL pixel decode: features are the
    * first-three-channel means (gray replicated) plus the pixel
    * count, n_frames = 1 (a PNG is one frame). A PNG-signature
    * payload that fails to decode — and every non-PNG format —
    * contains to the byte-stat fallback rather than failing the
    * stage. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      // decoder init would happen once per partition here
      it.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty)
        val (nFrames, feature) =
          (if (isPng(payload)) PngCodec.decode(payload) else None) match {
            case Some(raster) =>
              val sums = PngCodec.channelSums(raster)
              val nPx = raster.width.toLong * raster.height
              def mean(c: Int): Double =
                sums(math.min(c, raster.channels - 1)).toDouble / nPx
              (1, Array(mean(0), mean(1), mean(2), nPx.toDouble))
            case None => byteStatFallback(payload)
          }
        Row(id, payload.length.toLong, nFrames, feature.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  val pngStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_px", LongType, nullable = true),
    StructField("mean_c0", DoubleType, nullable = true),
    StructField("mean_c1", DoubleType, nullable = true),
    StructField("mean_c2", DoubleType, nullable = true),
    StructField("mean_c3", DoubleType, nullable = true)))

  /** Typed per-channel pixel statistics from the REAL PNG decode:
    * geometry, channel count, and per-channel means (exact-integer
    * channel sums, ONE IEEE division each — the Exact discipline, so
    * a closed-form oracle reproduces them bit-exact). Malformed or
    * out-of-scope payloads contain to `valid = false` with NULL
    * stats; at 100 TB one corrupt image must cost one row, not the
    * stage. Distributed shape: mapPartitions batches, no shuffle —
    * cost is one streaming pass over the payload bytes. */
  def pngPixelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty)
        PngCodec.decode(payload) match {
          case Some(raster) =>
            val sums = PngCodec.channelSums(raster)
            val nPx = raster.width.toLong * raster.height
            def mean(c: Int): Any =
              if (c < raster.channels) sums(c).toDouble / nPx else null
            Row(id, true, raster.width, raster.height, raster.channels,
              nPx, mean(0), mean(1), mean(2), mean(3))
          case None =>
            Row(id, false, null, null, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, pngStatsSchema)
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
