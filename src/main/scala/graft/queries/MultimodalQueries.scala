package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries ([EXT]). The media payloads are
  * deterministic fakes (UTF-8 bytes of `documents.text` standing in for
  * image bytes — the real decoder is stubbed, see operators.Multimodal),
  * but the Spark plumbing is real: binary column + typed metadata
  * struct, per-partition batched decode, explode-based frame sampling.
  * MM1's stub features are byte-derived, so the oracle can mirror them
  * exactly from the text (ASCII corpus: byte i == char i+1).
  */
object MultimodalQueries {

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- MM1 decode + feature-extract through the mapPartitions stub
    "mm1_media_features" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.asMediaTable(Tables(s, dir, "documents"))
        Multimodal.extractFeatures(media)
          .select($"doc_id", $"n_bytes", $"n_frames",
            element_at($"feature", 1).as("f0"),
            element_at($"feature", 2).as("f1"),
            element_at($"feature", 3).as("f2"),
            element_at($"feature", 4).as("f3"))
      },
      Some("""SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_bytes,
        CAST(length(text) % 10 + 1 AS INT) AS n_frames,
        ascii(substr(text, (0 * (length(text) - 1)) // 3 + 1, 1))::DOUBLE AS f0,
        ascii(substr(text, (1 * (length(text) - 1)) // 3 + 1, 1))::DOUBLE AS f1,
        ascii(substr(text, (2 * (length(text) - 1)) // 3 + 1, 1))::DOUBLE AS f2,
        ascii(substr(text, (3 * (length(text) - 1)) // 3 + 1, 1))::DOUBLE AS f3
        FROM documents""")),

    // ---- MM2 frame sampling (explode over declared frames, stride 2)
    "mm2_frame_sample" -> QueryDef(
      (s, dir) => {
        val media = Multimodal.asMediaTable(Tables(s, dir, "documents"))
        Multimodal.sampleFrames(media, stride = 2)
      },
      None,
      doc = "rows-only: frame hashes use Spark xxhash64"),

    // ---- MM3 REAL header decode (operators.MediaHeaders): payloads
    // are genuine PNG/JPEG/WAV header bytes synthesized with closed-
    // form fields from doc_id (any external header reader agrees on
    // them), plus a malformed class (truncated magic) that must
    // contain to format='unknown' — the f17 poison-payload discipline
    // on the binary path. Hash-checked per doc against the closed
    // form.
    "mm3_media_headers" -> QueryDef(
      (s, dir) => {
        import graft.operators.MediaHeaders
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val payloads = Tables(s, dir, "documents").select("doc_id")
          .rdd.map { r =>
            val id = r.getLong(0)
            val bytes = (id % 4) match {
              case 0 => MediaHeaders.pngBytes((id % 1920 + 1).toInt,
                (id % 1080 + 1).toInt, 8,
                Seq(0, 2, 6)((id % 3).toInt))
              case 1 => MediaHeaders.jpegBytes((id % 1000 + 1).toInt,
                (id % 800 + 1).toInt, 3)
              case 2 => MediaHeaders.wavBytes((id % 2 + 1).toInt,
                8000, 16, id % 5000 + 1000)
              case _ => // truncated PNG magic: must contain, not fail
                Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
            }
            Row(id, bytes)
          }
        val media = s.createDataFrame(payloads, StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = true))))
        MediaHeaders.decodeHeaders(media)
      },
      Some("""SELECT doc_id,
          CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
            WHEN 2 THEN 'wav' ELSE 'unknown' END AS format,
          CASE doc_id % 4 WHEN 0 THEN CAST(doc_id % 1920 + 1 AS INT)
            WHEN 1 THEN CAST(doc_id % 1000 + 1 AS INT) END AS width,
          CASE doc_id % 4 WHEN 0 THEN CAST(doc_id % 1080 + 1 AS INT)
            WHEN 1 THEN CAST(doc_id % 800 + 1 AS INT) END AS height,
          CASE doc_id % 4 WHEN 0 THEN CAST(8 AS INT)
            WHEN 1 THEN CAST(8 AS INT)
            WHEN 2 THEN CAST(16 AS INT) END AS bit_depth,
          CASE doc_id % 4
            WHEN 0 THEN CAST(CASE doc_id % 3 WHEN 0 THEN 1
              WHEN 1 THEN 3 ELSE 4 END AS INT)
            WHEN 1 THEN CAST(3 AS INT)
            WHEN 2 THEN CAST(doc_id % 2 + 1 AS INT) END AS channels,
          CASE WHEN doc_id % 4 = 2
            THEN CAST(8000 AS INT) END AS sample_rate,
          CASE WHEN doc_id % 4 = 2
            THEN CAST((doc_id % 5000 + 1000) * 1000 // 8000 AS BIGINT)
            END AS duration_ms
        FROM documents""")),

    // ---- MM4 video headers: real ISO-BMFF (MP4) box-walk to the
    // `mvhd` movie header — duration/timescale with closed-form
    // fields from doc_id, covering BOTH mvhd versions (v1's 64-bit
    // duration deliberately exceeds 2^32) plus a truncated class
    // (ftyp with no moov) that must contain to 'unknown'. The parsed
    // timescale rides the sample_rate column. Hash-checked per doc.
    "mm4_video_headers" -> QueryDef(
      (s, dir) => {
        import graft.operators.MediaHeaders
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val payloads = Tables(s, dir, "documents").select("doc_id")
          .rdd.map { r =>
            val id = r.getLong(0)
            val bytes = (id % 3) match {
              case 0 => MediaHeaders.mp4Bytes(
                ((id % 9 + 1) * 1000).toInt, id % 100000 + 500)
              case 1 => MediaHeaders.mp4Bytes(90000,
                5000000000L + id, v1 = true)
              case _ => // ftyp only, moov truncated away: contain
                MediaHeaders.mp4Bytes(1000, 1).take(24)
            }
            Row(id, bytes)
          }
        val media = s.createDataFrame(payloads, StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = true))))
        MediaHeaders.decodeHeaders(media)
          .select("doc_id", "format", "sample_rate", "duration_ms")
      },
      Some("""SELECT doc_id,
          CASE doc_id % 3 WHEN 2 THEN 'unknown' ELSE 'mp4' END AS format,
          CASE doc_id % 3
            WHEN 0 THEN CAST((doc_id % 9 + 1) * 1000 AS INT)
            WHEN 1 THEN CAST(90000 AS INT) END AS sample_rate,
          CASE doc_id % 3
            WHEN 0 THEN CAST((doc_id % 100000 + 500) * 1000
              // ((doc_id % 9 + 1) * 1000) AS BIGINT)
            WHEN 1 THEN CAST((5000000000 + doc_id) * 1000 // 90000
              AS BIGINT)
            END AS duration_ms
        FROM documents""")),

    // ---- MM5 REAL PNG pixel decode (operators.PngCodec): payloads
    // are genuine zlib-compressed PNGs — signature, IHDR, deflated
    // IDAT, true CRCs — with per-scanline filters cycling through ALL
    // FIVE RFC 2083 types, so one wrong defilter path breaks the hash
    // against the closed-form oracle. Pixel (x,y,c) = x + 2y + 7c + k
    // (k = doc_id%190; bounded under 256, so channel sums are exact
    // and each mean is one IEEE division of exact integers — the
    // oracle reproduces it bit-for-bit). Classes by doc_id%7:
    // gray / RGB / RGBA, and %7==6 truncates the tail (IEND + part of
    // the IDAT CRC) — the malformed class must contain to
    // valid=false, never fail the stage.
    "mm5_png_pixels" -> QueryDef(
      (s, dir) => {
        import graft.operators.PngCodec
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val payloads = Tables(s, dir, "documents").select("doc_id")
          .rdd.map { r =>
            val id = r.getLong(0)
            val w = (id % 16 + 1).toInt
            val h = (id % 12 + 1).toInt
            val k = (id % 190).toInt
            val colorType = (id % 7) match {
              case 0 | 1 | 6 => 0
              case 2 | 3 => 2
              case _ => 6
            }
            val png = PngCodec.encode(w, h, colorType,
              (x, y, c) => x + 2 * y + 7 * c + k,
              y => ((y + id) % 5).toInt)
            Row(id, if (id % 7 == 6) png.dropRight(16) else png)
          }
        val media = s.createDataFrame(payloads, StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = true))))
        graft.operators.Multimodal.pngPixelStats(media)
      },
      Some("""SELECT doc_id,
          doc_id % 7 <> 6 AS valid,
          CASE WHEN doc_id % 7 <> 6
            THEN CAST(doc_id % 16 + 1 AS INT) END AS width,
          CASE WHEN doc_id % 7 <> 6
            THEN CAST(doc_id % 12 + 1 AS INT) END AS height,
          CASE WHEN doc_id % 7 <> 6 THEN CAST(
            CASE WHEN doc_id % 7 <= 1 THEN 1
                 WHEN doc_id % 7 <= 3 THEN 3 ELSE 4 END AS INT)
            END AS channels,
          CASE WHEN doc_id % 7 <> 6
            THEN CAST((doc_id % 16 + 1) * (doc_id % 12 + 1) AS BIGINT)
            END AS n_px,
          CASE WHEN doc_id % 7 <> 6
            THEN (doc_id % 16) / 2.0 + (doc_id % 12) + (doc_id % 190)
            END AS mean_c0,
          CASE WHEN doc_id % 7 IN (2, 3, 4, 5)
            THEN (doc_id % 16) / 2.0 + (doc_id % 12) + 7 + (doc_id % 190)
            END AS mean_c1,
          CASE WHEN doc_id % 7 IN (2, 3, 4, 5)
            THEN (doc_id % 16) / 2.0 + (doc_id % 12) + 14 + (doc_id % 190)
            END AS mean_c2,
          CASE WHEN doc_id % 7 IN (4, 5)
            THEN (doc_id % 16) / 2.0 + (doc_id % 12) + 21 + (doc_id % 190)
            END AS mean_c3
        FROM documents""")),

    // ---- MM2 self-check: the frame hashes have no DuckDB mirror, but
    // the sampling arithmetic does — stride-2 over declared_frames =
    // len%10+1 frames yields floor((n-1)/2)+1 samples ending at
    // 2*floor((n-1)/2). Hash-checked per doc.
    "mm2_frame_counts" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.asMediaTable(Tables(s, dir, "documents"))
        Multimodal.sampleFrames(media, stride = 2)
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_sampled"),
            max($"frame_idx").cast("int").as("last_idx"))
      },
      Some("""SELECT doc_id,
        CAST((length(text) % 10) // 2 + 1 AS BIGINT) AS n_sampled,
        CAST((length(text) % 10) // 2 * 2 AS INT) AS last_idx
        FROM documents"""))
  )
}
