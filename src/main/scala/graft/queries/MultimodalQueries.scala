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
