package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Real multimodal header decode: pure-JVM PNG/JPEG/WAV header parsing
  * over binary columns — the builders synthesize genuinely valid
  * header bytes, the parser recovers the exact fields, and every
  * malformed shape contains to `unknown` (never an executor
  * exception). */
class MediaHeadersSpec extends SparkSpec {
  import MediaHeaders._

  test("PNG: builder/parser round-trip across color types; channel " +
    "count derives from the color type") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4);
         (w, h, d) <- Seq((1, 1, 1), (1920, 1080, 8), (65535, 3, 16))) {
      val parsed = parse(pngBytes(w, h, d, ct))
      assert(parsed == Header("png", Some(w), Some(h), Some(d),
        Some(ch), None, None), s"ct=$ct w=$w h=$h d=$d -> $parsed")
    }
  }

  test("JPEG: marker walk reaches SOFn past APP segments; progressive " +
    "(SOF2) parses; DHT/DAC markers are not mistaken for frames") {
    val p = parse(jpegBytes(640, 480, 3))
    assert(p == Header("jpeg", Some(640), Some(480), Some(8),
      Some(3), None, None))
    // hand-build: SOI + DHT (C4 — must be skipped) + SOF2 (progressive)
    val dht = Array[Byte](0xff.toByte, 0xc4.toByte, 0, 4, 1, 2)
    val sof2 = java.nio.ByteBuffer.allocate(13)
    sof2.put(0xff.toByte).put(0xc2.toByte).putShort(11.toShort)
      .put(12.toByte).putShort(77.toShort).putShort(99.toShort)
      .put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
    val bytes = Array[Byte](0xff.toByte, 0xd8.toByte) ++ dht ++ sof2.array()
    assert(parse(bytes) == Header("jpeg", Some(99), Some(77), Some(12),
      Some(1), None, None))
  }

  test("WAV: fmt/data chunk walk; duration from declared data size " +
    "over byte rate; extra chunks skipped") {
    val p = parse(wavBytes(2, 44100, 16, 44100))
    assert(p == Header("wav", None, None, Some(16), Some(2),
      Some(44100), Some(1000L)), s"got $p")
    val mono = parse(wavBytes(1, 8000, 8, 4000))
    assert(mono.durationMs.contains(500L) && mono.channels.contains(1))
  }

  test("malformed payloads contain to unknown: truncation, garbage, " +
    "desync, missing chunks — never an exception") {
    val cases: Seq[Array[Byte]] = Seq(
      null,
      Array.empty[Byte],
      Array[Byte](0x89.toByte, 'P', 'N', 'G'), // truncated magic
      pngBytes(10, 10, 8, 2).take(20), // truncated IHDR
      pngBytes(0, 5, 8, 2), // zero width
      "just some text".getBytes("UTF-8"),
      Array[Byte](0xff.toByte, 0xd8.toByte), // SOI only
      Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x41), // marker desync
      jpegBytes(5, 5, 1).dropRight(24), // SOF truncated away
      wavBytes(1, 8000, 8, 100).take(16), // fmt chunk truncated
      "RIFF1234WAVE".getBytes("US-ASCII")) // no chunks at all
    cases.foreach { c =>
      assert(parse(c).format == "unknown",
        s"payload ${Option(c).map(_.length)} must contain")
    }
  }

  test("crafted WAV chunk sizes near 2^32 terminate: the walk does " +
    "Long arithmetic, so an le32 size whose Int cast is negative can " +
    "neither stall the cursor nor wrap it backwards") {
    // a chunk declaring size 0xFFFFFFF8 — as an Int that is -8, which
    // under 32-bit arithmetic advances the cursor by 8 + (-8) = 0
    def riff(chunkSize: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(0x7fffffff)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("junk".getBytes("US-ASCII")).putInt(chunkSize.toInt)
      out.array()
    }
    for (size <- Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x80000000L, 0x7FFFFFFFL)) {
      val t0 = System.nanoTime()
      assert(parse(riff(size)).format == "unknown", s"size=$size")
      assert(System.nanoTime() - t0 < 5e9, s"size=$size took too long")
    }
    // a huge declared size in the MIDDLE of an otherwise-valid file
    // must also terminate (walk past it runs off the end -> unknown)
    val wav = wavBytes(1, 8000, 8, 100)
    val bb = java.nio.ByteBuffer.wrap(wav.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, 0xFFFFFFF8) // corrupt the fmt chunk's size field
    assert(parse(bb.array()).format == "unknown")
  }

  test("MP4: box walk to moov/mvhd recovers timescale and duration " +
    "in both mvhd versions; v1 durations above 2^32 parse exactly") {
    val v0 = parse(mp4Bytes(1000, 90500))
    assert(v0 == Header("mp4", None, None, None, None,
      Some(1000), Some(90500L)), s"got $v0")
    val v1 = parse(mp4Bytes(90000, 5000000123L, v1 = true))
    assert(v1.format == "mp4" && v1.sampleRate.contains(90000) &&
      v1.durationMs.contains(5000000123L * 1000L / 90000L), s"got $v1")
    // a foreign box between ftyp and moov is skipped, not fatal
    val free = java.nio.ByteBuffer.allocate(16)
    free.putInt(16).put("free".getBytes("US-ASCII"))
      .put(new Array[Byte](8))
    val full = mp4Bytes(8000, 16000)
    val withFree = full.take(20) ++ free.array() ++ full.drop(20)
    assert(parse(withFree).durationMs.contains(2000L))
  }

  test("MP4 malformed payloads contain: truncated moov, zero-size and " +
    "crafted 64-bit largesize boxes all terminate to unknown") {
    assert(parse(mp4Bytes(1000, 1).take(24)).format == "unknown")
    assert(parse(mp4Bytes(0, 5)).format == "unknown") // zero timescale
    // size==0 box before any moov: runs to end, walk terminates
    val z = java.nio.ByteBuffer.allocate(28)
    z.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put(new Array[Byte](12))
    z.putInt(0).put("mdat".getBytes("US-ASCII"))
    assert(parse(z.array()).format == "unknown")
    // largesize with a crafted huge value must terminate, not spin
    val big = java.nio.ByteBuffer.allocate(36)
    big.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put(new Array[Byte](12))
    big.putInt(1).put("mdat".getBytes("US-ASCII"))
      .putLong(0x7fffffffffffff00L)
    val t0 = System.nanoTime()
    assert(parse(big.array()).format == "unknown")
    assert(System.nanoTime() - t0 < 5e9)
    // largesize of ZERO (next offset not past current) terminates too
    val loop = java.nio.ByteBuffer.allocate(36)
    loop.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put(new Array[Byte](12))
    loop.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(0L)
    assert(parse(loop.array()).format == "unknown")
  }

  test("decodeHeaders: the mapPartitions operator decodes a mixed " +
    "binary column, nulls and poison included, one row per input") {
    val rows = Seq(
      Row(1L, pngBytes(320, 200, 8, 6)),
      Row(2L, wavBytes(2, 16000, 16, 16000)),
      Row(3L, jpegBytes(12, 34, 3)),
      Row(4L, null),
      Row(5L, Array[Byte](1, 2, 3)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = true))))
    val out = decodeHeaders(media).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "png", 2L -> "wav", 3L -> "jpeg",
      4L -> "unknown", 5L -> "unknown"))
    val png = decodeHeaders(media).where("doc_id = 1").head()
    assert(png.getInt(2) == 320 && png.getInt(3) == 200 &&
      png.getInt(5) == 4)
    val wav = decodeHeaders(media).where("doc_id = 2").head()
    assert(wav.getInt(6) == 16000 && wav.getLong(7) == 1000L)
  }
}
