package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** PngCodec: real zlib + defilter round-trips, and the containment
  * contract — every malformed/hostile payload costs one None, never
  * an exception or an allocation bomb. The chunk assembly here is an
  * INDEPENDENT implementation (not the encoder's private writer), so
  * a shared framing bug can't self-verify. */
class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  private def px(x: Int, y: Int, c: Int): Int = x * 3 + y * 5 + c * 11

  /** Independent PNG assembly from (tag, data) chunks. */
  private def buildPng(chunks: (String, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a,
      '\n'), 0, 8)
    chunks.foreach { case (tag, data) =>
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      val t = tag.getBytes("US-ASCII")
      out.write(t)
      out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array())
    }
    out.toByteArray
  }
  private def ihdr(w: Int, h: Int, depth: Int, colorType: Int,
      interlace: Int = 0): Array[Byte] =
    java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(raw); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      buf.toByteArray
    } finally d.end()
  }

  test("every (filter type × color type) round-trips the exact " +
    "pixels through real compression") {
    for (ct <- Seq(0, 2, 4, 6); ft <- 0 to 4) {
      val bytes = PngCodec.encode(7, 5, ct, px, _ => ft)
      val r = PngCodec.decode(bytes).getOrElse(
        fail(s"decode failed for colorType=$ct filter=$ft"))
      assert((r.width, r.height) == ((7, 5)))
      for (y <- 0 until 5; x <- 0 until 7; c <- 0 until r.channels)
        assert((r.pixels(y * 7 * r.channels + x * r.channels + c) & 0xff)
          == (px(x, y, c) & 0xff),
          s"pixel ($x,$y,$c) colorType=$ct filter=$ft")
    }
    // mixed filters per scanline (the query's shape) round-trip too
    val mixed = PngCodec.encode(16, 12, 6, px, y => y % 5)
    val r = PngCodec.decode(mixed).get
    assert(r.channels == 4 && (r.pixels(0) & 0xff) == 0)
    assert(PngCodec.channelSums(r).sum ==
      (for (y <- 0 until 12; x <- 0 until 16; c <- 0 until 4)
        yield (px(x, y, c) & 0xff).toLong).sum)
  }

  test("the zlib stream split across MULTIPLE IDAT chunks at an " +
    "arbitrary byte boundary decodes identically") {
    val one = PngCodec.encode(9, 4, 2, px, _ => 3)
    val expect = PngCodec.decode(one).get
    // re-chunk: deflate the same raster, split mid-stream
    val stride = 9 * 3
    val raw = new Array[Byte](4 * (1 + stride))
    for (y <- 0 until 4) {
      raw(y * (1 + stride)) = 0
      for (x <- 0 until 9; c <- 0 until 3)
        raw(y * (1 + stride) + 1 + x * 3 + c) = (px(x, y, c) & 0xff).toByte
    }
    val z = deflate(raw)
    val cut = z.length / 3 + 1
    val split = buildPng(
      "IHDR" -> ihdr(9, 4, 8, 2),
      "IDAT" -> z.take(cut),
      "IDAT" -> z.drop(cut),
      "IEND" -> Array.emptyByteArray)
    val r = PngCodec.decode(split).getOrElse(fail("split-IDAT decode"))
    assert(r.pixels.toSeq == expect.pixels.toSeq)
  }

  test("malformed and out-of-scope payloads CONTAIN to None: " +
    "truncation, CRC damage, bogus filter, interlace, depth, " +
    "palette, zero and bomb geometry, trailing garbage") {
    val good = PngCodec.encode(7, 5, 2, px, _ => 4)
    assert(PngCodec.decode(good).isDefined)
    // truncated tail (the mm5 malformed class)
    assert(PngCodec.decode(good.dropRight(16)).isEmpty)
    // one flipped byte inside IDAT data: CRC must catch it
    val flipped = good.clone()
    flipped(8 + 25 + 8 + 3) = (flipped(8 + 25 + 8 + 3) ^ 0x40).toByte
    assert(PngCodec.decode(flipped).isEmpty)
    // bogus filter tag 7 on a scanline
    val badFilter = {
      val stride = 2 * 3
      val raw = new Array[Byte](1 + stride)
      raw(0) = 7
      buildPng("IHDR" -> ihdr(2, 1, 8, 2), "IDAT" -> deflate(raw),
        "IEND" -> Array.emptyByteArray)
    }
    assert(PngCodec.decode(badFilter).isEmpty)
    // interlaced (Adam7), 16-bit depth, palette WITHOUT PLTE: contain
    def geom(w: Int, h: Int, depth: Int, ct: Int, il: Int = 0) =
      buildPng("IHDR" -> ihdr(w, h, depth, ct, il),
        "IDAT" -> deflate(new Array[Byte](64)),
        "IEND" -> Array.emptyByteArray)
    assert(PngCodec.decode(geom(2, 2, 8, 2, il = 1)).isEmpty)
    assert(PngCodec.decode(geom(2, 2, 16, 2)).isEmpty)
    assert(PngCodec.decode(geom(2, 2, 8, 3)).isEmpty)
    // zero and bomb geometry: must die at the HEADER, pre-allocation
    assert(PngCodec.decode(geom(0, 5, 8, 2)).isEmpty)
    assert(PngCodec.decode(geom(Int.MaxValue, Int.MaxValue, 8, 6)).isEmpty)
    // compressed stream longer than the declared raster
    val overlong = {
      val stride = 2 * 3
      buildPng("IHDR" -> ihdr(2, 1, 8, 2),
        "IDAT" -> deflate(new Array[Byte](1 + stride + 40)),
        "IEND" -> Array.emptyByteArray)
    }
    assert(PngCodec.decode(overlong).isEmpty)
    // stream shorter than the declared raster
    val short = buildPng("IHDR" -> ihdr(8, 8, 8, 2),
      "IDAT" -> deflate(new Array[Byte](5)),
      "IEND" -> Array.emptyByteArray)
    assert(PngCodec.decode(short).isEmpty)
    // no IEND / no IDAT
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(2, 1, 8, 2),
      "IDAT" -> deflate(new Array[Byte](7)))).isEmpty)
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(2, 1, 8, 2),
      "IEND" -> Array.emptyByteArray)).isEmpty)
    // not a PNG at all / empty / null
    assert(PngCodec.decode("just text".getBytes("UTF-8")).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode(null).isEmpty)
  }

  test("palette (PLTE) decode: every filter type round-trips the " +
    "PLTE-expanded RGB pixels; malformed palettes contain") {
    val pal = Array(0x102030, 0xff0000, 0x00ff00, 0x0000ff, 0xa0b0c0)
    def ix(x: Int, y: Int): Int = (x * 7 + y * 3) % pal.length
    for (ft <- 0 to 4) {
      val bytes = PngCodec.encodePalette(9, 4, pal, ix, _ => ft)
      val r = PngCodec.decode(bytes).getOrElse(
        fail(s"palette decode failed for filter=$ft"))
      assert((r.width, r.height, r.channels) == ((9, 4, 3)))
      for (y <- 0 until 4; x <- 0 until 9) {
        val e = pal(ix(x, y))
        val o = y * 9 * 3 + x * 3
        assert((r.pixels(o) & 0xff) == ((e >> 16) & 0xff) &&
          (r.pixels(o + 1) & 0xff) == ((e >> 8) & 0xff) &&
          (r.pixels(o + 2) & 0xff) == (e & 0xff),
          s"pixel ($x,$y) filter=$ft")
      }
    }
    // an external-shaped assembly (independent framer) also decodes
    val plteBytes = pal.flatMap(c => Seq(((c >> 16) & 0xff).toByte,
      ((c >> 8) & 0xff).toByte, (c & 0xff).toByte))
    def raster(entries: Int): Array[Byte] = {
      val raw = new Array[Byte](2 * (1 + 3)) // 3x2, filter 0 rows
      raw(1) = 0; raw(2) = 1; raw(3) = (entries - 1).toByte
      raw(5) = 2; raw(6) = 3; raw(7) = 0
      raw
    }
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "PLTE" -> plteBytes, "IDAT" -> deflate(raster(pal.length)),
      "IEND" -> Array.emptyByteArray)).isDefined)
    // index past the palette end: malformed, contained
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "PLTE" -> plteBytes.take(9), "IDAT" -> deflate(raster(pal.length)),
      "IEND" -> Array.emptyByteArray)).isEmpty)
    // PLTE length not a multiple of 3 / empty / oversized
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "PLTE" -> plteBytes.take(8), "IDAT" -> deflate(raster(2)),
      "IEND" -> Array.emptyByteArray)).isEmpty)
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "PLTE" -> Array.emptyByteArray, "IDAT" -> deflate(raster(2)),
      "IEND" -> Array.emptyByteArray)).isEmpty)
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "PLTE" -> new Array[Byte](771), "IDAT" -> deflate(raster(2)),
      "IEND" -> Array.emptyByteArray)).isEmpty)
    // PLTE after IDAT, or twice: malformed
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "IDAT" -> deflate(raster(pal.length)), "PLTE" -> plteBytes,
      "IEND" -> Array.emptyByteArray)).isEmpty)
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "PLTE" -> plteBytes, "PLTE" -> plteBytes,
      "IDAT" -> deflate(raster(pal.length)),
      "IEND" -> Array.emptyByteArray)).isEmpty)
    // palette + tRNS: transparency would be dropped — contained
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(3, 2, 8, 3),
      "PLTE" -> plteBytes, "tRNS" -> Array[Byte](0x7f),
      "IDAT" -> deflate(raster(pal.length)),
      "IEND" -> Array.emptyByteArray)).isEmpty)
    // truecolor with a (suggested) PLTE still decodes as truecolor
    val stride = 2 * 3
    val tc = new Array[Byte](1 + stride)
    assert(PngCodec.decode(buildPng("IHDR" -> ihdr(2, 1, 8, 2),
      "PLTE" -> plteBytes, "IDAT" -> deflate(tc),
      "IEND" -> Array.emptyByteArray))
      .exists(r => r.channels == 3 && r.pixels.forall(_ == 0)))
  }

  test("pngPixelStats: per-channel means exact, malformed row " +
    "contains to valid=false; extractFeatures routes PNG payloads " +
    "through the REAL decode and falls back on damage") {
    val gray = PngCodec.encode(4, 3, 0, (x, y, _) => x + y, y => y % 5)
    val rgba = PngCodec.encode(2, 2, 6, (x, y, c) => 10 * c + x + y,
      _ => 1)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, gray), Row(2L, rgba), Row(3L, gray.dropRight(16)))),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = true))))
    val stats = Multimodal.pngPixelStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // gray 4x3, value x+y: sum = 12*mean; mean = (0+1+2+3)/4 + (0+1+2)/3
    assert(stats(1L).getBoolean(1) && stats(1L).getInt(4) == 1)
    assert(stats(1L).getDouble(6) == (1.5 + 1.0))
    assert(stats(1L).isNullAt(7) && stats(1L).isNullAt(9))
    // rgba 2x2: mean_c = 10c + 1
    assert(stats(2L).getBoolean(1) && stats(2L).getInt(4) == 4)
    (0 to 3).foreach(c =>
      assert(stats(2L).getDouble(6 + c) == 10.0 * c + 1.0))
    assert(!stats(3L).getBoolean(1) && stats(3L).isNullAt(2) &&
      stats(3L).isNullAt(6))

    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // real decode: n_frames = 1, features = 3 channel means + n_px
    assert(feats(1L).getInt(2) == 1)
    assert(feats(1L).getSeq[Double](3) == Seq(2.5, 2.5, 2.5, 12.0))
    assert(feats(2L).getInt(2) == 1)
    assert(feats(2L).getSeq[Double](3) == Seq(1.0, 11.0, 21.0, 4.0))
    // damaged PNG: contained to the byte-stat fallback, not a crash
    val fb = feats(3L)
    assert(fb.getInt(2) == (gray.length - 16) % 10 + 1)
  }
}
