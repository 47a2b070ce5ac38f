package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG pixel codec (RFC 2083): chunk walk → IDAT concat →
  * zlib inflate → per-scanline defilter (all five filter types, §6).
  * No native codec libraries — `java.util.zip` IS zlib, and the
  * filter algebra is a page of byte arithmetic. Scope: the baseline
  * non-interlaced 8-bit-depth forms a training-data lake actually
  * stores in bulk (gray / gray+alpha / RGB / RGBA, plus PLTE-indexed
  * palette expanded to RGB); everything else — 16-bit depths, Adam7
  * interlace, palette-with-tRNS — and every malformed payload —
  * CONTAINS to None, never an executor crash (the f17 poison-payload
  * discipline: one corrupt image in a
  * 100-TB corpus must not fail the stage). The encoder exists so
  * tests and queries can synthesize REAL compressed+filtered PNGs
  * with closed-form pixel statistics.
  *
  * Containment is also a resource bound: the declared geometry is
  * capped BEFORE any allocation (a 33-byte payload can declare 2^62
  * pixels — a zip bomb must die at the header, not at the allocator),
  * and the inflater writes into an exact-size buffer, so compressed
  * data can never expand past the declared raster. */
object PngCodec {

  /** Defiltered raster: `pixels(y * width * channels + x * channels + c)`
    * as unsigned bytes (`& 0xff`). */
  final case class Raster(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** channels per color type, 8-bit depth only: 0=gray, 2=RGB,
    * 4=gray+alpha, 6=RGBA. Palette type 3 is handled separately
    * (1 index byte per pixel on the wire, PLTE-expanded to RGB on
    * output); a palette image WITH transparency (tRNS) is contained —
    * silently dropping an alpha channel would misreport pixels. */
  private val ChannelsOf = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)

  /** Decoded raster cap: 64M samples ≈ a 4096×4096 RGBA image. Larger
    * DECLARED geometry is contained, bounding executor memory against
    * hostile headers (decode bigger media out-of-band, not per-row). */
  private val MaxSamples = 1L << 26

  // ---------- decode ----------

  /** None on ANY malformed/out-of-scope payload: bad signature, bad
    * chunk structure, CRC mismatch on a critical chunk, non-8-bit
    * depth, palette/unknown color type, interlace, zlib error, short
    * or over-long raster, bogus filter tag, zero/oversized geometry. */
  def decode(bytes: Array[Byte]): Option[Raster] = {
    if (bytes == null || bytes.length < Signature.length + 25) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    try decodeChunks(bytes) catch {
      // the codec is TOTAL over byte[]: any slip in the arithmetic
      // below must contain, not poison the partition
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException |
          _: java.util.zip.DataFormatException |
          _: IllegalArgumentException => None
    }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def crcOk(b: Array[Byte], typeAt: Int, dataLen: Int): Boolean = {
    val crc = new CRC32
    crc.update(b, typeAt, 4 + dataLen)
    crc.getValue == be32(b, typeAt + 4 + dataLen)
  }

  private def decodeChunks(b: Array[Byte]): Option[Raster] = {
    // IHDR MUST be the first chunk (RFC 2083 §3)
    if (be32(b, 8) != 13L) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    if (!crcOk(b, 12, 13)) return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    val interlace = u8(b, 28)
    val paletted = colorType == 3
    val channels =
      if (paletted) 1 else ChannelsOf.getOrElse(colorType, return None)
    if (bitDepth != 8 || interlace != 0) return None
    if (width <= 0 || height <= 0) return None
    // per-dimension cap FIRST: the product of two raw be32 fields
    // times channels can overflow Long (2^32 · 2^32 · 4); palette
    // output expands 1 index byte to 3 RGB samples, cap the OUTPUT
    if (width > MaxSamples || height > MaxSamples) return None
    if (width * height * (if (paletted) 3L else channels.toLong) >
      MaxSamples) return None
    val w = width.toInt; val h = height.toInt
    val stride = w * channels                  // raw bytes per scanline
    val rawLen = h * (1 + stride)              // +1 filter tag per line

    // walk the remaining chunks; concatenate every IDAT's data (the
    // zlib stream may be split across chunks at ANY byte boundary)
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8 + 25
    var sawEnd = false
    var plte: Array[Byte] = null
    while (pos + 12 <= b.length && !sawEnd) {
      val len = be32(b, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return None
      val l = len.toInt
      val tag = new String(b, pos + 4, 4, "US-ASCII")
      tag match {
        case "IDAT" =>
          if (!crcOk(b, pos + 4, l)) return None
          idat.write(b, pos + 8, l)
        case "PLTE" =>
          // critical for type 3 (RFC 2083 §4.1.2): CRC-checked, 1-256
          // RGB triples, at most one, and BEFORE any IDAT
          if (!crcOk(b, pos + 4, l)) return None
          if (plte != null || idat.size > 0) return None
          if (l == 0 || l % 3 != 0 || l > 768) return None
          plte = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + l)
        case "tRNS" =>
          // palette transparency is out of decode scope: expanding to
          // RGB would silently DROP alpha — contain instead (truecolor
          // tRNS is a rendering hint over full pixels; also skipped,
          // but those pixels are reported faithfully)
          if (paletted) return None
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped, CRCs not our problem
      }
      pos += 12 + l
    }
    if (!sawEnd || idat.size == 0) return None
    if (paletted && plte == null) return None

    // inflate into the EXACT declared raster size: short = truncated,
    // refusing-to-finish = trailing garbage — both malformed
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        // zero progress while unfinished = truncated stream or a
        // preset-dictionary demand — both malformed here
        if (n == 0 && !inf.finished()) return None
        off += n
      }
      if (off != rawLen) return None
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) != 0)
        return None                                 // over-long raster
    } finally inf.end()

    // per-scanline defilter, in place into the output raster
    val out = new Array[Byte](h * stride)
    val bpp = channels // 8-bit depth: bytes per pixel == channels
    var y = 0
    while (y < h) {
      val ft = u8(raw, y * (1 + stride))
      val src = y * (1 + stride) + 1
      val dst = y * stride
      if (ft < 0 || ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = u8(raw, src + x)
        val a = if (x >= bpp) u8(out, dst + x - bpp) else 0   // left
        val bb = if (y > 0) u8(out, dst - stride + x) else 0  // up
        val c = if (y > 0 && x >= bpp) u8(out, dst - stride + x - bpp)
          else 0                                              // up-left
        val recon = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + bb
          case 3 => f + ((a + bb) >> 1)
          case 4 => f + paeth(a, bb, c)
        }
        out(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    if (!paletted) Some(Raster(w, h, channels, out))
    else {
      // PLTE indirection: every index byte must address a real entry
      // (an out-of-range index is malformed per RFC 2083 §4.1.2)
      val entries = plte.length / 3
      val rgb = new Array[Byte](h * w * 3)
      var i = 0
      while (i < out.length) {
        val idx = out(i) & 0xff
        if (idx >= entries) return None
        rgb(i * 3) = plte(idx * 3)
        rgb(i * 3 + 1) = plte(idx * 3 + 1)
        rgb(i * 3 + 2) = plte(idx * 3 + 2)
        i += 1
      }
      Some(Raster(w, h, 3, rgb))
    }
  }

  /** Paeth predictor (RFC 2083 §6.6): nearest of a/b/c to a+b-c,
    * ties broken a, b, c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Per-channel Long sums over the raster — the exact-integer base
    * every derived statistic (mean, luminance) divides ONCE, so an
    * oracle can mirror it closed-form (the Exact money discipline). */
  def channelSums(r: Raster): Array[Long] = {
    val sums = new Array[Long](r.channels)
    var i = 0
    while (i < r.pixels.length) {
      sums(i % r.channels) += (r.pixels(i) & 0xff)
      i += 1
    }
    sums
  }

  // ---------- encode ----------

  /** A REAL compressed PNG: signature, IHDR, one IDAT (zlib-deflated
    * filtered scanlines), IEND — all CRCs genuine, so any external
    * decoder agrees on the pixels. `pixel(x, y, c)` supplies each
    * sample (masked to 0-255); `filterOf(y)` picks the per-scanline
    * filter type 0-4, letting tests and queries exercise EVERY
    * defilter path with closed-form content. */
  def encode(width: Int, height: Int, colorType: Int,
      pixel: (Int, Int, Int) => Int,
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    val channels = ChannelsOf.getOrElse(colorType,
      throw new IllegalArgumentException(s"color type $colorType"))
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    val stride = width * channels
    // raw raster, then forward-filter per scanline
    val raster = new Array[Byte](height * stride)
    for (y <- 0 until height; x <- 0 until width; c <- 0 until channels)
      raster(y * stride + x * channels + c) =
        (pixel(x, y, c) & 0xff).toByte
    val raw = new Array[Byte](height * (1 + stride))
    val bpp = channels
    for (y <- 0 until height) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"filter $ft")
      raw(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = raster(y * stride + x) & 0xff
        val a = if (x >= bpp) raster(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) raster((y - 1) * stride + x) & 0xff else 0
        val cc = if (y > 0 && x >= bpp)
          raster((y - 1) * stride + x - bpp) & 0xff else 0
        val filt = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, cc)
        }
        raw(y * (1 + stride) + 1 + x) = (filt & 0xff).toByte
      }
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    val zipped = try {
      deflater.setInput(raw); deflater.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
      buf.toByteArray
    } finally deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zipped)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A REAL palette PNG (color type 3): PLTE of `palette` RGB triples
    * (each 0xRRGGBB), scanlines of `index(x, y)` bytes filtered per
    * `filterOf` — so palette decode is testable against the same
    * closed-form content discipline as [[encode]]. */
  def encodePalette(width: Int, height: Int, palette: Array[Int],
      index: (Int, Int) => Int,
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size ${palette.length}")
    val stride = width // 1 index byte per pixel
    val raster = new Array[Byte](height * stride)
    for (y <- 0 until height; x <- 0 until width) {
      val ix = index(x, y)
      require(ix >= 0 && ix < palette.length, s"index $ix at ($x,$y)")
      raster(y * stride + x) = ix.toByte
    }
    val raw = new Array[Byte](height * (1 + stride))
    for (y <- 0 until height) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"filter $ft")
      raw(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = raster(y * stride + x) & 0xff
        val a = if (x >= 1) raster(y * stride + x - 1) & 0xff else 0
        val b = if (y > 0) raster((y - 1) * stride + x) & 0xff else 0
        val cc = if (y > 0 && x >= 1)
          raster((y - 1) * stride + x - 1) & 0xff else 0
        val filt = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, cc)
        }
        raw(y * (1 + stride) + 1 + x) = (filt & 0xff).toByte
      }
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    val zipped = try {
      deflater.setInput(raw); deflater.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
      buf.toByteArray
    } finally deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writeChunk(out, "IHDR", ihdr)
    val plte = new Array[Byte](palette.length * 3)
    palette.indices.foreach { i =>
      plte(i * 3) = ((palette(i) >> 16) & 0xff).toByte
      plte(i * 3 + 1) = ((palette(i) >> 8) & 0xff).toByte
      plte(i * 3 + 2) = (palette(i) & 0xff).toByte
    }
    writeChunk(out, "PLTE", plte)
    writeChunk(out, "IDAT", zipped)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream,
      tag: String, data: Array[Byte]): Unit = {
    val t = tag.getBytes("US-ASCII")
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    val c = java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array()
    out.write(c, 0, 4)
  }
}
