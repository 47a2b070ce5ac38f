package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Real multimodal header decode — pure-JVM byte parsing of the three
  * container formats a training-data lake meets most (PNG, JPEG, WAV),
  * replacing the round-7 decode stub. Parsing is HEADER-ONLY by
  * design: at 100 TB the metadata pass (dimensions, bit depth,
  * channels, duration) must cost O(bytes read per file header), not a
  * full pixel decode — the same reason parquet readers read footers.
  * Runs per-partition over binary columns in the `mapPartitions` batch
  * shape a native (JNI/FFmpeg) decoder would use, one parser instance
  * per partition, rows streamed.
  *
  * Malformed-payload containment (the f17 discipline): any truncated,
  * corrupt, or foreign payload parses to `format = "unknown"` with
  * null fields — a poison byte string must never fail the job.
  *
  * Format references (public specs): PNG — RFC 2083 §3 (8-byte
  * signature, IHDR first chunk); JPEG — ITU T.81 §B.2 (FFD8 SOI,
  * marker segments, SOFn frame headers); WAV — RIFF/WAVE with `fmt `
  * and `data` chunks (Microsoft multimedia file format spec).
  */
object MediaHeaders {

  /** Parsed header fields; absent = not applicable or unparseable. */
  final case class Header(format: String,
      width: Option[Int], height: Option[Int], bitDepth: Option[Int],
      channels: Option[Int], sampleRate: Option[Int],
      durationMs: Option[Long])

  private val Unknown =
    Header("unknown", None, None, None, None, None, None)

  val headerSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("bit_depth", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  // ------------------------------------------------------------ parsing

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Dispatch on magic bytes; every failure path is `unknown`. */
  def parse(bytes: Array[Byte]): Header =
    try {
      if (bytes == null) Unknown
      else if (isPng(bytes)) parsePng(bytes)
      else if (isJpeg(bytes)) parseJpeg(bytes)
      else if (isWav(bytes)) parseWav(bytes)
      else if (isMp4(bytes)) parseMp4(bytes)
      else Unknown
    } catch { case scala.util.control.NonFatal(_) => Unknown }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b, 0) == 0x89 && u8(b, 1) == 'P' &&
      u8(b, 2) == 'N' && u8(b, 3) == 'G' && u8(b, 4) == 0x0d &&
      u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** PNG: the IHDR chunk MUST come first (RFC 2083): 4-byte length,
    * "IHDR", then width(4 BE), height(4 BE), bit depth(1), color
    * type(1). Channel count derives from the color type. */
  private def parsePng(b: Array[Byte]): Header = {
    if (b.length < 8 + 8 + 13) return Unknown
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return Unknown
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
      return Unknown
    val depth = u8(b, 24)
    val channels = u8(b, 25) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return Unknown
    }
    Header("png", Some(w.toInt), Some(h.toInt), Some(depth),
      Some(channels), None, None)
  }

  /** JPEG: walk FFxx marker segments from SOI to the first SOFn frame
    * header (precision(1), height(2 BE), width(2 BE), components(1)).
    * SOFn = C0–CF minus C4 (DHT), C8 (JPG), CC (DAC). */
  private def parseJpeg(b: Array[Byte]): Header = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return Unknown // marker desync
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
      else if (m == 0xd9 || m == 0xda) return Unknown // EOI/SOS before SOF
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return Unknown
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (len < 8) return Unknown
          val precision = u8(b, i + 4)
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          val comps = u8(b, i + 9)
          if (w == 0 || h == 0 || comps == 0) return Unknown
          return Header("jpeg", Some(w), Some(h), Some(precision),
            Some(comps), None, None)
        }
        i += 2 + len
      }
    }
    Unknown
  }

  /** WAV: RIFF/WAVE chunk walk for `fmt ` (channels LE16 at +2, sample
    * rate LE32 at +4, byte rate LE32 at +8, bits/sample LE16 at +14)
    * and `data` (payload size → duration = size / byteRate). */
  private def parseWav(b: Array[Byte]): Header = {
    // All offset arithmetic in Long: le32 yields [0, 2^32), and a
    // crafted chunk size near 2^32 must neither overflow Int (stalling
    // the walk at a fixed offset — a non-terminating executor task the
    // NonFatal catch can't interrupt) nor wrap the cursor.
    var i = 12L
    var channels, sampleRate, bits = -1
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val id = new String(b, i.toInt, 4, "US-ASCII")
      val size = le32(b, i.toInt + 4)
      if (id == "fmt ") {
        if (i + 8 + 16 > b.length) return Unknown
        channels = le16(b, i.toInt + 10)
        sampleRate = le32(b, i.toInt + 12).toInt
        byteRate = le32(b, i.toInt + 16)
        bits = le16(b, i.toInt + 22)
      } else if (id == "data") {
        // the declared size is authoritative even when the payload is
        // truncated on disk — headers describe the logical stream
        dataSize = size
      }
      val next = i + 8 + size + (size & 1) // chunks are word-aligned
      if (next <= i) return Unknown // crafted size: no forward progress
      i = next
    }
    if (channels <= 0 || sampleRate <= 0 || bits <= 0 || dataSize < 0)
      return Unknown
    val durMs =
      if (byteRate > 0) dataSize * 1000L / byteRate
      else return Unknown
    Header("wav", None, None, Some(bits), Some(channels),
      Some(sampleRate), Some(durMs))
  }

  /** MP4/ISO-BMFF sniff: the first box is conventionally `ftyp`
    * (ISO/IEC 14496-12 §4.3). */
  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
      b(7) == 'p'

  /** MP4: walk the top-level ISO-BMFF box sequence to `moov`, then its
    * children to `mvhd` (movie header, ISO/IEC 14496-12 §8.2.2):
    * version 0 carries timescale(4 BE) + duration(4 BE) at offset 12
    * of the box payload, version 1 at offset 20 with a 64-bit
    * duration. Duration ms = duration * 1000 / timescale. All offset
    * arithmetic in Long with strict forward progress — the same
    * crafted-size discipline as the WAV walk (size==1 means a 64-bit
    * largesize follows; size==0 means "to end of enclosure"). */
  private def parseMp4(b: Array[Byte]): Header = {
    // generic box walk over [from, until): invoke f at each box
    def walk(from: Long, until: Long)(f: (String, Long, Long) => Option[Header])
        : Option[Header] = {
      var i = from
      while (i + 8 <= until) {
        val size32 = be32(b, i.toInt)
        val tpe = new String(b, i.toInt + 4, 4, "US-ASCII")
        var payload = i + 8
        val end =
          if (size32 == 1L) { // 64-bit largesize
            if (i + 16 > until) return None
            val hi = be32(b, i.toInt + 8); val lo = be32(b, i.toInt + 12)
            payload = i + 16
            i + ((hi << 32) | lo)
          } else if (size32 == 0L) until // box runs to the enclosure end
          else i + size32
        if (end <= i || end > until) {
          // truncated payload of the LAST claimed box: tolerate for a
          // scan that only needs the header fields (mvhd often sits in
          // the first kilobytes of a multi-GB file); anything else
          // (no forward progress, overlap) terminates the walk
          if (end <= i) return None
          f(tpe, payload, math.min(end, until)) match {
            case some @ Some(_) => return some
            case None => return None
          }
        }
        f(tpe, payload, end) match {
          case some @ Some(_) => return some
          case None => ()
        }
        i = end
      }
      None
    }
    walk(0L, b.length.toLong) {
      case ("moov", from, until) =>
        walk(from, until) {
          case ("mvhd", p, pEnd) =>
            if (p + 4 > pEnd) None
            else {
              val version = u8(b, p.toInt)
              val (timescale, duration) = version match {
                case 0 if p + 20 <= pEnd =>
                  (be32(b, p.toInt + 12), be32(b, p.toInt + 16))
                case 1 if p + 32 <= pEnd =>
                  (be32(b, p.toInt + 20),
                    (be32(b, p.toInt + 24) << 32) | be32(b, p.toInt + 28))
                case _ => return Unknown
              }
              // crafted 64-bit durations must not overflow the *1000
              if (timescale <= 0 || timescale > Int.MaxValue ||
                  duration < 0 || duration > Long.MaxValue / 1000L) None
              else Some(Header("mp4", None, None, None, None,
                Some(timescale.toInt),
                Some(duration * 1000L / timescale)))
            }
          case _ => None
        }
      case _ => None
    }.getOrElse(Unknown)
  }

  // ---------------------------------------------------------- the operator

  /** Header-decode a media table of (doc_id: long, payload: binary):
    * one output row per input row with the parsed fields. Same
    * per-partition batch shape as [[Multimodal.extractFeatures]] —
    * parser state inits once per partition, rows stream through. */
  def decodeHeaders(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val h = parse(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), h.format, h.width.orNull, h.height.orNull,
          h.bitDepth.orNull, h.channels.orNull, h.sampleRate.orNull,
          h.durationMs.orNull)
      }
    }
    spark.createDataFrame(rdd, headerSchema)
  }

  // ------------------------------------------------------ payload builders

  /** Minimal VALID PNG header bytes (signature + IHDR; CRC arbitrary —
    * header parsers don't verify it). Used to synthesize closed-form
    * test/bench payloads; any external header reader agrees on the
    * fields. */
  def pngBytes(w: Int, h: Int, bitDepth: Int, colorType: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h).put(bitDepth.toByte).put(colorType.toByte)
    out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    out.putInt(0) // CRC placeholder
    out.array()
  }

  /** Minimal JPEG: SOI, APP0/JFIF stub, SOF0 frame header, EOI. */
  def jpegBytes(w: Int, h: Int, components: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sofLen = 8 + 3 * components
    val sof = java.nio.ByteBuffer.allocate(4 + sofLen - 2)
    sof.put(0xff.toByte).put(0xc0.toByte).putShort(sofLen.toShort)
    sof.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    sof.put(components.toByte)
    (1 to components).foreach { c =>
      sof.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof.array() ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Minimal MP4: `ftyp` (isom) + `moov` containing one `mvhd`.
    * `v1 = true` writes the version-1 (64-bit duration) movie
    * header. Any external ISO-BMFF reader agrees on the fields. */
  def mp4Bytes(timescale: Int, duration: Long,
      v1: Boolean = false): Array[Byte] = {
    val ftyp = java.nio.ByteBuffer.allocate(20)
    ftyp.putInt(20).put("ftyp".getBytes("US-ASCII"))
    ftyp.put("isom".getBytes("US-ASCII")).putInt(0x200)
    ftyp.put("isom".getBytes("US-ASCII"))
    val mvhdLen = if (v1) 8 + 4 + 28 + 80 else 8 + 4 + 16 + 80
    val mvhd = java.nio.ByteBuffer.allocate(mvhdLen)
    mvhd.putInt(mvhdLen).put("mvhd".getBytes("US-ASCII"))
    mvhd.putInt(if (v1) 0x01000000 else 0) // version + flags
    if (v1) {
      mvhd.putLong(0L).putLong(0L) // creation/modification (64-bit)
      mvhd.putInt(timescale).putLong(duration)
    } else {
      mvhd.putInt(0).putInt(0) // creation/modification
      mvhd.putInt(timescale).putInt(duration.toInt)
    }
    // rate/volume/reserved/matrix/predefined/next_track_ID (80 bytes)
    mvhd.put(new Array[Byte](80))
    val moov = java.nio.ByteBuffer.allocate(8 + mvhdLen)
    moov.putInt(8 + mvhdLen).put("moov".getBytes("US-ASCII"))
    moov.put(mvhd.array())
    ftyp.array() ++ moov.array()
  }

  /** Minimal WAV: RIFF/WAVE + fmt (PCM) + data chunk header; the data
    * body is omitted (header parsing trusts the declared size). */
  def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate.toLong * blockAlign
    val dataSize = nSamples * blockAlign
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataSize).toInt)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort).putShort(channels.toShort)
    out.putInt(sampleRate).putInt(byteRate.toInt)
    out.putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize.toInt)
    out.array()
  }
}
