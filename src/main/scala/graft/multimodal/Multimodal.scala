package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct.
  *
  * The heavy per-item work (decode, feature-extract, resize,
  * frame-sample) runs via `mapPartitions` over batches — the Scala
  * analogue of a vectorized pandas UDF: one decoder instantiation per
  * partition, streamed row iterators, no per-row JVM↔native churn.
  * Container-header decode ([[decodeHeader]]) is REAL, dependency-free
  * magic-byte parsing (PNG IHDR, BMP info header, WAV fmt chunk); only
  * pixel/sample decode would need a codec binding (absent in this
  * container) — swap in opencv/ffmpeg at deployment for
  * feature-extraction beyond the header.
  *
  * Scale notes: media blobs dominate row size — keep them OUT of
  * shuffle keys, repartition by id before decode so work units are
  * even, and project metadata-only columns for any relational step
  * (Catalyst prunes the binary column from scans that don't need it).
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class MediaMeta(id: Long, format: String, width: Int,
                             height: Int, n_bytes: Long, checksum: String)

  /** REAL header decode — dependency-free magic-byte parsing of the
    * three container formats the synthetic corpus carries. Returns
    * (format, width, height); for WAV the two dimensions are
    * (sample_rate, channels). Unknown/truncated payloads decode as
    * ("bin", 0, 0) — malformed media is data, not an exception.
    *   - PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    *     (PNG spec §11.2.2) → width/height big-endian at offsets 16/20.
    *   - BMP: "BM", BITMAPINFOHEADER width/height little-endian at
    *     18/22 (height may be negative = top-down; report magnitude).
    *   - WAV: RIFF/WAVE with "fmt " chunk → channels LE16 at 22,
    *     sample rate LE32 at 24 (canonical layout). */
  def decodeHeader(p: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int)   = p(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def ascii(i: Int, s: String) = s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (p.length >= 24 && u8(0) == 0x89 && ascii(1, "PNG") &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        ascii(12, "IHDR"))
      ("png", be32(16), be32(20))
    else if (p.length >= 26 && ascii(0, "BM"))
      ("bmp", le32(18), math.abs(le32(22)))
    else if (p.length >= 28 && ascii(0, "RIFF") && ascii(8, "WAVE") &&
             ascii(12, "fmt "))
      ("wav", le32(24), le16(22))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8)
      decodeJpegSof(p)
    else if (p.length >= 10 && ascii(0, "GIF8") &&
             (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      // GIF87a/89a Logical Screen Descriptor: width/height LE16 at 6/8
      ("gif", le16(6), le16(8))
    else if (p.length >= 30 && ascii(0, "RIFF") && ascii(8, "WEBP") &&
             ascii(12, "VP8X"))
      // WebP extended (VP8X) header: canvas width-1 / height-1 LE24
      // at chunk-payload offsets 4/7 (absolute 24/27) — the layout
      // every animated/alpha WebP carries (spec §Extended File Format)
      ("webp", 1 + (le16(24) | (u8(26) << 16)),
        1 + (le16(27) | (u8(29) << 16)))
    else if (p.length >= 14 && ascii(0, "ID3"))
      // MP3 = ID3v2 tag then the first MPEG audio frame header;
      // (sample_rate, channels) per the WAV convention
      decodeMp3(p)
    else if (p.length >= 42 && ascii(0, "fLaC") && (u8(4) & 0x7f) == 0)
      // FLAC STREAMINFO (spec requires it first): within the 34-byte
      // block at offset 8, sample rate is 20 bits at block offset 10
      // and channels-1 the next 3 bits — absolute bytes 18-20.
      // (sample_rate, channels), the WAV convention
      ("flac", (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4),
        ((u8(20) >> 1) & 0x7) + 1)
    else ("bin", 0, 0)
  }

  /** JPEG dimensions — the real-corpus image format (round-7 task):
    * walk the marker segments from SOI until a SOFn frame header
    * (C0–CF except the non-frame C4/C8/CC) and read height/width
    * big-endian from its payload (`precision(1) height(2) width(2)`,
    * ITU T.81 §B.2.2). The walk respects segment lengths, skips
    * standalone markers, and stops at SOS (entropy-coded data — no
    * frame header past it) or any malformed length; a JPEG with no
    * parseable SOF reports ("jpeg", 0, 0) — malformed media is data,
    * not an exception. */
  private def decodeJpegSof(p: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int)   = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    var i = 2
    while (i + 3 < p.length && u8(i) == 0xff) {
      val m = u8(i + 1)
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > p.length) return ("jpeg", 0, 0)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 9 <= p.length) return ("jpeg", be16(i + 7), be16(i + 5))
          return ("jpeg", 0, 0)
        }
        if (m == 0xda) return ("jpeg", 0, 0) // SOS before any SOF
        i += 2 + len
      }
    }
    ("jpeg", 0, 0)
  }

  /** MP3: skip the ID3v2 tag (syncsafe 28-bit size at bytes 6-9, ISO
    * layout every tagged MP3 carries), then parse the first MPEG
    * audio frame header — 11-bit sync, MPEG1/Layer III accepted,
    * sample rate from the version's index table, channels from the
    * mode bits (mono = 3). Unparseable → ("mp3", 0, 0): malformed
    * media is data, not an exception. */
  private def decodeMp3(p: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int) = p(i) & 0xff
    val tagSize = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
    val f = 10 + tagSize
    if (f + 4 > p.length || u8(f) != 0xff || (u8(f + 1) & 0xe0) != 0xe0)
      return ("mp3", 0, 0)
    val versionBits = (u8(f + 1) >> 3) & 0x3 // 3 = MPEG1, 2 = MPEG2
    val srIdx = (u8(f + 2) >> 2) & 0x3
    if (srIdx == 3) return ("mp3", 0, 0) // reserved
    val rates = versionBits match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case 0 => Array(11025, 12000, 8000)
      case _ => return ("mp3", 0, 0)
    }
    val channels = if (((u8(f + 3) >> 6) & 0x3) == 3) 1 else 2
    ("mp3", rates(srIdx), channels)
  }

  /** Decode/feature-extract over partitions (pandas-UDF-equivalent
    * batch shape): one iterator pass, constant memory. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts etc.)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (fmt, w, h) = decodeHeader(r.payload)
        val sum = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(r.id, fmt, w, h, r.payload.length.toLong, sum)
      }
    }
  }

  // ---- container synthesis (the testdata stand-in for a blob store:
  // real headers + the document text as body, so the decode path above
  // is exercised on genuine binary layouts) ----

  private def pngBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33 + body.length) // big-endian default
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putInt(0) // CRC not validated by header readers
    bb.put(body).array()
  }

  private def bmpBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + body.length)
    bb.putShort(0).putShort(0).putInt(54)          // reserved, pixel offset
    bb.putInt(40).putInt(w).putInt(h)              // BITMAPINFOHEADER
    bb.putShort(1).putShort(24)                    // planes, bpp
    bb.putInt(0).putInt(body.length).putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(body).array()
  }

  private def wavBytes(sampleRate: Int, channels: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
    bb.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16).putShort(1)                      // PCM
    bb.putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(body.length)
    bb.put(body).array()
  }

  /** Wrap (id, dims, body) as a real container of the format chosen by
    * `id % 3` — the deterministic corpus [[extractMeta]] decodes. */
  def synthesizePayload(id: Long, w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    (id % 3) match {
      case 0 => pngBytes(w, h, body)
      case 1 => bmpBytes(w, h, body)
      case _ => wavBytes(w, h, body)
    }

  /** Minimal REAL JPEG: SOI, JFIF APP0, a SOF0 frame header carrying
    * the dimensions (3 components, the baseline layout), body as
    * trailing bytes — 39 header bytes total. Every segment has a
    * correct big-endian length, so [[decodeJpegSof]]'s marker walk is
    * exercised on genuine JPEG structure. */
  private def jpegBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(39 + body.length) // big-endian
    bb.putShort(0xffd8.toShort)                              // SOI
    bb.putShort(0xffe0.toShort).putShort(16)                 // APP0 len 16
    bb.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    bb.put(1.toByte).put(1.toByte)                           // version 1.1
    bb.put(0.toByte).putShort(1).putShort(1)                 // units, density
    bb.put(0.toByte).put(0.toByte)                           // no thumbnail
    bb.putShort(0xffc0.toShort).putShort(17)                 // SOF0 len 8+3*3
    bb.put(8.toByte)                                         // precision
    bb.putShort(h.toShort).putShort(w.toShort)
    bb.put(3.toByte)                                         // components
    bb.put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    bb.put(body).array()
  }

  // ---- ISO BMFF (MP4) containers ----

  /** Minimal REAL MP4: `ftyp` (16) + `moov` { `mvhd` v0 (timescale,
    * duration) + `trak` { `tkhd` v0 (16.16 fixed width/height) } }
    * (216) + `mdat` header (8) + body — 240 header bytes, every box
    * size correct, so the box walk parses genuine BMFF structure. */
  private def mp4Bytes(w: Int, h: Int, timescale: Int, duration: Int,
                       body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(240 + body.length) // big-endian
    def fourcc(s: String) = bb.put(s.getBytes("US-ASCII"))
    bb.putInt(16); fourcc("ftyp"); fourcc("isom"); bb.putInt(0)
    bb.putInt(216); fourcc("moov")
    bb.putInt(108); fourcc("mvhd")
    bb.putInt(0)                           // version 0 + flags
    bb.putInt(0).putInt(0)                 // creation, modification
    bb.putInt(timescale).putInt(duration)
    bb.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    bb.put(new Array[Byte](10))            // reserved
    bb.putInt(0x00010000).putInt(0).putInt(0)      // identity matrix
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    bb.put(new Array[Byte](24))            // pre_defined[6]
    bb.putInt(2)                           // next_track_ID
    bb.putInt(100); fourcc("trak")
    bb.putInt(92); fourcc("tkhd")
    bb.putInt(0)                           // version 0 + flags
    bb.putInt(0).putInt(0)                 // creation, modification
    bb.putInt(1).putInt(0)                 // track id, reserved
    bb.putInt(duration)
    bb.put(new Array[Byte](8))             // reserved
    bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt, volume, rsvd
    bb.putInt(0x00010000).putInt(0).putInt(0)      // identity matrix
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    bb.putInt(w << 16).putInt(h << 16)     // 16.16 fixed dims
    bb.putInt(8 + body.length); fourcc("mdat")
    bb.put(body).array()
  }

  /** Parse an MP4 header: (width, height, duration_ms) from the
    * `moov/mvhd` clock (duration·1000/timescale, truncating integer
    * math an oracle can predict) and the first `trak/tkhd`'s 16.16
    * fixed dimensions; None when the payload is not ftyp/moov BMFF.
    * The walk is a real box traversal — sizes, not offsets — so boxes
    * in any order and with extra siblings parse correctly. */
  def decodeMp4Header(p: Array[Byte]): Option[(Int, Int, Long)] = {
    def u8(i: Int)   = p(i) & 0xff
    def be32(i: Int) = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)).toInt
    def ascii(i: Int, s: String) = i + s.length <= p.length &&
      s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 16 || !ascii(4, "ftyp")) return None
    // (start, end) of each box's CONTENT within [from, to)
    def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var i = from
      while (i + 8 <= to) {
        val size = be32(i)
        if (size < 8 || i + size > to) return out.result()
        out += ((new String(p.slice(i + 4, i + 8), "US-ASCII"), i + 8, i + size))
        i += size
      }
      out.result()
    }
    val top = boxes(0, p.length)
    top.collectFirst { case ("moov", s, e) =>
      val inner = boxes(s, e)
      val clock = inner.collectFirst { case ("mvhd", ms, me)
        if me - ms >= 20 && u8(ms) == 0 =>
        (be32(ms + 12), be32(ms + 16)) // timescale, duration (v0)
      }
      val dims = inner.collectFirst { case ("trak", ts, te) =>
        boxes(ts, te).collectFirst { case ("tkhd", ks, ke)
          if ke - ks >= 84 && u8(ks) == 0 =>
          (be32(ks + 76) >>> 16, be32(ks + 80) >>> 16) // 16.16 fixed (v0)
        }
      }.flatten
      for ((ts, dur) <- clock; (w, h) <- dims; if ts > 0)
        yield (w, h, dur.toLong * 1000 / ts)
    }.flatten
  }

  /** Spec hooks: synthesize with explicit params and parse back — the
    * encode→decode property surface for generators. */
  private[graft] def jpegRoundTrip(w: Int, h: Int,
                                   body: Array[Byte]): (String, Int, Int) =
    decodeHeader(jpegBytes(w, h, body))
  private[graft] def mp4RoundTrip(w: Int, h: Int, timescale: Int,
                                  duration: Int,
                                  body: Array[Byte]): Option[(Int, Int, Long)] =
    decodeMp4Header(mp4Bytes(w, h, timescale, duration, body))

  // ---- video containers (RIFF/AVI) ----

  final case class VideoMeta(id: Long, format: String, width: Int, height: Int,
                             us_per_frame: Int, total_frames: Int,
                             duration_ms: Long, n_bytes: Long)

  /** RIFF/AVI with the REQUIRED leading `avih` (AVIMAINHEADER) chunk:
    * `RIFF <size> AVI ` then `LIST <size> hdrl avih <cb=56>` puts
    * dwMicroSecPerFrame / dwTotalFrames / dwWidth / dwHeight at fixed
    * offsets 32 / 48 / 64 / 68 — the canonical layout every AVI
    * header reader assumes. 88 header bytes, then the body. */
  private def aviBytes(w: Int, h: Int, usPerFrame: Int, totalFrames: Int,
                       body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(88 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(80 + body.length)
    bb.put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(68)
    bb.put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(56)
    bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0) // rate, maxBps, pad, flags
    bb.putInt(totalFrames).putInt(0).putInt(1).putInt(0) // frames, initial, streams, bufSize
    bb.putInt(w).putInt(h)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    bb.put(body).array()
  }

  /** Parse an AVI main header: (width, height, usPerFrame, totalFrames),
    * or None when the payload is not a RIFF/AVI/hdrl/avih layout —
    * malformed media is data, not an exception. */
  def decodeAviHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u8(i: Int)   = p(i) & 0xff
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(i: Int, s: String) = s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (p.length >= 72 && ascii(0, "RIFF") && ascii(8, "AVI ") &&
        ascii(12, "LIST") && ascii(20, "hdrl") && ascii(24, "avih"))
      Some((le32(64), le32(68), le32(32), le32(48)))
    else None
  }

  /** Spec hook: synthesize an AVI with explicit params and parse it
    * back — the encode→decode property surface for generators. */
  private[graft] def aviRoundTrip(w: Int, h: Int, usPerFrame: Int,
                                  totalFrames: Int,
                                  body: Array[Byte]): Option[(Int, Int, Int, Int)] =
    decodeAviHeader(aviBytes(w, h, usPerFrame, totalFrames, body))

  /** Header decode over partitions, video form of [[extractMeta]]:
    * duration is derived from the PARSED rate and frame count with
    * integer math (µs·frames → ms, truncating) so an oracle can
    * predict it exactly. Non-AVI payloads yield ("bin", zeros). */
  def extractVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeAviHeader(r.payload) match {
        case Some((w, h, usf, tf)) =>
          VideoMeta(r.id, "avi", w, h, usf, tf,
            tf.toLong * usf / 1000, r.payload.length.toLong)
        case None => decodeMp4Header(r.payload) match {
          // MP4 carries a clock (mvhd), not a frame count — rate
          // fields stay 0; duration_ms comes from timescale math
          case Some((w, h, durMs)) =>
            VideoMeta(r.id, "mp4", w, h, 0, 0, durMs, r.payload.length.toLong)
          case None =>
            VideoMeta(r.id, "bin", 0, 0, 0, 0, 0L, r.payload.length.toLong)
        }
      }
    })
  }

  /** `documents` → real AVI containers: frame rate from {10, 24, 30}
    * fps by `doc_id % 3`, frame count `10 + doc_id % 240`, dimensions
    * as [[mediaFromDocuments]] — all arithmetic an oracle can predict,
    * while [[extractVideoMeta]] recovers them by PARSING the bytes. */
  def videoFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    fromDocuments(spark, docs).mapPartitions(_.map { r =>
      val fps = Array(10, 24, 30)((r.id % 3).toInt)
      val w = (64 + r.id * 7 % 1920).toInt
      val h = (64 + r.id * 13 % 1080).toInt
      MediaRow(r.id, aviBytes(w, h, 1000000 / fps, (10 + r.id % 240).toInt, r.payload))
    })(org.apache.spark.sql.Encoders.product[MediaRow])
  }

  /** `documents` → the REAL-corpus container pair (round-7 task):
    * even ids become JPEGs (SOI/APP0/SOF0, dims by the same formulas
    * as [[mediaFromDocuments]]), odd ids become MP4s (ftyp/moov/mdat,
    * timescale 1000 so duration units ARE milliseconds, duration
    * `(10 + id % 240) * 100` ms) — all arithmetic an oracle can
    * predict, recovered by PARSING the bytes. */
  def jpegMp4FromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    fromDocuments(spark, docs).mapPartitions(_.map { r =>
      val w = (64 + r.id * 7 % 1920).toInt
      val h = (64 + r.id * 13 % 1080).toInt
      val payload =
        if (r.id % 2 == 0) jpegBytes(w, h, r.payload)
        else mp4Bytes(w, h, timescale = 1000,
          duration = ((10 + r.id % 240) * 100).toInt, r.payload)
      MediaRow(r.id, payload)
    })(org.apache.spark.sql.Encoders.product[MediaRow])
  }

  /** GIF89a: signature + Logical Screen Descriptor (13 bytes),
    * dimensions little-endian — the web-corpus image sibling. */
  private def gifBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // packed, bg, aspect
    bb.put(body)
    bb.array()
  }

  /** FLAC: "fLaC" + STREAMINFO metadata block (34 bytes, spec-first):
    * the 20-bit sample rate / 3-bit channels-1 / 5-bit bps-1 / 36-bit
    * total-samples bitfield packed exactly as §9.1.2 lays it out. */
  private def flacBytes(sampleRate: Int, channels: Int, totalSamples: Long,
                        body: Array[Byte]): Array[Byte] = {
    require(sampleRate < (1 << 20) && channels >= 1 && channels <= 8)
    val bb = java.nio.ByteBuffer.allocate(42 + body.length)
    bb.put("fLaC".getBytes("US-ASCII"))
    bb.put(0x80.toByte) // last-metadata-block | type 0 = STREAMINFO
    bb.put(0.toByte).put(0.toByte).put(34.toByte) // block length BE24
    bb.putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
    bb.put(0.toByte).put(0.toByte).put(0.toByte)     // min framesize BE24
    bb.put(0.toByte).put(0.toByte).put(0.toByte)     // max framesize BE24
    val bps = 16
    bb.put((sampleRate >> 12).toByte)
    bb.put(((sampleRate >> 4) & 0xff).toByte)
    bb.put((((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bps - 1) >> 4)).toByte)
    bb.put(((((bps - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt).toByte)
    bb.putInt((totalSamples & 0xffffffffL).toInt)
    bb.put(new Array[Byte](16)) // md5 of the (absent) audio stream
    bb.put(body)
    bb.array()
  }

  /** `documents` → GIF (even ids) / FLAC (odd ids) containers — the
    * web-corpus image + lossless-audio pair next to mm3's JPEG/MP4;
    * dimensions/rates by oracle-predictable arithmetic, body = text. */
  def gifFlacFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    fromDocuments(spark, docs).mapPartitions(_.map { r =>
      val payload =
        if (r.id % 2 == 0)
          gifBytes((64 + r.id * 7 % 1920).toInt, (64 + r.id * 13 % 1080).toInt,
            r.payload)
        else {
          val sr = (8000 + r.id * 37 % 40000).toInt
          flacBytes(sr, channels = (1 + r.id % 8).toInt,
            totalSamples = sr.toLong * (1 + r.id % 30), r.payload)
        }
      MediaRow(r.id, payload)
    })(org.apache.spark.sql.Encoders.product[MediaRow])
  }

  /** WebP extended format: RIFF/WEBP + VP8X chunk (10-byte payload,
    * canvas dims LE24 minus-one) — 30 header bytes, the layout of
    * every animated/alpha WebP. */
  private def webpBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= (1 << 24) && h <= (1 << 24))
    val bb = java.nio.ByteBuffer.allocate(30 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(4 + 8 + 10 + body.length) // riff size: WEBP + VP8X chunk
    bb.put("WEBP".getBytes("US-ASCII"))
    bb.put("VP8X".getBytes("US-ASCII"))
    bb.putInt(10) // VP8X payload size
    bb.put(0.toByte)                                  // flags
    bb.put(0.toByte).put(0.toByte).put(0.toByte)      // reserved
    def le24(v: Int): Unit = {
      bb.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
        .put(((v >> 16) & 0xff).toByte); ()
    }
    le24(w - 1); le24(h - 1)
    bb.put(body)
    bb.array()
  }

  /** MP3: 10-byte empty ID3v2.3 tag + one MPEG1 Layer III frame
    * header (128 kbps, no padding) — 14 header bytes. `srIdx`
    * selects 44100/48000/32000; `mono` sets the channel mode. */
  private def mp3Bytes(srIdx: Int, mono: Boolean,
                       body: Array[Byte]): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2)
    val bb = java.nio.ByteBuffer.allocate(14 + body.length)
    bb.put("ID3".getBytes("US-ASCII"))
    bb.put(3.toByte).put(0.toByte) // v2.3.0
    bb.put(0.toByte)               // flags
    bb.putInt(0)                   // syncsafe size: empty tag
    bb.put(0xff.toByte).put(0xfb.toByte) // sync + MPEG1 Layer III
    bb.put((0x90 | (srIdx << 2)).toByte) // 128kbps + sample-rate index
    bb.put((if (mono) 0xc0 else 0x00).toByte)
    bb.put(body)
    bb.array()
  }

  /** `documents` → WebP (even ids) / MP3 (odd ids) containers — the
    * web image + lossy-audio pair completing the mm family;
    * dims/rates by oracle-predictable arithmetic, body = text. */
  def webpMp3FromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    fromDocuments(spark, docs).mapPartitions(_.map { r =>
      val payload =
        if (r.id % 2 == 0)
          webpBytes((64 + r.id * 7 % 1920).toInt,
            (64 + r.id * 13 % 1080).toInt, r.payload)
        else
          mp3Bytes((r.id % 3).toInt, mono = r.id % 2 == 1 && r.id % 4 == 1,
            r.payload)
      MediaRow(r.id, payload)
    })(org.apache.spark.sql.Encoders.product[MediaRow])
  }

  private[graft] def webpRoundTrip(w: Int, h: Int,
                                   body: Array[Byte]): (String, Int, Int) =
    decodeHeader(webpBytes(w, h, body))

  private[graft] def mp3RoundTrip(srIdx: Int, mono: Boolean,
                                  body: Array[Byte]): (String, Int, Int) =
    decodeHeader(mp3Bytes(srIdx, mono, body))

  private[graft] def gifRoundTrip(w: Int, h: Int,
                                  body: Array[Byte]): (String, Int, Int) =
    decodeHeader(gifBytes(w, h, body))

  private[graft] def flacRoundTrip(sampleRate: Int, channels: Int,
                                   body: Array[Byte]): (String, Int, Int) =
    decodeHeader(flacBytes(sampleRate, channels,
      totalSamples = sampleRate.toLong, body))

  /** Frame-sampling plan for video payloads: deterministic frame
    * indices at `fps` over `durationMs`, capped at `maxFrames` —
    * pure column expression, the decode of each sampled frame then
    * fans out through [[extractMeta]]. */
  def frameSampleIndices(durationMs: org.apache.spark.sql.Column, fps: Double,
                         maxFrames: Int): org.apache.spark.sql.Column = {
    val total = floor(durationMs / lit(1000.0 / fps)).cast(IntegerType)
    val n     = least(total, lit(maxFrames))
    when(n > 0, transform(sequence(lit(0), n - 1),
      i => (i * total / n).cast(IntegerType))).otherwise(array())
  }

  /** Package hooks for the content-level generators
    * ([[MediaContent]]): the container header layouts are defined
    * once, here. */
  private[multimodal] def synthesizeAvi(w: Int, h: Int, usPerFrame: Int,
      totalFrames: Int, body: Array[Byte]): Array[Byte] =
    aviBytes(w, h, usPerFrame, totalFrames, body)
  private[multimodal] def synthesizeWav(sampleRate: Int, channels: Int,
      body: Array[Byte]): Array[Byte] =
    wavBytes(sampleRate, channels, body)

  /** Wrap a string-keyed table as media rows (payload = UTF-8 bytes) —
    * the testdata stand-in for a real blob store read. */
  /** Spread a doc-id frame across the session BEFORE a heavy per-row
    * render/decode map: the id-only column scan of a small parquet is
    * a single input split, so without this every downstream codec leg
    * runs on ONE task (guide §2.5 input skew — repartition right
    * after the read). One tiny shuffle of ids, deterministic hash
    * partitioning; the codec work it unlocks is orders of magnitude
    * heavier per row. */
  private[graft] def spreadIds(spark: SparkSession,
                               docs: DataFrame): DataFrame =
    docs.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    spreadIds(spark, docs).select(col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  /** `documents` → real media containers: format by `doc_id % 3`, the
    * dimensions by arithmetic an oracle can predict, body = UTF-8
    * text. [[extractMeta]] then recovers (format, width, height) by
    * PARSING the bytes, so an oracle match proves the binary
    * encode→decode round trip, not a formula copied to both sides. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    fromDocuments(spark, docs).mapPartitions(_.map { r =>
      val w = (64 + r.id * 7 % 1920).toInt
      val h = (64 + r.id * 13 % 1080).toInt
      MediaRow(r.id, synthesizePayload(r.id, w, h, r.payload))
    })(org.apache.spark.sql.Encoders.product[MediaRow])
  }
}
