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
    else ("bin", 0, 0)
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
        case None =>
          VideoMeta(r.id, "bin", 0, 0, 0, 0, 0L, r.payload.length.toLong)
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

  /** Wrap a string-keyed table as media rows (payload = UTF-8 bytes) —
    * the testdata stand-in for a real blob store read. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("id"),
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
