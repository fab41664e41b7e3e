package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Pixel-level image ops (round 12) — the step past
  * [[Multimodal.extractMeta]]'s header decode: REAL pixel grids
  * encoded into the two JDK-reachable containers (BMP 24bpp
  * uncompressed; PNG truecolor via `java.util.zip` — both
  * dependency-free like the header decoders), decoded back
  * byte-for-byte, and perceptually hashed (dHash / aHash, pure
  * integer downsample arithmetic) for near-duplicate detection — the
  * image twin of the text MinHash/SimHash passes (a training-data
  * pipeline dedups images by perceptual hash; reference scope:
  * the engine-side extension surface, no reference counterpart).
  *
  * Test contract (mm6/dd15): the GENERATOR derives every pixel from
  * `doc_id` by integer arithmetic, wraps them as genuine BMP/PNG
  * bytes, and the Spark side recovers the hashes by DECODING THE
  * BYTES; the DuckDB oracle replays the same arithmetic without ever
  * seeing the binary — a hash match certifies encoder, decoder
  * (inflate + un-filter included), gray conversion, block-average
  * downsample, and bit packing together.
  *
  * At 100 TB: decode+hash is per-row work at scan speed inside
  * `mapPartitions` (the legitimate binary boundary, same as
  * extractMeta); near-dup search is Hamming-banded LSH over the
  * 64-bit dHash (4 × 16-bit bands, the [[graft.expressions.SimHash64]]
  * banding shape) — candidates come from band-equality joins, never
  * an all-pairs product.
  */
object ImagePixels {

  /** One decoded-and-hashed image. `dh`/`ah` are the 64-bit dHash /
    * aHash split into 32-bit halves (kept inside the positive BIGINT
    * range so the DuckDB oracle can rebuild them without signed
    * overflow). */
  final case class ImageHash(doc_id: Long, format: String,
                             width: Int, height: Int,
                             dh_hi: Long, dh_lo: Long,
                             ah_hi: Long, ah_lo: Long)

  // ------------------------------------------------ deterministic corpus

  /** Image dims by pair (id/2, so planted twins share a canvas):
    * 12/15/18 wide × 8/12 tall — small enough for the oracle to
    * replay per-pixel in SQL, varied enough to exercise non-divisible
    * block-average boundaries. */
  def widthOf(id: Long): Int  = 12 + ((id / 2) % 3).toInt * 3
  def heightOf(id: Long): Int = 8 + ((id / 2) % 2).toInt * 4

  /** Pixel formula shared verbatim with the DuckDB oracle. Pairs
    * (2k, 2k+1) share a base pattern (seed = id/2) — the PLANTED
    * near-duplicates — with the odd twin perturbed on 2–3 diagonal
    * pixels (enough to flip a few dHash bits, few enough that ≥1 of
    * the 4 Hamming bands stays clean), so each planted pair is also
    * a CROSS-FORMAT pair (even ids encode BMP, odd ids PNG). */
  def rgbAt(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val seed = ((id / 2) % 97).toInt
    val nz = if (id % 2 == 1 && x == y && x % 4 == 1) 40 else 0
    // the quadratic terms give each seed a DISTINCT texture (seed <
    // 97 < 7·11·13, so the (seed%7, seed%11, seed%13) curvature
    // triple is injective by CRT) — a purely linear gradient would
    // make every image a near-dup of every other under the
    // brightness-invariant dHash
    ((seed * 31 + x * 7 + y * 13 + x * y * (seed % 11) + nz) % 256,
     (seed * 17 + x * 11 + y * 5 + x * x * (seed % 7) + nz) % 256,
     (seed * 23 + x * 3 + y * 19 + y * y * (seed % 13) + nz) % 256)
  }

  // ------------------------------------------------------------ encoders

  /** Real BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp BGR rows
    * stored bottom-up and padded to 4 bytes — the uncompressed layout
    * every BMP reader expects. */
  def bmpPixelBytes(id: Long): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val body = new Array[Byte](rowSize * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgbAt(id, x, y)
        val off = (h - 1 - y) * rowSize + x * 3 // bottom-up
        body(off) = b.toByte; body(off + 1) = g.toByte
        body(off + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    val bb = java.nio.ByteBuffer.allocate(54 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + body.length)
    bb.putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1).putShort(24)
    bb.putInt(0).putInt(body.length).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    bb.put(body).array()
  }

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  /** Real PNG: signature + IHDR (8-bit truecolor) + one IDAT holding
    * the zlib-deflated filter-0 scanlines + IEND, every CRC32
    * correct — `java.util.zip.Inflater` round-trips it like any PNG
    * decoder would. */
  def pngPixelBytes(id: Long): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id)
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + w * 3)
      raw(rowOff) = 0 // filter: None
      var x = 0
      while (x < w) {
        val (r, g, b) = rgbAt(id, x, y)
        raw(rowOff + 1 + x * 3) = r.toByte
        raw(rowOff + 2 + x * 3) = g.toByte
        raw(rowOff + 3 + x * 3) = b.toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](4096)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val idat = out.toByteArray
    val ihdrData = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte) // bit depth 8, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val bb = java.nio.ByteBuffer.allocate(
      8 + (12 + 13) + (12 + idat.length) + 12)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val t = tpe.getBytes("US-ASCII")
      bb.putInt(data.length).put(t).put(data).putInt(crc32(t, data))
      ()
    }
    chunk("IHDR", ihdrData)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    bb.array()
  }

  /** Container by parity: even BMP, odd PNG — every planted near-dup
    * pair crosses formats, certifying both codecs per pair. */
  def imagePayload(id: Long): Array[Byte] =
    if (id % 2 == 0) bmpPixelBytes(id) else pngPixelBytes(id)

  // ------------------------------------------------------------- decoder

  /** Decode a BMP or PNG payload to `(format, width, height, row-major
    * packed 0xRRGGBB)`. The PNG arm walks the chunk stream, inflates
    * the IDATs, and applies all five scanline filters (None/Sub/Up/
    * Average/Paeth) — a decoder for real PNGs, not just the ones the
    * generator writes. */
  def decodePixels(p: Array[Byte]): (String, Int, Int, Array[Int]) = {
    def u8(i: Int) = p(i) & 0xff
    if (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte)
      decodeBmp(p)
    else if (p.length >= 8 && u8(0) == 0x89 && p(1) == 'P'.toByte)
      decodePng(p)
    else throw new IllegalArgumentException(
      s"not a BMP or PNG payload (${p.length} bytes)")
  }

  private def decodeBmp(p: Array[Byte]): (String, Int, Int, Array[Int]) = {
    def u8(i: Int)   = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    val off = le32(10); val w = le32(18); val h = le32(22)
    require(le16(28) == 24, s"BMP bpp ${le16(28)} — only 24bpp supported")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = off + (h - 1 - y) * rowSize + x * 3 // stored bottom-up
        px(y * w + x) = (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
        x += 1
      }
      y += 1
    }
    ("bmp", w, h, px)
  }

  private def decodePng(p: Array[Byte]): (String, Int, Int, Array[Int]) = {
    def u8(i: Int)   = p(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    var i = 8
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream
    var done = false
    while (!done && i + 8 <= p.length) {
      val len = be32(i)
      val tpe = new String(p, i + 4, 4, "US-ASCII")
      tpe match {
        case "IHDR" =>
          w = be32(i + 8); h = be32(i + 12)
          require(u8(i + 16) == 8, s"PNG bit depth ${u8(i + 16)} — only 8")
          colorType = u8(i + 17)
          require(colorType == 2 || colorType == 6,
            s"PNG color type $colorType — only truecolor (±alpha)")
          require(u8(i + 20) == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunks skip
      }
      i += 12 + len
    }
    val bpp = if (colorType == 6) 4 else 3
    val raw = new Array[Byte](h * (1 + w * bpp))
    val inf = new java.util.zip.Inflater
    inf.setInput(idat.toByteArray)
    var got = 0
    while (!inf.finished() && got < raw.length) {
      val n = inf.inflate(raw, got, raw.length - got)
      // a truncated/corrupt IDAT stream makes inflate return 0 with
      // needsInput() true and finished() false forever — fail the row
      // instead of spinning the task
      require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
        s"PNG IDAT stream truncated or corrupt after $got of " +
          s"${raw.length} bytes")
      got += n
    }
    inf.end()
    require(got == raw.length,
      s"PNG inflate yielded $got of ${raw.length} bytes")
    // un-filter in place, row by row (spec §6: each byte's predictors
    // are the already-reconstructed left/up/up-left bytes)
    val stride = 1 + w * bpp
    var y = 0
    while (y < h) {
      val f = raw(y * stride) & 0xff
      var k = 0
      while (k < w * bpp) {
        val idx = y * stride + 1 + k
        val left = if (k >= bpp) raw(idx - bpp) & 0xff else 0
        val up = if (y > 0) raw(idx - stride) & 0xff else 0
        val ul = if (y > 0 && k >= bpp) raw(idx - stride - bpp) & 0xff else 0
        val add = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => // Paeth
            val pr = left + up - ul
            val pa = math.abs(pr - left); val pb = math.abs(pr - up)
            val pc = math.abs(pr - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          case other => throw new IllegalArgumentException(
            s"PNG filter $other")
        }
        raw(idx) = (((raw(idx) & 0xff) + add) & 0xff).toByte
        k += 1
      }
      y += 1
    }
    val px = new Array[Int](w * h)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = y * stride + 1 + x * bpp
        px(y * w + x) = ((raw(idx) & 0xff) << 16) |
          ((raw(idx + 1) & 0xff) << 8) | (raw(idx + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    ("png", w, h, px)
  }

  // ------------------------------------------------------------- hashing

  private def gray(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  /** Block-average downsample to a `gw`×`gh` grid: pixel (x,y) maps
    * to cell (x·gw/w, y·gh/h) — integer floor, the exact expression
    * the DuckDB oracle replays — and each cell averages (floor) the
    * grays that land in it. */
  private def cellAvgs(w: Int, h: Int, px: Array[Int],
                       gw: Int, gh: Int): Array[Long] = {
    require(w >= gw && h >= gh,
      s"image ${w}×$h is smaller than the $gw×$gh downsample grid — " +
        "every cell needs at least one pixel")
    val sum = new Array[Long](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = (y * gh / h) * gw + (x * gw / w)
        sum(c) += gray(px(y * w + x)); cnt(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => sum(i) / cnt(i))
  }

  private def pack(bits: Array[Int]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var b = 0
    while (b < 64) {
      if (bits(b) != 0) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    (hi, lo)
  }

  /** dHash: 9×8 block averages, bit (cy·8+cx) set when cell (cx,cy)
    * outshines its right neighbor — brightness-gradient signature,
    * robust to uniform exposure shifts. */
  def dHash(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    val a = cellAvgs(w, h, px, 9, 8)
    pack(Array.tabulate(64) { b =>
      val cx = b % 8; val cy = b / 8
      if (a(cy * 9 + cx) > a(cy * 9 + cx + 1)) 1 else 0
    })
  }

  /** aHash: 8×8 block averages thresholded on their own (floor)
    * mean. */
  def aHash(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    val a = cellAvgs(w, h, px, 8, 8)
    val mean = a.sum / 64L
    pack(Array.tabulate(64)(b => if (a(b) > mean) 1 else 0))
  }

  // ------------------------------------------------------- Spark plumbing

  /** The deterministic image corpus: one container per document id. */
  def imagesFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, imagePayload(id)))
  }

  /** Decode + hash, per partition at scan speed — the binary
    * boundary, same contract as [[Multimodal.extractMeta]]. */
  def hashImages(media: Dataset[Multimodal.MediaRow])
    : Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (fmt, w, h, px) = decodePixels(r.payload)
        val (dhi, dlo) = dHash(w, h, px)
        val (ahi, alo) = aHash(w, h, px)
        ImageHash(r.id, fmt, w, h, dhi, dlo, ahi, alo)
      }
    }
  }
}
