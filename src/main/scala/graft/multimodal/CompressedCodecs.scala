package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** COMPRESSED-codec content ops (round 13) — the step past round 12's
  * uncompressed decoders (BMP rows, PNG zlib, WAV PCM, AVI DIB): real
  * corpora are overwhelmingly compressed formats, and the two
  * dependency-free-decodable ones are GIF (LZW — GIF87a/89a appendix
  * algorithm) and FLAC (constant / verbatim / fixed-predictor
  * subframes with rice-coded residuals). Both codecs here are
  * implemented from the published specs in pure integer Scala:
  *
  *  - GIF: a full variable-width LZW encoder/decoder pair (clear/EOI
  *    codes, width growth at dictionary fill, 12-bit cap with
  *    clear-and-reset, LSB-first bit packing, 255-byte sub-blocks)
  *    under a 256-entry grayscale palette.
  *  - FLAC: frame header (sync, blocksize/rate codes, UTF-8 frame
  *    number, CRC-8) + one subframe (verbatim or fixed predictor
  *    order 1/2, rice partition order 0) + frame CRC-16 — the
  *    bit-exact layout of the FLAC format spec §9.
  *
  * Test contract (mm9/mm10): the generator derives every pixel/sample
  * from `doc_id` by the SAME arithmetic the round-12 corpora use
  * (images: [[ImagePixels.rgbAt]] grayscale; audio:
  * [[MediaContent.sampleAt]]); the Spark side recovers them by
  * DECODING THE COMPRESSED BYTES; the DuckDB oracle replays the
  * arithmetic blind. A hash match certifies LZW/rice encode → decode
  * round trips end to end — and because the CONTENT matches the
  * BMP/PNG/WAV corpora, a GIF re-encode of an image is an exact
  * cross-codec duplicate (Hamming 0) of its BMP/PNG twin, which is
  * precisely how a production pipeline catches format-shifted
  * re-uploads. Decode runs in `mapPartitions` at scan speed (the
  * [[Multimodal.extractMeta]] binary-boundary contract).
  */
object CompressedCodecs {

  // ================================================================ GIF

  /** Grayscale pixel index at (x, y): the luma of the shared image
    * texture — so palette entry i = (i,i,i) makes the decoded RGB's
    * gray EQUAL the index, and the GIF's dHash equals the BMP/PNG
    * twin's (cross-codec exact dup). */
  def gifIndexAt(id: Long, x: Int, y: Int): Int = {
    val (r, g, b) = ImagePixels.rgbAt(id, x, y)
    ((299L * r + 587L * g + 114L * b) / 1000L).toInt
  }

  /** Unsynchronized growable byte sink (ByteArrayOutputStream's
    * per-byte monitor cost is measurable at corpus scale). */
  private final class ByteSink(initial: Int = 256) {
    private var buf = new Array[Byte](initial)
    private var n = 0
    def add(b: Int): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
      buf(n) = b.toByte; n += 1
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  /** LSB-first bit writer (the GIF LZW bit order). */
  private final class BitWriterLsb {
    private val out = new ByteSink()
    private var acc = 0
    private var nbits = 0
    def write(v: Int, width: Int): Unit = {
      acc |= v << nbits
      nbits += width
      while (nbits >= 8) {
        out.add(acc & 0xff); acc >>>= 8; nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.add(acc & 0xff); acc = 0; nbits = 0 }
      out.toArray
    }
  }

  /** LSB-first bit reader over concatenated GIF data sub-blocks. */
  private final class BitReaderLsb(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        require(pos < data.length, "LZW stream exhausted mid-code")
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1; nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      v
    }
  }

  /** GIF variable-width LZW compression (the GIF89a appendix
    * algorithm): emit CLEAR, then codes growing 9→12 bits as the
    * dictionary fills; at 4096 entries emit CLEAR and reset. The
    * width-bump convention (grow AFTER emitting, once the next free
    * code no longer fits the current width) pairs with [[lzwDecode]]
    * and with every standard GIF reader. */
  def lzwEncode(indexes: Array[Int], minCodeSize: Int): Array[Byte] = {
    require(indexes.nonEmpty, "LZW: empty pixel stream")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new BitWriterLsb
    var codeSize = minCodeSize + 1
    var nextCode = eoi + 1
    val dict = new java.util.HashMap[Long, Integer]()
    def key(prefix: Int, c: Int): Long = (prefix.toLong << 8) | c
    bw.write(clear, codeSize)
    var prefix = indexes(0)
    var i = 1
    while (i < indexes.length) {
      val c = indexes(i)
      val hit = dict.get(key(prefix, c))
      if (hit != null) prefix = hit.intValue()
      else {
        bw.write(prefix, codeSize)
        if (nextCode > (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        if (nextCode < 4096) {
          dict.put(key(prefix, c), Integer.valueOf(nextCode))
          nextCode += 1
        } else { // dictionary full: clear and start over
          bw.write(clear, codeSize)
          dict.clear()
          codeSize = minCodeSize + 1
          nextCode = eoi + 1
        }
        prefix = c
      }
      i += 1
    }
    bw.write(prefix, codeSize)
    if (nextCode > (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
    bw.write(eoi, codeSize)
    bw.finish()
  }

  /** GIF variable-width LZW decompression (handles width growth,
    * clear-and-reset, and the code==next KwKwK case). */
  def lzwDecode(data: Array[Byte], minCodeSize: Int,
                expected: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val br = new BitReaderLsb(data)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](expected)
    var outN = 0
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var old = -1
    val stack = new Array[Int](4096) // shared across emits (hot path)
    def emit(code: Int): Int = { // returns the string's FIRST byte
      // walk the chain into the stack, then unwind
      var top = 0
      var c = code
      while (c >= clear) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      val first = c
      require(outN + top + 1 <= expected,
        s"LZW output overruns expected $expected pixels")
      out(outN) = c; outN += 1
      while (top > 0) { top -= 1; out(outN) = stack(top); outN += 1 }
      first
    }
    var done = false
    while (!done && outN < expected) {
      val code = br.read(codeSize)
      if (code == clear) {
        codeSize = minCodeSize + 1; next = eoi + 1; old = -1
      } else if (code == eoi) done = true
      else if (old == -1) {
        require(code < clear, s"LZW: first code $code is not a literal")
        out(outN) = code; outN += 1; old = code
      } else {
        require(code <= next, s"LZW: code $code beyond dictionary $next")
        val first =
          if (code < next) emit(code)
          else { // KwKwK: string(old) + first(string(old))
            var c = old
            while (c >= clear) c = prefix(c)
            val f = c
            // temporarily enter it so emit() can walk it
            prefix(next) = old; suffix(next) = f
            emit(code)
          }
        if (next < 4096) {
          prefix(next) = old; suffix(next) = first
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        old = code
      }
    }
    require(outN == expected,
      s"LZW decoded $outN of $expected expected pixels")
    out
  }

  /** Real GIF89a: signature + LSD (global 256-entry grayscale
    * palette) + image descriptor + LZW-compressed index stream in
    * 255-byte sub-blocks + trailer. */
  def gifPixelBytes(id: Long): Array[Byte] = {
    val w = ImagePixels.widthOf(id); val h = ImagePixels.heightOf(id)
    val idx = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { idx(y * w + x) = gifIndexAt(id, x, y); x += 1 }
      y += 1
    }
    val lzw = lzwEncode(idx, minCodeSize = 8)
    val nBlocks = (lzw.length + 254) / 255
    val bb = java.nio.ByteBuffer
      .allocate(13 + 768 + 10 + 1 + lzw.length + nBlocks + 1 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(0xF7.toByte) // GCT present, 8-bit color res, 256 entries
    bb.put(0.toByte).put(0.toByte) // bg index, aspect
    var i = 0
    while (i < 256) { // grayscale palette: entry i = (i, i, i)
      bb.put(i.toByte).put(i.toByte).put(i.toByte); i += 1
    }
    bb.put(0x2C.toByte) // image descriptor
    bb.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    bb.put(0.toByte) // no local table, not interlaced
    bb.put(8.toByte) // LZW minimum code size
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      bb.put(len.toByte).put(lzw, off, len)
      off += len
    }
    bb.put(0.toByte)    // block terminator
    bb.put(0x3B.toByte) // trailer
    bb.array()
  }

  /** Decode a GIF payload to `(width, height, row-major packed
    * 0xRRGGBB)` — walks extensions, reads the global/local palette,
    * LZW-decompresses the index stream. Interlace is refused loudly
    * (out of scope like PNG's). */
  def decodeGifPixels(p: Array[Byte]): (Int, Int, Array[Int]) = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    require(p.length > 13 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte, "not a GIF payload")
    val packed = u8(10)
    var i = 13
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) { // global color table
      val n = 2 << (packed & 7)
      palette = Array.tabulate(n)(j =>
        (u8(13 + j * 3) << 16) | (u8(13 + j * 3 + 1) << 8) | u8(13 + j * 3 + 2))
      i += n * 3
    }
    while (i < p.length && u8(i) == 0x21) { // extensions: label + blocks
      i += 2
      while (u8(i) != 0) i += 1 + u8(i)
      i += 1
    }
    require(i < p.length && u8(i) == 0x2C, s"no image descriptor at $i")
    val w = le16(i + 5); val h = le16(i + 7)
    val ipacked = u8(i + 9)
    require((ipacked & 0x40) == 0, "interlaced GIF not supported")
    i += 10
    if ((ipacked & 0x80) != 0) { // local color table overrides
      val n = 2 << (ipacked & 7)
      palette = Array.tabulate(n)(j =>
        (u8(i + j * 3) << 16) | (u8(i + j * 3 + 1) << 8) | u8(i + j * 3 + 2))
      i += n * 3
    }
    require(palette != null, "GIF carries no color table")
    val minCodeSize = u8(i); i += 1
    val data = new java.io.ByteArrayOutputStream
    while (u8(i) != 0) { // data sub-blocks
      val len = u8(i)
      data.write(p, i + 1, len)
      i += 1 + len
    }
    val idx = lzwDecode(data.toByteArray, minCodeSize, w * h)
    (w, h, idx.map { j =>
      require(j < palette.length, s"palette index $j out of range")
      palette(j)
    })
  }

  // ------------------------------------------------- animated GIF (r14)

  /** Animated GIF89a — the sampled-frame RE-ENCODE of the video
    * corpus (the "GIF preview" every video host generates): one full
    * frame per 2 fps sample slot of the AS-SHIPPED video (trims
    * included), each behind a Graphic Control Extension with a 50 cs
    * delay, sharing the global grayscale palette. Frame pixels carry
    * the video texture's LUMA (palette index = luma), so every GIF
    * frame dHash-equals its AVI/MP4 twin frame exactly — the
    * cross-CONTAINER sequence duplicate dd23 must catch. */
  def gifAnimBytes(id: Long): Array[Byte] = {
    val w = MediaContent.vWidthOf(id); val h = MediaContent.vHeightOf(id)
    val trim = MediaContent.vTrimOf(id)
    val sampled = MediaContent.sampledFrames(
      MediaContent.VUsPerFrame, MediaContent.vFramesOf(id))
      .distinct.sorted
    val out = new ByteSink(4096)
    def put(bs: Array[Byte]): Unit = bs.foreach(b => out.add(b & 0xff))
    def le16(v: Int): Unit = { out.add(v & 0xff); out.add((v >> 8) & 0xff) }
    put("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.add(0xF7); out.add(0); out.add(0) // GCT 256, bg, aspect
    var i = 0
    while (i < 256) { out.add(i); out.add(i); out.add(i); i += 1 }
    for (f <- sampled) {
      out.add(0x21); out.add(0xF9); out.add(4) // GCE
      out.add(0)                                // no disposal/transparency
      le16(50)                                  // delay 50 cs = 2 fps
      out.add(0); out.add(0)                    // transparent idx, term
      out.add(0x2C)                             // image descriptor
      le16(0); le16(0); le16(w); le16(h)
      out.add(0)                                // no LCT, not interlaced
      val idx = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = MediaContent.vRgbAt(id, f + trim, x, y)
          idx(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      val lzw = lzwEncode(idx, minCodeSize = 8)
      out.add(8)
      var off = 0
      while (off < lzw.length) {
        val len = math.min(255, lzw.length - off)
        out.add(len)
        var j = 0
        while (j < len) { out.add(lzw(off + j) & 0xff); j += 1 }
        off += len
      }
      out.add(0) // block terminator
    }
    out.add(0x3B)
    out.toArray
  }

  /** Decode ALL frames of a (possibly animated) GIF: `(width,
    * height, frames in stream order as packed 0xRRGGBB)`. Scope:
    * FULL-frame images only — partial-frame composition (disposal
    * methods, frame offsets) refuses loudly; interlace refuses like
    * the single-frame path. */
  def decodeGifFrames(p: Array[Byte]): (Int, Int, Seq[Array[Int]]) = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    require(p.length > 13 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte, "not a GIF payload")
    val w = le16(6); val h = le16(8)
    val packed = u8(10)
    var i = 13
    var global: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      global = Array.tabulate(n)(j =>
        (u8(13 + j * 3) << 16) | (u8(13 + j * 3 + 1) << 8) | u8(13 + j * 3 + 2))
      i += n * 3
    }
    val frames = Seq.newBuilder[Array[Int]]
    var done = false
    while (!done) {
      require(i < p.length, "GIF: missing trailer")
      u8(i) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x3B => done = true
        case 0x2C =>
          require(le16(i + 1) == 0 && le16(i + 3) == 0 &&
            le16(i + 5) == w && le16(i + 7) == h,
            "GIF: partial-frame composition not supported")
          val ipacked = u8(i + 9)
          require((ipacked & 0x40) == 0, "interlaced GIF not supported")
          i += 10
          var palette = global
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            palette = Array.tabulate(n)(j =>
              (u8(i + j * 3) << 16) | (u8(i + j * 3 + 1) << 8) |
                u8(i + j * 3 + 2))
            i += n * 3
          }
          require(palette != null, "GIF frame carries no color table")
          val minCodeSize = u8(i); i += 1
          val data = new java.io.ByteArrayOutputStream
          while (u8(i) != 0) {
            val len = u8(i)
            data.write(p, i + 1, len)
            i += 1 + len
          }
          i += 1
          val idx = lzwDecode(data.toByteArray, minCodeSize, w * h)
          frames += idx.map { j =>
            require(j < palette.length, s"palette index $j out of range")
            palette(j)
          }
        case b => throw new IllegalArgumentException(
          f"GIF: unexpected block 0x$b%02x at $i")
      }
    }
    (w, h, frames.result())
  }

  /** Decode + dHash every frame of animated GIFs, per partition at
    * scan speed — frame_idx is the STREAM ORDINAL (the shared clock
    * for cross-container alignment: both a sampled video and its GIF
    * re-encode number sample slots 0..n−1). */
  def hashGifFrames(media: org.apache.spark.sql.Dataset[Multimodal.MediaRow])
    : org.apache.spark.sql.Dataset[MediaContent.VideoFrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, frames) = decodeGifFrames(r.payload)
        frames.zipWithIndex.map { case (px, ord) =>
          val (hi, lo) = ImagePixels.dHash(w, h, px)
          MediaContent.VideoFrameHash(r.id, ord, w, h, hi, lo)
        }
      }
    }
  }

  // =============================================================== FLAC

  /** MSB-first bit writer (the FLAC bit order). */
  private final class BitWriterMsb {
    private val out = new ByteSink(4096)
    private var acc = 0L
    private var nbits = 0
    def write(v: Long, width: Int): Unit = {
      var left = width
      while (left > 0) {
        val take = math.min(left, 8 - nbits)
        val shift = left - take
        acc = (acc << take) | ((v >>> shift) & ((1L << take) - 1))
        nbits += take; left -= take
        if (nbits == 8) { out.add(acc.toInt & 0xff); acc = 0; nbits = 0 }
      }
    }
    def writeUnary(v: Int): Unit = { // FLAC unary: v zeros then a one
      var k = v
      while (k >= 32) { write(0, 32); k -= 32 }
      write(1, k + 1)
    }
    def padToByte(): Unit = if (nbits > 0) write(0, 8 - nbits)
    def bytes: Array[Byte] = {
      require(nbits == 0, "unaligned FLAC write")
      out.toArray
    }
  }

  /** MSB-first bit reader. */
  private final class BitReaderMsb(data: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0L
    private var nbits = 0
    def read(width: Int): Long = {
      while (nbits < width) {
        require(pos < data.length, "FLAC stream exhausted")
        acc = (acc << 8) | (data(pos) & 0xffL)
        pos += 1; nbits += 8
      }
      val v = (acc >>> (nbits - width)) & ((1L << width) - 1)
      nbits -= width
      v
    }
    def readUnary(): Int = {
      var n = 0
      while (read(1) == 0) n += 1
      n
    }
    def alignToByte(): Unit = { val r = nbits % 8; if (r != 0) read(r); () }
    def bytePos: Int = pos - nbits / 8
  }

  /** CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    * header checksum. */
  def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    * frame footer checksum. */
  def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** Fixed-predictor residuals of order 0–4 (spec §9.2.2). */
  private def fixedResidual(s: Array[Int], order: Int): Array[Int] =
    Array.tabulate(s.length - order) { j =>
      val i = j + order
      order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) +
          s(i - 4)
      }
    }

  private def zigzag(r: Int): Long = ((r.toLong << 1) ^ (r.toLong >> 63))
  private def unzigzag(u: Long): Int = (((u >>> 1) ^ -(u & 1)).toInt)

  /** The subframe type each id encodes with — round-robins verbatim /
    * fixed-1 / fixed-2 so one corpus exercises all three decode arms
    * (constant is decodable too but needs a constant signal the
    * waveform corpus deliberately isn't). */
  def subframeTypeOf(id: Long): String = (id % 3) match {
    case 0 => "verbatim"
    case 1 => "fixed1"
    case _ => "fixed2"
  }

  /** Real FLAC: "fLaC" + STREAMINFO + ONE frame carrying the whole
    * waveform as a single mono 16-bit subframe (verbatim or fixed
    * predictor by [[subframeTypeOf]], rice partition order 0),
    * CRC-8 and CRC-16 correct. */
  def flacAudioBytes(id: Long): Array[Byte] = {
    val n = MediaContent.aSamplesOf(id)
    val rate = MediaContent.aRateOf(id)
    val s = Array.tabulate(n)(t => MediaContent.sampleAt(id, t))
    // ---- STREAMINFO
    val head = java.nio.ByteBuffer.allocate(42)
    head.put("fLaC".getBytes("US-ASCII"))
    head.put(0x80.toByte) // last-metadata | STREAMINFO
    head.put(0.toByte).put(0.toByte).put(34.toByte)
    head.putShort(n.toShort).putShort(n.toShort) // min/max blocksize
    head.put(new Array[Byte](6)) // min/max framesize unknown
    val bps = 16
    head.put((rate >> 12).toByte)
    head.put(((rate >> 4) & 0xff).toByte)
    head.put((((rate & 0xf) << 4) | ((1 - 1) << 1) |
      ((bps - 1) >> 4)).toByte)
    head.put(((((bps - 1) & 0xf) << 4) | 0).toByte) // total samples 36 bits
    head.putInt(n)
    head.put(new Array[Byte](16)) // md5 unset
    // ---- frame
    val bw = new BitWriterMsb
    bw.write(0xFFF8L, 16) // sync + reserved + fixed-blocksize strategy
    bw.write(0x7, 4)      // blocksize: 16-bit (n-1) at end of header
    bw.write(0xD, 4)      // sample rate: 16-bit Hz at end of header
    bw.write(0x0, 4)      // channels: mono
    bw.write(0x4, 3)      // sample size: 16 bits
    bw.write(0, 1)        // reserved
    bw.write(0, 8)        // frame number 0 (UTF-8 single byte)
    bw.write((n - 1).toLong, 16)
    bw.write(rate.toLong, 16)
    val headerSoFar = bw.bytes
    bw.write(crc8(headerSoFar, 0, headerSoFar.length).toLong, 8)
    // ---- subframe
    subframeTypeOf(id) match {
      case "verbatim" =>
        bw.write(0x02, 8) // pad 0, type 000001, wasted 0
        s.foreach(v => bw.write(v.toLong & 0xffff, 16))
      case t =>
        val order = if (t == "fixed1") 1 else 2
        bw.write((0x08 + order) << 1, 8) // pad 0, type 001ooo, wasted 0
        var i = 0
        while (i < order) { bw.write(s(i).toLong & 0xffff, 16); i += 1 }
        val res = fixedResidual(s, order)
        bw.write(0, 2) // residual method: 4-bit rice
        bw.write(0, 4) // partition order 0
        var zsum = 0L
        var ri = 0
        while (ri < res.length) { zsum += zigzag(res(ri)); ri += 1 }
        val mean = zsum / math.max(res.length, 1)
        var k = 0
        while (k < 14 && (1L << (k + 1)) < mean + 1) k += 1
        bw.write(k.toLong, 4)
        res.foreach { r =>
          val u = zigzag(r)
          bw.writeUnary((u >>> k).toInt)
          if (k > 0) bw.write(u & ((1L << k) - 1), k)
        }
    }
    bw.padToByte()
    val frame = bw.bytes
    val out = java.nio.ByteBuffer.allocate(42 + frame.length + 2)
    out.put(head.array()).put(frame)
    out.putShort(crc16(frame, 0, frame.length).toShort)
    out.array()
  }

  /** Decode a FLAC payload back to `(sampleRate, subframeType,
    * samples)` — STREAMINFO walk, frame-header parse with CRC-8
    * verify, constant / verbatim / fixed-predictor subframe decode,
    * CRC-16 verify. */
  def decodeFlacSamples(p: Array[Byte]): (Int, String, Array[Int]) = {
    def u8(i: Int) = p(i) & 0xff
    require(p.length > 42 && p(0) == 'f'.toByte && p(1) == 'L'.toByte &&
      p(2) == 'a'.toByte && p(3) == 'C'.toByte, "not a FLAC payload")
    // metadata walk to the first frame
    var i = 4
    var last = false
    var bps = -1
    while (!last) {
      last = (u8(i) & 0x80) != 0
      val len = (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      if ((u8(i) & 0x7f) == 0) // STREAMINFO: bps-1 spans bytes 12-13
        bps = 1 + (((u8(i + 4 + 12) & 1) << 4) | (u8(i + 4 + 13) >> 4))
      i += 4 + len
    }
    require(bps == 16, s"FLAC bps $bps — only 16 supported")
    val frameStart = i
    val br = new BitReaderMsb(p, frameStart)
    require(br.read(14) == 0x3FFE, "bad FLAC frame sync")
    br.read(1) // reserved
    br.read(1) // blocking strategy
    val bsCode = br.read(4).toInt
    val srCode = br.read(4).toInt
    val chan = br.read(4).toInt
    require(chan == 0, s"FLAC channel assignment $chan — only mono")
    val ssCode = br.read(3).toInt
    require(ssCode == 4, s"FLAC sample-size code $ssCode — only 16-bit")
    br.read(1) // reserved
    // UTF-8 coded frame/sample number (we only need to skip it)
    val b0 = br.read(8).toInt
    var extra = 0
    var mask = 0x80
    while ((b0 & mask) != 0) { extra += 1; mask >>= 1 }
    if (extra > 0) { var j = 1; while (j < extra) { br.read(8); j += 1 } }
    val blockSize = bsCode match {
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.read(8).toInt + 1
      case 7 => br.read(16).toInt + 1
      case c if c >= 8 => 256 << (c - 8)
      case c => throw new IllegalArgumentException(s"blocksize code $c")
    }
    val sampleRate = srCode match {
      case 0xC => br.read(8).toInt * 1000
      case 0xD => br.read(16).toInt
      case 0xE => br.read(16).toInt * 10
      case 0x4 => 8000
      case 0x5 => 16000
      case 0x9 => 44100
      case c => throw new IllegalArgumentException(s"sample-rate code $c")
    }
    val headerEnd = br.bytePos
    require(br.read(8).toInt == crc8(p, frameStart, headerEnd),
      "FLAC frame-header CRC-8 mismatch")
    // subframe header
    require(br.read(1) == 0, "subframe padding bit set")
    val tpe = br.read(6).toInt
    require(br.read(1) == 0, "wasted bits unsupported")
    def s16(v: Long): Int = ((v.toInt) << 16) >> 16
    val (samples, tname) =
      if (tpe == 0) { // constant
        val v = s16(br.read(16))
        (Array.fill(blockSize)(v), "constant")
      } else if (tpe == 1) { // verbatim
        (Array.tabulate(blockSize)(_ => s16(br.read(16))), "verbatim")
      } else if ((tpe & 0x38) == 0x08) { // fixed, order in low 3 bits
        val order = tpe & 0x07
        require(order <= 4, s"fixed order $order")
        val s = new Array[Int](blockSize)
        var j = 0
        while (j < order) { s(j) = s16(br.read(16)); j += 1 }
        require(br.read(2) == 0, "only 4-bit rice residuals supported")
        val po = br.read(4).toInt
        require(po == 0, s"rice partition order $po — only 0")
        val k = br.read(4).toInt
        require(k < 15, "rice escape code unsupported")
        var idx = order
        while (idx < blockSize) {
          val q = br.readUnary()
          val u = (q.toLong << k) | (if (k > 0) br.read(k) else 0L)
          val r = unzigzag(u)
          s(idx) = order match {
            case 0 => r
            case 1 => r + s(idx - 1)
            case 2 => r + 2 * s(idx - 1) - s(idx - 2)
            case 3 => r + 3 * s(idx - 1) - 3 * s(idx - 2) + s(idx - 3)
            case _ => r + 4 * s(idx - 1) - 6 * s(idx - 2) +
              4 * s(idx - 3) - s(idx - 4)
          }
          idx += 1
        }
        (s, s"fixed$order")
      } else throw new IllegalArgumentException(s"subframe type $tpe")
    br.alignToByte()
    val frameEnd = br.bytePos
    val stored = ((p(frameEnd) & 0xff) << 8) | (p(frameEnd + 1) & 0xff)
    require(stored == crc16(p, frameStart, frameEnd),
      "FLAC frame CRC-16 mismatch")
    (sampleRate, tname, samples)
  }

  // ------------------------------------------------------ Spark plumbing

  final case class GifHash(doc_id: Long, format: String,
                           width: Int, height: Int,
                           dh_hi: Long, dh_lo: Long)

  final case class FlacFingerprint(doc_id: Long, subframe: String,
                                   sample_rate: Int, n_samples: Int,
                                   fp_hi: Long, fp_lo: Long)

  def gifsFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, gifPixelBytes(id)))
  }

  def flacsFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, flacAudioBytes(id)))
  }

  /** LZW decode + dHash per partition at scan speed. */
  def hashGifs(media: Dataset[Multimodal.MediaRow]): Dataset[GifHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decodeGifPixels(r.payload)
        val (hi, lo) = ImagePixels.dHash(w, h, px)
        GifHash(r.id, "gif", w, h, hi, lo)
      }
    }
  }

  /** Rice decode + energy fingerprint per partition at scan speed. */
  def fingerprintFlacs(media: Dataset[Multimodal.MediaRow])
    : Dataset[FlacFingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (rate, tname, samples) = decodeFlacSamples(r.payload)
        val (hi, lo) = MediaContent.fingerprint(samples)
        FlacFingerprint(r.id, tname, rate, samples.length, hi, lo)
      }
    }
  }
}
