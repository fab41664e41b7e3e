package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Baseline JPEG (round 13) — the dominant real-corpus image format,
  * decoded dependency-free from the ITU T.81 spec: marker walk
  * (SOI/DQT/SOF0/DHT/SOS/EOI), canonical Huffman tables built from
  * the DHT BITS/HUFFVAL arrays, entropy-coded MCU stream with 0xFF00
  * byte-stuffing, DC prediction + EXTEND, AC run-length/EOB decode,
  * dequantize, dezigzag, IDCT, level shift, clamp. Grayscale
  * (1 component, 1×1 sampling) — the honest scope: no chroma
  * subsampling reconstruction, refused loudly.
  *
  * Test contract (mm11): JPEG is LOSSY, so the generator writes
  * images in the DC-EXACT subspace — every 8×8 block is flat (AC all
  * zero) with a DC level chosen so dequantize→IDCT→shift is integer-
  * exact (quant[DC]=8 cancels the IDCT's /8) — and derives each
  * block's luma from `doc_id` arithmetic the DuckDB oracle replays
  * blind. The decoder itself is general (AC coefficients and any DHT
  * decode through the same path — SimSpec exercises an AC block
  * against a reference IDCT); the oracle certifies the Huffman/DC/
  * dequant/IDCT pipeline on the exactly-representable subspace,
  * which is the strongest claim a SQL oracle can check on a lossy
  * codec. Decode runs per row at scan speed (the
  * [[Multimodal.extractMeta]] binary-boundary contract).
  */
object JpegCodec {

  // ----------------------------------------------- standard tables (T.81)

  /** Annex K.3.1: luminance DC — BITS (codes per length 1..16) and
    * HUFFVAL (categories in code order). */
  private val DcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2: luminance AC. */
  private val AcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Flat quantization table: every entry 8, so a flat block's
    * dequantized DC of 8·level cancels the IDCT's ÷8 exactly. */
  private val Quant = Array.fill(64)(8)

  /** Annex K.3.3.1: chrominance DC. */
  private val DcChromaBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.3.2: chrominance AC. */
  private val AcChromaBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Chroma quantization table: all 16s — exercises multi-table DQT
    * and per-component table selection (chroma exactness is not
    * required: its pixels are discarded). */
  private val QuantChroma = Array.fill(64)(16)

  /** T.81 §A.3.6 zig-zag order: zigzag(k) = natural index of the k-th
    * coefficient in transmission order. */
  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman codes from BITS/HUFFVAL (§C.2): returns
    * (code, length) per value, in HUFFVAL order. */
  private def canonicalCodes(bits: Array[Int])
    : Array[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var code = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) { out += ((code, len)); code += 1; i += 1 }
      code <<= 1
      len += 1
    }
    out.toArray
  }

  // ------------------------------------------------------------ generator

  /** Fixed canvas: 24×16 = 3×2 MCUs of flat 8×8 blocks. */
  val JW = 24
  val JH = 16

  /** Block (bx, by) luma of image `id` — SQL-replayable; pairs
    * (2k, 2k+1) share the texture with the odd twin's block (1, 1)
    * brightened by 12 (flips a couple of dHash bits: the planted
    * near-dup convention). Range [28, 227]: headroom so the plant
    * never clamps. */
  def jLumAt(id: Long, bx: Int, by: Int): Int = {
    val seed = ((id / 2) % 97).toInt
    val nz = if (id % 2 == 1 && bx == 1 && by == 1) 12 else 0
    (seed * 31 + bx * 47 + by * 59 + bx * by * (seed % 11)) % 200 + 28 + nz
  }

  private final class BitWriterJpeg {
    private val out = new java.io.ByteArrayOutputStream
    private var acc = 0
    private var n = 0
    def put(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Array[Byte] = { // pad with 1-bits (§F.1.2.3)
      while (n != 0) put(1, 1)
      out.toByteArray
    }
  }

  /** Real baseline JFIF: SOI, DQT, SOF0 (8-bit grayscale 1×1), DHT
    * (Annex K luminance DC+AC), SOS, Huffman-coded flat MCUs (DC
    * difference coding + EOB each), EOI. */
  def jpegGrayBytes(id: Long): Array[Byte] = {
    val dcCodes = canonicalCodes(DcBits) // index = category
    val acCodes = canonicalCodes(AcBits)
    val eobIdx = AcVals.indexOf(0x00)
    val bw = new BitWriterJpeg
    var pred = 0
    var by = 0
    while (by < JH / 8) {
      var bx = 0
      while (bx < JW / 8) {
        val level = jLumAt(id, bx, by) - 128 // DC after level shift
        val diff = level - pred
        pred = level
        // category + amplitude (§F.1.2.1.1: negatives code as
        // diff + 2^size - 1 on `size` bits)
        var size = 0
        var a = math.abs(diff)
        while (a != 0) { size += 1; a >>= 1 }
        val (c, l) = dcCodes(size)
        bw.put(c, l)
        if (size > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << size) - 1, size)
        val (ec, el) = acCodes(eobIdx) // all AC zero
        bw.put(ec, el)
        bx += 1
      }
      by += 1
    }
    val scan = bw.flush()
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00.toByte) ++
      Array.fill(64)(Quant(0).toByte)) // DQT id 0, all 8s
    seg(0xc0, Array[Byte](8, // SOF0: precision
      (JH >> 8).toByte, (JH & 0xff).toByte,
      (JW >> 8).toByte, (JW & 0xff).toByte,
      1, // components
      1, 0x11, 0)) // id 1, sampling 1x1, quant table 0
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++
      DcVals.map(_.toByte)) // DHT: DC table 0
    seg(0xc4, Array(0x10.toByte) ++ AcBits.map(_.toByte) ++
      AcVals.map(_.toByte)) // DHT: AC table 0
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
    out.write(scan, 0, scan.length)
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------- color generator

  /** Color canvas: 32×16 luma = a 4×2 grid of 8×8 blocks — two
    * 16×16 MCUs under 4:2:0, eight 8×8 MCUs under 4:4:4. */
  val JWC = 32
  val JHC = 16

  /** Luma of color image `id` at block (bx, by) — SQL-replayable,
    * range [28, 227]. */
  def jColorLumAt(id: Long, bx: Int, by: Int): Int = {
    val seed = (id % 97).toInt
    (seed * 31 + bx * 47 + by * 59 + bx * by * (seed % 11)) % 200 + 28
  }

  /** Real 3-component baseline JFIF — 4:2:0 for even ids, 4:4:4 for
    * odd ids: multi-table DQT (luma 8s, chroma 16s), four DHT tables
    * (Annex K luma + CHROMA pairs), interleaved MCU scan with
    * per-component DC prediction. Luma blocks stay flat in the
    * DC-exact subspace (the mm11 contract — oracle-replayable);
    * chroma blocks are flat EXCEPT every 3rd id, whose chroma
    * carries one AC coefficient — so the oracle-gated corpus itself
    * exercises the decoder's decode-and-discard bitstream sync
    * through the chroma AC path. */
  def jpegColorBytes(id: Long): Array[Byte] = {
    val is420 = id % 2 == 0
    val hv = if (is420) 2 else 1
    val dcL = canonicalCodes(DcBits); val acL = canonicalCodes(AcBits)
    val dcC = canonicalCodes(DcChromaBits)
    val acC = canonicalCodes(AcChromaBits)
    val bw = new BitWriterJpeg
    def sizeOf(v: Int): Int = {
      var s = 0; var a = math.abs(v)
      while (a != 0) { s += 1; a >>= 1 }
      s
    }
    def amp(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
    def putDc(codes: Array[(Int, Int)], diff: Int): Unit = {
      val s = sizeOf(diff)
      val (c, l) = codes(s)
      bw.put(c, l)
      if (s > 0) bw.put(amp(diff, s), s)
    }
    def putAc(rs: Int, ampV: Int): Unit = {
      val (c, l) = acC(AcChromaVals.indexOf(rs))
      bw.put(c, l)
      val s = rs & 0xf
      if (s > 0) bw.put(amp(ampV, s), s)
    }
    val eobL = AcVals.indexOf(0x00)
    // chroma coded DC levels (decoded pixels are discarded; values
    // only need DC-category range)
    val cbCoded = ((id % 50) - 20).toInt
    val crCoded = ((id % 60) - 30).toInt
    val acChroma = if (id % 3 == 0) ((id % 15) + 1).toInt else 0
    var predY = 0; var predCb = 0; var predCr = 0
    val mcuW = JWC / (8 * hv); val mcuH = JHC / (8 * hv)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var vb = 0
        while (vb < hv) {
          var hb = 0
          while (hb < hv) {
            val level = jColorLumAt(id, mx * hv + hb, my * hv + vb) - 128
            putDc(dcL, level - predY)
            predY = level
            val (ec, el) = acL(eobL)
            bw.put(ec, el) // flat luma: EOB straight after DC
            hb += 1
          }
          vb += 1
        }
        for ((coded, isCb) <- Seq((cbCoded, true), (crCoded, false))) {
          putDc(dcC, coded - (if (isCb) predCb else predCr))
          if (isCb) predCb = coded else predCr = coded
          if (acChroma != 0) putAc(sizeOf(acChroma), acChroma) // run 0
          putAc(0x00, 0) // EOB
        }
        mx += 1
      }
      my += 1
    }
    val scan = bw.flush()
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00.toByte) ++ Quant.map(_.toByte) ++ // both tables,
      Array(0x01.toByte) ++ QuantChroma.map(_.toByte))     // ONE segment
    seg(0xc0, Array[Byte](8,
      (JHC >> 8).toByte, (JHC & 0xff).toByte,
      (JWC >> 8).toByte, (JWC & 0xff).toByte,
      3, // components: Y (max sampling, quant 0), Cb, Cr (1x1, quant 1)
      1, ((hv << 4) | hv).toByte, 0,
      2, 0x11, 1,
      3, 0x11, 1))
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++
      DcVals.map(_.toByte) ++
      Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte))
    seg(0xc4, Array(0x01.toByte) ++ DcChromaBits.map(_.toByte) ++
      DcChromaVals.map(_.toByte) ++
      Array(0x11.toByte) ++ AcChromaBits.map(_.toByte) ++
      AcChromaVals.map(_.toByte))
    seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    out.write(scan, 0, scan.length)
    marker(0xd9)
    out.toByteArray
  }

  /** Real PROGRESSIVE (SOF2) JFIF — 4:2:0 for even ids, 4:4:4 for
    * odd, same canvas and block lumas as [[jpegColorBytes]]: scan 1
    * is the interleaved DC scan (Ss=Se=0, Ah=Al=0 — DC complete in
    * one scan), then one all-zero AC scan per component (Ss=1,
    * Se=63; every block an EOB0 symbol) completing a spec-valid
    * stream. The decoder reads exactly the DC scan; sharing
    * [[jColorLumAt]] with the baseline generator means a progressive
    * file and its baseline twin must hash IDENTICALLY — the
    * strongest cross-coding-path certification the dHash can make
    * (SimSpec pins it; the mm16 oracle replays the lumas blind). */
  def jpegProgressiveBytes(id: Long): Array[Byte] = {
    val is420 = id % 2 == 0
    val hv = if (is420) 2 else 1
    val dcL = canonicalCodes(DcBits); val dcC = canonicalCodes(DcChromaBits)
    val acL = canonicalCodes(AcBits); val acC = canonicalCodes(AcChromaBits)
    def sizeOf(v: Int): Int = {
      var s = 0; var a = math.abs(v)
      while (a != 0) { s += 1; a >>= 1 }
      s
    }
    def amp(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
    // ---- scan 1: interleaved DC (the only scan the decoder reads)
    val bw = new BitWriterJpeg
    def putDc(codes: Array[(Int, Int)], diff: Int): Unit = {
      val s = sizeOf(diff)
      val (c, l) = codes(s)
      bw.put(c, l)
      if (s > 0) bw.put(amp(diff, s), s)
    }
    val cbCoded = ((id % 50) - 20).toInt
    val crCoded = ((id % 60) - 30).toInt
    var predY = 0; var predCb = 0; var predCr = 0
    val mcuW = JWC / (8 * hv); val mcuH = JHC / (8 * hv)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var vb = 0
        while (vb < hv) {
          var hb = 0
          while (hb < hv) {
            val level = jColorLumAt(id, mx * hv + hb, my * hv + vb) - 128
            putDc(dcL, level - predY)
            predY = level
            hb += 1
          }
          vb += 1
        }
        putDc(dcC, cbCoded - predCb); predCb = cbCoded
        putDc(dcC, crCoded - predCr); predCr = crCoded
        mx += 1
      }
      my += 1
    }
    val dcScan = bw.flush()
    // ---- AC scans: all coefficients zero → one EOB0 per block
    def acScan(codes: Array[(Int, Int)], vals: Array[Int],
               blocks: Int): Array[Byte] = {
      val w = new BitWriterJpeg
      val (c, l) = codes(vals.indexOf(0x00))
      var b = 0
      while (b < blocks) { w.put(c, l); b += 1 }
      w.flush()
    }
    val lumaBlocks = (JWC / 8) * (JHC / 8)
    val chromaBlocks = // non-interleaved: ceil(compW/8) * ceil(compH/8)
      ((JWC / hv + 7) / 8) * ((JHC / hv + 7) / 8)
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00.toByte) ++ Quant.map(_.toByte) ++
      Array(0x01.toByte) ++ QuantChroma.map(_.toByte))
    seg(0xc2, Array[Byte](8, // SOF2: same frame header shape as SOF0
      (JHC >> 8).toByte, (JHC & 0xff).toByte,
      (JWC >> 8).toByte, (JWC & 0xff).toByte,
      3,
      1, ((hv << 4) | hv).toByte, 0,
      2, 0x11, 1,
      3, 0x11, 1))
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++
      DcVals.map(_.toByte) ++
      Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte))
    seg(0xc4, Array(0x01.toByte) ++ DcChromaBits.map(_.toByte) ++
      DcChromaVals.map(_.toByte) ++
      Array(0x11.toByte) ++ AcChromaBits.map(_.toByte) ++
      AcChromaVals.map(_.toByte))
    // DC scan: Ns=3, Ss=0, Se=0, AhAl=0
    seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0))
    out.write(dcScan, 0, dcScan.length)
    // AC scans: Ns=1 per component, Ss=1, Se=63, AhAl=0
    seg(0xda, Array[Byte](1, 1, 0x00, 1, 63, 0))
    val la = acScan(acL, AcVals, lumaBlocks)
    out.write(la, 0, la.length)
    for (comp <- Seq(2, 3)) {
      seg(0xda, Array[Byte](1, comp.toByte, 0x11, 1, 63, 0))
      val ca = acScan(acC, AcChromaVals, chromaBlocks)
      out.write(ca, 0, ca.length)
    }
    marker(0xd9)
    out.toByteArray
  }

  /** Test hook: a single-block 8×8 grayscale JPEG from arbitrary
    * QUANTIZED coefficients in zigzag order — drives the decoder's
    * general AC run-length/ZRL/EOB + dezigzag + IDCT path, which the
    * (exactly-representable) generator corpus deliberately does not
    * exercise. */
  private[graft] def encodeTestBlock(coefZig: Array[Int]): Array[Byte] = {
    require(coefZig.length == 64)
    val dcCodes = canonicalCodes(DcBits)
    val acCodes = canonicalCodes(AcBits)
    def acIdx(rs: Int) = AcVals.indexOf(rs)
    val bw = new BitWriterJpeg
    def sizeOf(v: Int): Int = {
      var s = 0; var a = math.abs(v)
      while (a != 0) { s += 1; a >>= 1 }
      s
    }
    def amp(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
    val s0 = sizeOf(coefZig(0))
    val (c0, l0) = dcCodes(s0)
    bw.put(c0, l0)
    if (s0 > 0) bw.put(amp(coefZig(0), s0), s0)
    var k = 1
    var run = 0
    var lastNz = 63
    while (lastNz > 0 && coefZig(lastNz) == 0) lastNz -= 1
    while (k <= lastNz) {
      if (coefZig(k) == 0) { run += 1; k += 1 }
      else {
        while (run >= 16) { // ZRL
          val (zc, zl) = acCodes(acIdx(0xf0)); bw.put(zc, zl); run -= 16
        }
        val s = sizeOf(coefZig(k))
        val (ac, al) = acCodes(acIdx((run << 4) | s))
        bw.put(ac, al)
        bw.put(amp(coefZig(k), s), s)
        run = 0; k += 1
      }
    }
    if (lastNz < 63) { val (ec, el) = acCodes(acIdx(0x00)); bw.put(ec, el) }
    val scan = bw.flush()
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00.toByte) ++ Array.fill(64)(Quant(0).toByte))
    seg(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++
      DcVals.map(_.toByte))
    seg(0xc4, Array(0x10.toByte) ++ AcBits.map(_.toByte) ++
      AcVals.map(_.toByte))
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    out.write(scan, 0, scan.length)
    marker(0xd9)
    out.toByteArray
  }

  // -------------------------------------------------------------- decoder

  /** Canonical-code lookup built from a DHT segment's BITS/HUFFVAL:
    * decode by walking code lengths (§F.2.2.3 DECODE). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode per length, valptr per length (T.81 F.15)
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReaderJpeg): Int = {
      var code = br.bit()
      var l = 1
      while (l < 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      require(maxCode(l) >= 0 && code <= maxCode(l),
        s"JPEG: invalid Huffman code at length $l")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private final class BitReaderJpeg(p: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < p.length, "JPEG: scan exhausted")
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < p.length, "JPEG: scan ends in a dangling 0xff")
          val m = p(pos) & 0xff
          require(m == 0x00, f"JPEG: marker 0xff$m%02x inside scan")
          pos += 1 // stuffed zero
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** §F.2.2.1 EXTEND: map `v` of `size` bits to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private lazy val idctCos: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Naive exact-definition IDCT (§A.3.3) in double precision with
    * final round — 64 multiplies per output pixel, fine for a
    * reference decoder (a flat block short-circuits to its DC). */
  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var flat = true
    var k = 1
    while (k < 64 && flat) { if (coef(k) != 0) flat = false; k += 1 }
    if (flat) { // DC-only: every sample = DC/8 exactly
      val v = math.round(coef(0) / 8.0).toInt
      java.util.Arrays.fill(out, v)
      return out
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            s += cu * cv * coef(v * 8 + u) *
              idctCos(x * 8 + u) * idctCos(y * 8 + v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = math.round(s / 4.0).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-component spec: SOF0 sampling/quant + SOS huffman ids. */
  private final class Comp(val h: Int, val v: Int, val tq: Int) {
    var td = 0; var ta = 0
  }

  /** Decode the LUMA plane of a baseline (SOF0) or progressive
    * (SOF2, round 15) JPEG — grayscale (1 component) or YCbCr color
    * (3 components; luma carries the max sampling factor, chroma
    * 1×1 — covers 4:4:4, 4:2:2, 4:4:0 and the dominant real-corpus
    * 4:2:0). Chroma blocks are entropy-decoded to keep the
    * interleaved MCU bitstream in sync and their pixels DISCARDED:
    * the dHash needs only luma, so chroma IDCT + upsampling would be
    * pure waste at corpus scale.
    *
    * PROGRESSIVE scope: the FIRST scan must be the interleaved DC
    * scan (Ss = Se = 0, Ah = 0 — §G.1.1.1.1 requires DC first), whose
    * coefficients decode exactly like baseline DC shifted by the
    * point transform `Al`; every later scan (AC bands, refinements)
    * is SKIPPED — the 8×8 block average the dHash folds is carried
    * entirely by the DC band, so the first scan IS the hash-complete
    * prefix (the mm11 DC-exact argument, applied to scan order: this
    * is why progressive exists — renderers draw from the same
    * prefix). With Al > 0 the pixels are as-of-first-scan (low DC
    * bits not yet refined); an AC-first or refinement-first stream
    * refuses loudly.
    *
    * Returns `(width, height, row-major luma, sampling label)` —
    * label prefixed `p` for progressive frames (`p420`, `p444`).
    * Refused loudly (round-14 hardening): every other frame type
    * (0xc1–0xcf incl. JPG/DAC), standalone markers (TEM/RSTn) before
    * SOS, restart intervals (DRI), zero frame dimensions, missing
    * tables. */
  def decodeJpegLumaInfo(p: Array[Byte]): (Int, Int, Array[Int], String) = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    require(p.length > 4 && u8(0) == 0xff && u8(1) == 0xd8, "not a JPEG")
    var i = 2
    var w = 0; var h = 0
    val quant = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var scanStart = -1
    var progressive = false
    var al = 0
    while (scanStart < 0) {
      require(i + 2 <= p.length && u8(i) == 0xff, s"bad marker at $i")
      val m = u8(i + 1)
      // standalone markers carry NO length field — parsing one as a
      // segment would misread its neighbors as a length
      require(m != 0x01 && !(m >= 0xd0 && m <= 0xd7),
        f"JPEG: standalone marker 0xff$m%02x before SOS")
      require(i + 4 <= p.length, s"JPEG: truncated segment at $i")
      val len = u16(i + 2)
      m match {
        case 0xdb => // DQT: possibly several tables per segment
          var off = i + 4
          while (off < i + 2 + len) {
            require(u8(off) >> 4 == 0, "JPEG: only 8-bit quant tables")
            val tq = u8(off) & 0xf
            require(tq < 4, s"JPEG: quant table id $tq")
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) { q(Zigzag(k)) = u8(off + 1 + k); k += 1 }
            quant(tq) = q
            off += 65
          }
        case 0xc0 | 0xc2 => // baseline / progressive: same frame header
          progressive = m == 0xc2
          require(u8(i + 4) == 8, "JPEG: only 8-bit precision")
          h = u16(i + 5); w = u16(i + 7)
          require(w > 0 && h > 0, "JPEG: zero frame dimensions")
          val n = u8(i + 9)
          require(n == 1 || n == 3,
            s"JPEG: $n components (grayscale or YCbCr only)")
          comps = Array.tabulate(n) { c =>
            val hv = u8(i + 11 + 3 * c)
            new Comp(hv >> 4, hv & 0xf, u8(i + 12 + 3 * c))
          }
          val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
          require(comps(0).h == hMax && comps(0).v == vMax,
            "JPEG: luma must carry the max sampling factor")
          require(hMax >= 1 && hMax <= 2 && vMax >= 1 && vMax <= 2,
            "JPEG: sampling factors must be 1 or 2")
          require(comps.drop(1).forall(c => c.h == 1 && c.v == 1),
            "JPEG: chroma must sample 1x1")
        case sof if sof >= 0xc1 && sof <= 0xcf && sof != 0xc4 =>
          // lossless/hierarchical/arithmetic frames and
          // JPG(0xc8)/DAC(0xcc): refuse EVERY one explicitly — the
          // old APPn fall-through let 0xc5–0xcf garbage-decode
          throw new IllegalArgumentException(
            f"JPEG: only SOF0/SOF2 supported (marker 0xff$sof%02x)")
        case 0xc4 => // DHT: possibly several tables per segment
          var off = i + 4
          while (off < i + 2 + len) {
            val tc = u8(off) >> 4; val th = u8(off) & 0xf
            require(th < 4, s"JPEG: huffman table id $th")
            val bits = Array.tabulate(16)(j => u8(off + 1 + j))
            val n = bits.sum
            val vals = Array.tabulate(n)(j => u8(off + 17 + j))
            if (tc == 0) dcT(th) = new HuffTable(bits, vals)
            else acT(th) = new HuffTable(bits, vals)
            off += 17 + n
          }
        case 0xdd => throw new IllegalArgumentException(
          "JPEG: restart intervals (DRI) unsupported")
        case 0xda =>
          require(comps != null, "JPEG: SOS before SOF0/SOF2")
          val ns = u8(i + 4)
          require(ns == comps.length,
            if (progressive) "JPEG: progressive first scan must be the " +
              "interleaved DC scan (all components)"
            else "JPEG: partial scans unsupported")
          var c = 0
          while (c < ns) {
            val tt = u8(i + 6 + 2 * c)
            comps(c).td = tt >> 4; comps(c).ta = tt & 0xf
            c += 1
          }
          if (progressive) {
            val ss = u8(i + 5 + 2 * ns); val se = u8(i + 6 + 2 * ns)
            val ahal = u8(i + 7 + 2 * ns)
            require(ss == 0 && se == 0,
              s"JPEG: progressive first scan must be the DC band " +
                s"(Ss=$ss, Se=$se)")
            require(ahal >> 4 == 0,
              "JPEG: progressive first scan cannot be a refinement (Ah != 0)")
            al = ahal & 0xf
          }
          scanStart = i + 2 + len
        case 0xd9 => throw new IllegalArgumentException("JPEG: EOI before SOS")
        case _ => () // APPn/COM skip
      }
      if (scanStart < 0) i += 2 + len
    }
    require(w > 0 && h > 0, "JPEG: missing SOF0/SOF2 before SOS")
    comps.foreach { c =>
      require(quant(c.tq) != null, s"JPEG: missing quant table ${c.tq}")
      // a progressive DC scan never touches an AC table (§G.1.1.1.1)
      require(dcT(c.td) != null && (progressive || acT(c.ta) != null),
        s"JPEG: missing huffman tables dc=${c.td}/ac=${c.ta}")
    }
    val br = new BitReaderJpeg(p, scanStart)
    val px = new Array[Int](w * h)
    val preds = new Array[Int](comps.length)
    val hMax = comps(0).h; val vMax = comps(0).v
    val mcuW = (w + 8 * hMax - 1) / (8 * hMax)
    val mcuH = (h + 8 * vMax - 1) / (8 * vMax)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var ci = 0
        while (ci < comps.length) {
          val comp = comps(ci)
          val q = quant(comp.tq)
          var vb = 0
          while (vb < comp.v) {
            var hb = 0
            while (hb < comp.h) {
              val coef = new Array[Int](64)
              val s = dcT(comp.td).decode(br)
              preds(ci) += extend(br.receive(s), s)
              // progressive DC carries the point transform: the first
              // scan transmits DC >> Al, refinements (skipped) would
              // fill the low bits — pixels are as-of-first-scan
              coef(0) = (preds(ci) << al) * q(0)
              var k = 1
              var eob = progressive // DC scan: no AC in this block
              while (k < 64 && !eob) {
                val rs = acT(comp.ta).decode(br)
                val r = rs >> 4; val size = rs & 0xf
                if (size == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  require(k < 64, "JPEG: AC run past block end")
                  coef(Zigzag(k)) =
                    extend(br.receive(size), size) * q(Zigzag(k))
                  k += 1
                }
              }
              if (ci == 0) { // luma lands; chroma stays decoded-and-dropped
                val block = idct(coef)
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    val x = (mx * comp.h + hb) * 8 + xx
                    val y = (my * comp.v + vb) * 8 + yy
                    if (x < w && y < h)
                      px(y * w + x) =
                        math.max(0, math.min(255, block(yy * 8 + xx) + 128))
                    xx += 1
                  }
                  yy += 1
                }
              }
              hb += 1
            }
            vb += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    val label =
      if (comps.length == 1) "gray"
      else (hMax, vMax) match {
        case (2, 2) => "420"
        case (2, 1) => "422"
        case (1, 2) => "440"
        case _      => "444"
      }
    (w, h, px, if (progressive) "p" + label else label)
  }

  /** Grayscale-era entry point (mm11); the decoder is shared. */
  def decodeJpegGray(p: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, px, _) = decodeJpegLumaInfo(p)
    (w, h, px)
  }

  // ------------------------------------------------------ Spark plumbing

  final case class JpegHash(doc_id: Long, format: String,
                            width: Int, height: Int,
                            dh_hi: Long, dh_lo: Long)

  def jpegsFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, jpegGrayBytes(id)))
  }

  /** Huffman+IDCT decode + dHash per partition at scan speed. */
  def hashJpegs(media: Dataset[Multimodal.MediaRow]): Dataset[JpegHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decodeJpegGray(r.payload)
        val packed = px.map(g => (g << 16) | (g << 8) | g)
        val (hi, lo) = ImagePixels.dHash(w, h, packed)
        JpegHash(r.id, "jpeg", w, h, hi, lo)
      }
    }
  }

  final case class JpegColorHash(doc_id: Long, sampling: String,
                                 width: Int, height: Int,
                                 dh_hi: Long, dh_lo: Long)

  def colorJpegsFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, jpegColorBytes(id)))
  }

  /** Luma-only decode + dHash per partition at scan speed. The
    * sampling label comes from the PARSED SOF0, not id arithmetic —
    * the oracle cross-checks the header parse, not an echo. The
    * (id, dh_hi, dh_lo) shape ingests into dd15/dd18 unchanged. */
  def hashColorJpegs(media: Dataset[Multimodal.MediaRow])
    : Dataset[JpegColorHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px, label) = decodeJpegLumaInfo(r.payload)
        val packed = px.map(g => (g << 16) | (g << 8) | g)
        val (hi, lo) = ImagePixels.dHash(w, h, packed)
        JpegColorHash(r.id, label, w, h, hi, lo)
      }
    }
  }

  /** mm16: the progressive corpus — decode + dHash go through the
    * SAME [[hashColorJpegs]] path (the decoder dispatches on the
    * parsed SOF marker; the label comes back `p420`/`p444`). */
  def progressiveFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, jpegProgressiveBytes(id)))
  }
}
