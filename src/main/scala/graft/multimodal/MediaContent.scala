package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Audio/video CONTENT ops (round 12) — the step past header decode
  * for the remaining two modalities, completing the arc headers →
  * image pixels ([[ImagePixels]]) → video frames + audio samples:
  *
  *  - REAL AVI containers whose `movi` LIST carries uncompressed
  *    BGR24 DIB frames (`00db` chunks, bottom-up padded rows — the
  *    layout every uncompressed-AVI reader expects). The decoder
  *    SEEKS to the sampled frames by walking chunk sizes — it never
  *    decodes the frames the 2 fps sampling plan skips, which is the
  *    cost model that matters when a frame is megabytes: sampling
  *    cost is O(sampled frames), not O(video).
  *  - REAL WAV payloads carrying 16-bit PCM mono samples, decoded
  *    back and fingerprinted by frame-energy deltas (the
  *    Haitsma–Kalker / chromaprint bit shape: bit f = "energy rose
  *    from frame f−1 to f" — robust to uniform gain, pure integer).
  *
  * Test contract (mm7/mm8): every sample and pixel derives from
  * `doc_id` by integer arithmetic; the Spark side recovers
  * fingerprints/hashes by DECODING THE BYTES, the DuckDB oracle
  * replays the arithmetic blind — a hash match certifies container
  * encode, frame seek, pixel/PCM decode, and the fingerprint fold
  * together. Decode runs in `mapPartitions` at scan speed (the
  * legitimate binary boundary, the [[Multimodal.extractMeta]]
  * contract).
  */
object MediaContent {

  // ------------------------------------------------------------ video

  /** One sampled, decoded, hashed video frame. */
  final case class VideoFrameHash(doc_id: Long, frame_idx: Int,
                                  width: Int, height: Int,
                                  dh_hi: Long, dh_lo: Long)

  /** Frame dims: ≥ the 9×8 dHash grid (every downsample cell must own
    * ≥1 pixel), small enough for the oracle's per-pixel SQL replay. */
  def vWidthOf(id: Long): Int  = 12 + ((id / 2) % 3).toInt * 4
  def vHeightOf(id: Long): Int = 8 + ((id / 2) % 2).toInt * 4
  /** 10 fps fixed — duration math stays exact integer. Frame count is
    * pair-keyed (id/2) so planted twins share a sampling plan — EXCEPT
    * the trimmed twins (round 13): every third pair's odd twin drops
    * its first 5 container frames (= one 2 fps sample slot), the
    * common head-trim/re-encode case dd17 must still catch. Pairs
    * whose base runs 8 frames are exempt: a 3-frame trimmed video
    * samples zero frames and would be invisible to ANY
    * sampled-frame matcher. */
  val VUsPerFrame = 100000
  val VTrim = 5
  def vFramesBase(id: Long): Int = 8 + ((id / 2) % 5).toInt * 3
  def vTrimOf(id: Long): Int =
    if (id % 2 == 1 && (id / 2) % 3 == 2 && (id / 2) % 5 >= 1) VTrim else 0
  def vFramesOf(id: Long): Int = vFramesBase(id) - vTrimOf(id)

  /** Frame-f pixel formula, shared verbatim with the oracle (the
    * [[ImagePixels.rgbAt]] texture with the frame index folded in).
    * Pairs (2k, 2k+1) share the texture — the planted video
    * near-dups — with the odd twin perturbed on 2–3 diagonal pixels
    * PER FRAME (the image-corpus plant, applied frame-wise). */
  def vRgbAt(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = {
    val seed = ((id / 2) % 97).toInt
    val nz = if (id % 2 == 1 && x == y && x % 4 == 1) 40 else 0
    ((seed * 31 + x * 7 + y * 13 + f * 29 + x * y * (seed % 11) + nz) % 256,
     (seed * 17 + x * 11 + y * 5 + f * 37 + x * x * (seed % 7) + nz) % 256,
     (seed * 23 + x * 3 + y * 19 + f * 41 + y * y * (seed % 13) + nz) % 256)
  }

  private def rowSize(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** Real AVI: the canonical 88-byte RIFF/hdrl/avih header
    * ([[Multimodal]]'s layout) + `LIST ... movi` holding one `00db`
    * DIB chunk per frame (BGR24, bottom-up, rows padded to 4). */
  def aviPixelBytes(id: Long): Array[Byte] = {
    val w = vWidthOf(id); val h = vHeightOf(id); val tf = vFramesOf(id)
    val trim = vTrimOf(id)
    val fSize = rowSize(w) * h
    val movi = java.nio.ByteBuffer.allocate(12 + tf * (8 + fSize))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    movi.put("LIST".getBytes("US-ASCII")).putInt(4 + tf * (8 + fSize))
    movi.put("movi".getBytes("US-ASCII"))
    var f = 0
    while (f < tf) {
      movi.put("00db".getBytes("US-ASCII")).putInt(fSize)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // container frame f carries TEXTURE frame f+trim: a trimmed
          // twin is the same footage minus its head
          val (r, g, b) = vRgbAt(id, f + trim, x, h - 1 - y) // bottom-up
          movi.put(b.toByte).put(g.toByte).put(r.toByte)
          x += 1
        }
        var pad = rowSize(w) - w * 3
        while (pad > 0) { movi.put(0.toByte); pad -= 1 }
        y += 1
      }
      f += 1
    }
    Multimodal.synthesizeAvi(w, h, VUsPerFrame, tf, movi.array())
  }

  /** Decode ONLY the requested frames out of the `movi` chunk walk —
    * unneeded `00db` chunks are SKIPPED by size, never materialized.
    * Returns `(w, h, usPerFrame, totalFrames, frameIdx → packed
    * 0xRRGGBB row-major pixels)`. */
  def decodeAviFrames(p: Array[Byte], wanted: Seq[Int])
    : (Int, Int, Int, Int, Map[Int, Array[Int]]) = {
    def u8(i: Int)   = p(i) & 0xff
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    def ascii(i: Int, s: String) =
      i + s.length <= p.length &&
        s.indices.forall(j => u8(i + j) == s.charAt(j))
    val (w, h, usf, tf) = Multimodal.decodeAviHeader(p).getOrElse(
      throw new IllegalArgumentException("not an AVI payload"))
    require(ascii(88, "LIST") && ascii(96, "movi"),
      "AVI payload carries no movi LIST")
    val want = wanted.toSet
    val out = scala.collection.mutable.Map.empty[Int, Array[Int]]
    val rs = rowSize(w)
    var i = 100 // first chunk after LIST(4+size)+movi
    var f = 0
    while (i + 8 <= p.length && f < tf && out.size < want.size) {
      require(ascii(i, "00db"), s"unexpected movi chunk at $i")
      val sz = le32(i + 4)
      if (want.contains(f)) {
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = i + 8 + (h - 1 - y) * rs + x * 3
            px(y * w + x) = (u8(o + 2) << 16) | (u8(o + 1) << 8) | u8(o)
            x += 1
          }
          y += 1
        }
        out(f) = px
      }
      i += 8 + sz
      f += 1
    }
    (w, h, usf, tf, out.toMap)
  }

  /** The sampling plan of [[Multimodal.frameSampleIndices]] replayed
    * in integer scalar form, then mapped from 2 fps sample slots to
    * FRAME indices under the stream's own clock. */
  def sampledFrames(usPerFrame: Int, totalFrames: Int,
                    fps: Double = 2.0, maxFrames: Int = 8): Seq[Int] = {
    val durationMs = totalFrames.toLong * usPerFrame / 1000
    val total = (durationMs / (1000.0 / fps)).toInt
    val n = math.min(total, maxFrames)
    (0 until n).map { i =>
      val slot = i * total / n
      math.min((slot.toLong * 500000 / usPerFrame).toInt, totalFrames - 1)
    }
  }

  /** Decode + hash the 2 fps / max-8 sampled frames of each video,
    * per partition at scan speed — mm2's sampling PLAN executed into
    * actual frame pixels, hashed with the image dHash. */
  def hashSampledFrames(media: Dataset[Multimodal.MediaRow])
    : Dataset[VideoFrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w0, h0, usf, tf) = Multimodal.decodeAviHeader(r.payload)
          .getOrElse(throw new IllegalArgumentException(
            s"media ${r.id} is not an AVI payload"))
        val wanted = sampledFrames(usf, tf)
        val (w, h, _, _, frames) = decodeAviFrames(r.payload, wanted)
        require(w == w0 && h == h0, "header/frame dim mismatch")
        wanted.distinct.sorted.map { f =>
          val (hi, lo) = ImagePixels.dHash(w, h, frames(f))
          VideoFrameHash(r.id, f, w, h, hi, lo)
        }
      }
    }
  }

  def videosFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, aviPixelBytes(id)))
  }

  // ------------------------------------------------------------ audio

  /** One fingerprinted audio payload. */
  final case class AudioFingerprint(doc_id: Long, sample_rate: Int,
                                    n_samples: Int,
                                    fp_hi: Long, fp_lo: Long)

  val AFrame = 32 // samples per energy frame
  def aSamplesOf(id: Long): Int = 2112 + (id % 4).toInt * 256
  def aRateOf(id: Long): Int = 8000 + (id % 3).toInt * 4000

  /** Sample formula shared verbatim with the oracle: a small-
    * amplitude integer waveform seeded per PAIR (id/2) — the planted
    * near-dup structure of [[ImagePixels]] — with the odd twin
    * perturbed on every 499th sample. The seed modulates the quadratic
    * WRAP modulus and the ramp slope (not just a constant offset —
    * the energy-delta fingerprint is offset-blind by design, so a
    * shift-only seed would make every waveform fingerprint alike;
    * (seed%37, seed%29) is injective over the 97 seeds by CRT). */
  def sampleAt(id: Long, t: Int): Int = {
    val seed = ((id / 2) % 97).toInt
    // Knuth multiplicative mix: pseudo-random per (seed, t), so
    // frame energies are iid-ish and the rise/fall fingerprint bits
    // carry full entropy — a structured ramp/wrap waveform makes
    // every seed's energy profile share the same sawtooth and the
    // whole corpus collapses into near-dups of itself
    // the SEED picks the (odd) multiplier, not an additive offset —
    // an offset-only seed leaves every waveform the same permutation
    // shifted, and the offset-blind energy fingerprint collapses the
    // corpus into near-dups of itself
    // prime outer modulus: with a power-of-two pair the low bits
    // collapse to an arithmetic progression mod 2048 (a sawtooth),
    // and sawtooths with nearby steps correlate across seeds
    val base = ((((t + 1).toLong * (2654435761L + seed * 97561L))
      % 65521L) % 2048L).toInt - 1024
    base + (if (id % 2 == 1 && t % 499 == 3) 200 else 0)
  }

  /** Real WAV (RIFF/fmt/data, 16-bit PCM mono) carrying the
    * id-derived waveform little-endian. */
  def wavPcmBytes(id: Long): Array[Byte] = {
    val n = aSamplesOf(id)
    val body = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var t = 0
    while (t < n) { body.putShort(sampleAt(id, t).toShort); t += 1 }
    Multimodal.synthesizeWav(aRateOf(id), 1, body.array())
  }

  /** Parse a 16-bit PCM mono/stereo WAV back to
    * `(sampleRate, channels, samples)`. */
  def decodePcm(p: Array[Byte]): (Int, Int, Array[Int]) = {
    def u8(i: Int)   = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    def ascii(i: Int, s: String) =
      s.indices.forall(j => u8(i + j) == s.charAt(j))
    require(p.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE") &&
      ascii(12, "fmt ") && ascii(36, "data"), "not a canonical PCM WAV")
    require(le16(34) == 16, s"PCM bit depth ${le16(34)} — only 16")
    val rate = le32(24); val channels = le16(22)
    val dataLen = le32(40)
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (le16(44 + i * 2) << 16) >> 16 // sign-extend
      i += 1
    }
    (rate, channels, out)
  }

  /** 64-bit energy-delta fingerprint: frame f's energy (Σ s², 32
    * samples) against frame f−1's — bit f−1 set when it rose. Gain-
    * shift robust, pure integer, and FOLDABLE in SQL (the oracle
    * replays it with a self-join on adjacent frames). */
  def fingerprint(samples: Array[Int]): (Long, Long) = {
    val frames = samples.length / AFrame
    require(frames >= 65,
      s"fingerprint needs ≥65 frames, got $frames")
    val e = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      var t = 0; var acc = 0L
      while (t < AFrame) {
        val s = samples(f * AFrame + t).toLong
        acc += s * s; t += 1
      }
      e(f) = acc; f += 1
    }
    var hi = 0L; var lo = 0L
    var b = 0
    while (b < 64) {
      if (e(b + 1) > e(b)) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    (hi, lo)
  }

  def audioFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, wavPcmBytes(id)))
  }

  /** Decode + fingerprint per partition at scan speed. */
  def fingerprintAudio(media: Dataset[Multimodal.MediaRow])
    : Dataset[AudioFingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (rate, channels, samples) = decodePcm(r.payload)
        require(channels == 1, s"media ${r.id}: expected mono")
        val (hi, lo) = fingerprint(samples)
        AudioFingerprint(r.id, rate, samples.length, hi, lo)
      }
    }
  }
}
