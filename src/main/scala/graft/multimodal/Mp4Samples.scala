package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** MP4 sample-table extraction (round 14) — the CODEC-AGNOSTIC half
  * of real video ingest: given an ISO-BMFF container, `stbl` answers
  * "which bytes of `mdat` are frame N" (stts → frame count + rate,
  * stsz → per-sample sizes, stsc + stco → chunk layout + offsets)
  * without touching a codec. The mm8 sampling plan then seeks to
  * exactly the 2 fps / max-8 sampled frames — cost O(sampled), never
  * O(video) — and the frames themselves stay synthetic BGR24 DIBs
  * per the generator contract (a real H.264 decoder is a documented
  * environment boundary; the sample-table walk is the part every
  * container-level pipeline needs regardless of codec).
  *
  * Generator writes a REAL boxed file: ftyp + moov { mvhd + trak
  * { tkhd + mdia { mdhd + hdlr + minf { vmhd + stbl { stsd stts stsc
  * stsz stco }}}}} + mdat — every box size correct, samples grouped
  * 3-per-chunk (a short last chunk exercises the second stsc run),
  * VARIABLE sample sizes (a per-frame trailer of `f % 3` bytes keeps
  * stsz honest — constant-size would let a broken offset walk pass),
  * absolute stco file offsets. The DuckDB oracle replays frame
  * count, sampling plan, and pixel arithmetic from doc_id alone — a
  * dHash match certifies box walk + sample table + seek + decode.
  */
object Mp4Samples {

  /** mm13 reuses the mm8 texture WITHOUT head-trims (dd17 owns
    * trim-tolerance; this operator is about byte location): frame f
    * of video id carries texture frame f. */
  def tfOf(id: Long): Int = MediaContent.vFramesBase(id)

  private def rowSize(w: Int): Int = ((w * 3 + 3) / 4) * 4

  private def frameSize(id: Long, f: Int): Int =
    rowSize(MediaContent.vWidthOf(id)) * MediaContent.vHeightOf(id) + f % 3

  // ------------------------------------------------------------ generator

  private def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length)
    bb.put(fourcc.getBytes("US-ASCII"))
    bb.put(body)
    bb.array()
  }

  private def beInts(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(bb.putInt)
    bb.array()
  }

  def mp4SampleBytes(id: Long): Array[Byte] = {
    val w = MediaContent.vWidthOf(id); val h = MediaContent.vHeightOf(id)
    val tf = tfOf(id)
    val timescale = 1000000
    val delta = MediaContent.VUsPerFrame // 10 fps in a µs timescale
    val duration = tf * delta
    val sizes = (0 until tf).map(f => frameSize(id, f))
    val nChunks = (tf + 2) / 3
    val chunkSamples =
      (0 until nChunks).map(c => math.min(3, tf - 3 * c))
    // ---- stbl children
    val stsd = box("stsd", beInts(0, 1) ++
      (beInts(16) ++ "raw ".getBytes("US-ASCII") ++
        new Array[Byte](6) ++ Array[Byte](0, 1)))
    val stts = box("stts", beInts(0, 1, tf, delta))
    val stscRuns =
      if (tf % 3 == 0) Seq((1, 3)) else Seq((1, 3), (nChunks, tf % 3))
    val stsc = box("stsc", beInts(0 +: stscRuns.length +:
      stscRuns.flatMap { case (fc, n) => Seq(fc, n, 1) }: _*))
    val stsz = box("stsz", beInts(0 +: 0 +: tf +: sizes: _*))
    // stco needs the absolute mdat body offset, which depends on the
    // header size — assemble once with offset 0 to measure, then fill
    def assemble(mdatBody: Int): Array[Byte] = {
      val chunkOffsets = chunkSamples.scanLeft(0) { (acc, n) => acc + n }
        .zip(chunkSamples.indices)
        .map { case (_, c) =>
          mdatBody + (0 until 3 * c).filter(_ < tf).map(sizes).sum }
      val stco = box("stco",
        beInts(0 +: nChunks +: chunkOffsets.take(nChunks): _*))
      val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val vmhd = box("vmhd", beInts(1, 0, 0))
      val minf = box("minf", vmhd ++ stbl)
      val mdhd = box("mdhd", beInts(0, 0, 0, timescale, duration, 0))
      val hdlr = box("hdlr", beInts(0, 0) ++
        "vide".getBytes("US-ASCII") ++ new Array[Byte](13))
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val tkhd = box("tkhd", beInts(0, 0, 0, 1, 0, duration) ++
        new Array[Byte](8) ++ beInts(0, 0) ++
        beInts(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000) ++
        beInts(w << 16, h << 16))
      val trak = box("trak", tkhd ++ mdia)
      val mvhd = box("mvhd", beInts(0, 0, 0, timescale, duration,
        0x00010000, 0x01000000) ++ new Array[Byte](8) ++
        beInts(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000) ++
        new Array[Byte](24) ++ beInts(2))
      val moov = box("moov", mvhd ++ trak)
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ beInts(0))
      ftyp ++ moov
    }
    val header = assemble(0)
    val mdatBody = header.length + 8
    val finalHeader = assemble(mdatBody)
    require(finalHeader.length == header.length, "header size must be fixed")
    val body = java.nio.ByteBuffer.allocate(sizes.sum)
    var f = 0
    while (f < tf) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = MediaContent.vRgbAt(id, f, x, h - 1 - y) // bottom-up
          body.put(b.toByte).put(g.toByte).put(r.toByte)
          x += 1
        }
        var pad = rowSize(w) - w * 3
        while (pad > 0) { body.put(0.toByte); pad -= 1 }
        y += 1
      }
      var t = f % 3 // variable-size trailer keeps stsz honest
      while (t > 0) { body.put(0xaa.toByte); t -= 1 }
      f += 1
    }
    finalHeader ++ box("mdat", body.array())
  }

  // -------------------------------------------------------------- decoder

  /** Parse the sample table and decode ONLY the `wanted` frames out
    * of `mdat` — the stsc/stco/stsz walk locates each sample's
    * absolute byte range, unneeded samples are never touched.
    * Returns `(w, h, usPerFrame, totalFrames, frame → packed
    * 0xRRGGBB row-major pixels)`. */
  def decodeMp4Frames(p: Array[Byte], wanted: Seq[Int])
    : (Int, Int, Int, Int, Map[Int, Array[Int]]) = {
    def u8(i: Int) = p(i) & 0xff
    def be32(i: Int) = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)).toInt
    def fourcc(i: Int) = new String(p.slice(i + 4, i + 8), "US-ASCII")
    def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var i = from
      var ok = true
      while (ok && i + 8 <= to) {
        val size = be32(i)
        if (size < 8 || i + size > to) ok = false
        else { out += ((fourcc(i), i + 8, i + size)); i += size }
      }
      out.result()
    }
    require(p.length >= 16 && fourcc(0) == "ftyp", "not an MP4 payload")
    val top = boxes(0, p.length)
    val (_, moovS, moovE) = top.find(_._1 == "moov")
      .getOrElse(throw new IllegalArgumentException("MP4: no moov"))
    val moov = boxes(moovS, moovE)
    val (_, trakS, trakE) = moov.find(_._1 == "trak")
      .getOrElse(throw new IllegalArgumentException("MP4: no trak"))
    val trak = boxes(trakS, trakE)
    val (w, h) = trak.collectFirst { case ("tkhd", s, e)
      if e - s >= 84 && u8(s) == 0 =>
      (be32(s + 76) >>> 16, be32(s + 80) >>> 16)
    }.getOrElse(throw new IllegalArgumentException("MP4: no v0 tkhd"))
    val (_, mdiaS, mdiaE) = trak.find(_._1 == "mdia")
      .getOrElse(throw new IllegalArgumentException("MP4: no mdia"))
    val mdia = boxes(mdiaS, mdiaE)
    val timescale = mdia.collectFirst { case ("mdhd", s, e)
      if e - s >= 20 && u8(s) == 0 => be32(s + 12)
    }.getOrElse(throw new IllegalArgumentException("MP4: no v0 mdhd"))
    require(timescale > 0, "MP4: zero timescale")
    val stbl = (for {
      (n1, s1, e1) <- mdia if n1 == "minf"
      (n2, s2, e2) <- boxes(s1, e1) if n2 == "stbl"
    } yield boxes(s2, e2)).headOption
      .getOrElse(throw new IllegalArgumentException("MP4: no stbl"))
    def tbl(name: String): (Int, Int) = stbl.find(_._1 == name)
      .map { case (_, s, e) => (s, e) }
      .getOrElse(throw new IllegalArgumentException(s"MP4: no $name"))
    // stts → frame count + uniform rate (single run: fixed-rate video)
    val (sttsS, _) = tbl("stts")
    require(be32(sttsS + 4) == 1, "MP4: only single-run stts (fixed rate)")
    val totalFrames = be32(sttsS + 8)
    val delta = be32(sttsS + 12)
    val usPerFrame = (delta.toLong * 1000000 / timescale).toInt
    // stsz → per-sample sizes (or one constant)
    val (stszS, _) = tbl("stsz")
    val constSize = be32(stszS + 4)
    val nSizes = be32(stszS + 8)
    require(nSizes == totalFrames, "MP4: stsz/stts count mismatch")
    val sizes: Int => Int =
      if (constSize != 0) _ => constSize else f => be32(stszS + 12 + 4 * f)
    // stsc runs + stco → absolute offset of every sample
    val (stscS, _) = tbl("stsc")
    val nRuns = be32(stscS + 4)
    val runs = (0 until nRuns).map { r =>
      (be32(stscS + 8 + 12 * r), be32(stscS + 12 + 12 * r)) }
    val (stcoS, _) = tbl("stco")
    val nChunks = be32(stcoS + 4)
    def chunkOffset(c: Int) = be32(stcoS + 8 + 4 * c) // c is 0-based
    def samplesInChunk(c1: Int) = // c1 is 1-based, per stsc semantics
      runs.takeWhile(_._1 <= c1).lastOption.map(_._2)
        .getOrElse(throw new IllegalArgumentException("MP4: stsc gap"))
    val offsets = new Array[Int](totalFrames)
    var f = 0
    var c = 0
    while (c < nChunks && f < totalFrames) {
      var off = chunkOffset(c)
      var s = 0
      val inChunk = samplesInChunk(c + 1)
      while (s < inChunk && f < totalFrames) {
        offsets(f) = off
        off += sizes(f)
        f += 1; s += 1
      }
      c += 1
    }
    require(f == totalFrames, s"MP4: chunk layout covers $f/$totalFrames")
    val rs = rowSize(w)
    val out = wanted.distinct.map { fr =>
      require(fr >= 0 && fr < totalFrames, s"MP4: frame $fr out of range")
      val base = offsets(fr)
      require(base + rs * h <= p.length, s"MP4: sample $fr runs past EOF")
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = base + (h - 1 - y) * rs + x * 3
          px(y * w + x) = (u8(o + 2) << 16) | (u8(o + 1) << 8) | u8(o)
          x += 1
        }
        y += 1
      }
      fr -> px
    }.toMap
    (w, h, usPerFrame, totalFrames, out)
  }

  // ------------------------------------------------------ Spark plumbing

  def mp4sFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id").as[Long]
      .map(id => Multimodal.MediaRow(id, mp4SampleBytes(id)))
  }

  /** The mm8 sampling plan driven by the SAMPLE TABLE: stts supplies
    * rate + count, stsc/stco/stsz supply byte ranges, only the
    * sampled frames decode. Scan-speed mapPartitions. */
  def hashSampledMp4Frames(media: Dataset[Multimodal.MediaRow])
    : Dataset[MediaContent.VideoFrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // one cheap header pass for the plan, then the seek-decode
        val (w, h, usf, tf, _) = decodeMp4Frames(r.payload, Nil)
        val wanted = MediaContent.sampledFrames(usf, tf)
        val (_, _, _, _, frames) = decodeMp4Frames(r.payload, wanted)
        wanted.distinct.sorted.map { f =>
          val (hi, lo) = ImagePixels.dHash(w, h, frames(f))
          MediaContent.VideoFrameHash(r.id, f, w, h, hi, lo)
        }
      }
    }
  }
}
