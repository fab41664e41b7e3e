package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** PDF text extraction (round 14) — after HTML/WARC, the second
  * biggest real-corpus document format a pretraining pipeline must
  * open. Dependency-free against the PDF 1.4 spec (ISO 32000 subset):
  * object walk (`N 0 obj … endobj`), stream extraction by the
  * DECLARED `/Length` (never delimiter-matched — stream bytes legally
  * contain `endstream`), `/FlateDecode` inflation (java.util.zip, the
  * PNG IDAT precedent), then content-stream tokenization of the text
  * operators: `(…) Tj` show-text with the full escape set
  * (`\( \) \\ \n \r \t` + octal), `[…] TJ` arrays with kerning
  * numbers skipped, `Td`/`T*` line advances between runs. Decode runs
  * per row at scan speed (the [[Multimodal.extractMeta]] binary
  * boundary); the DuckDB oracle replays the expected text from the
  * document's tokens blind — a hash match certifies object walk +
  * Length accounting + inflate + escape decode end to end.
  *
  * Scope boundary (documented like color JPEG's): Type-1/TrueType
  * embedded-font CMaps (custom glyph→unicode maps) are refused by
  * absence — the extractor reads literal-string text as written,
  * the WinAnsi/ASCII case that covers machine-generated PDFs.
  */
object PdfText {

  // ------------------------------------------------------------ generator

  /** Lines = paragraphs of 8 tokens; every line with index ≡ 2
    * (mod 4) wraps its first word in literal parentheses — the
    * escape path the decoder must handle. SQL-replayable. */
  private def lineOf(words: Array[String], i: Int): String = {
    val v = words.slice(8 * i, 8 * i + 8)
    val first = if (i % 4 == 2) s"(${v.head})" else v.head
    (first +: v.tail).mkString(" ")
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** A REAL single-page PDF: catalog → pages → page → content
    * stream carrying one `Tj` per line with `Td` advances; the
    * content stream is Flate-compressed on even ids, raw on odd
    * (both filter arms exercised in the gated corpus); xref table
    * with byte-correct offsets + trailer. */
  def pdfBytes(id: Long, words: Array[String]): Array[Byte] = {
    val nLines = (words.length + 7) / 8
    val content = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
    var i = 0
    while (i < nLines) {
      if (i > 0) content.append("0 -14 Td\n")
      content.append("(").append(escape(lineOf(words, i))).append(") Tj\n")
      i += 1
    }
    content.append("ET")
    val raw = content.toString.getBytes("ISO-8859-1")
    val flate = id % 2 == 0
    val data = if (!flate) raw else {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val objs = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/MediaBox [0 0 612 792] >> endobj\n")
    val head = "%PDF-1.4\n"
    val out = new java.io.ByteArrayOutputStream
    def put(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    put(head)
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    objs.foreach { o => offsets += out.size(); put(o) }
    offsets += out.size()
    put(s"4 0 obj << /Length ${data.length}$filter >> stream\n")
    out.write(data, 0, data.length)
    put("\nendstream endobj\n")
    val xref = out.size()
    put(s"xref\n0 5\n0000000000 65535 f \n" +
      offsets.map(o => f"$o%010d 00000 n \n").mkString)
    put(s"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // -------------------------------------------------------------- decoder

  /** All `stream` payloads with their dicts, located by declared
    * /Length (content may contain `endstream`). Returns (dict,
    * bytes) pairs in document order.
    *
    * Sequential DEPTH-TRACKED scan (round 15): the round-14
    * `<<([^>]*)>>` matcher could not see past a nested dict
    * (`/DecodeParms << … >>`) — it would close the match early and
    * read a nested `/Length`, and it kept matching INSIDE stream
    * payload bytes. The scanner walks `<<`/`>>` pairs to each dict's
    * true end, reads `/Length` from the dict's TOP level only
    * (nested regions masked out), and advances the cursor past each
    * stream's declared payload before searching on. Scope boundary
    * (documented, like the CMap refusal): `<<` inside a LITERAL
    * STRING in a dict would miscount — machine-generated PDFs don't
    * put dict delimiters in dict strings; a depth that never closes
    * refuses loudly rather than misparsing. */
  private def streams(p: Array[Byte]): Seq[(String, Array[Byte])] = {
    val s = new String(p, "ISO-8859-1") // 1 byte per char: offsets align
    require(s.startsWith("%PDF-"), "not a PDF")
    val out = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    while ({ i = s.indexOf("<<", i); i >= 0 }) {
      // walk to the MATCHING '>>' (nested dicts tracked by depth)
      var j = i + 2
      var depth = 1
      while (depth > 0 && j < s.length) {
        if (s.startsWith("<<", j)) { depth += 1; j += 2 }
        else if (s.startsWith(">>", j)) { depth -= 1; j += 2 }
        else j += 1
      }
      require(depth == 0, s"PDF: dict at offset $i never closes")
      val dict = s.substring(i + 2, j - 2)
      // 'stream' directly after the dict (optional whitespace, then
      // the spec's CRLF or LF)?
      var k = j
      while (k < s.length && " \t\r\n".indexOf(s.charAt(k)) >= 0) k += 1
      if (s.startsWith("stream", k)) {
        var start = k + 6
        if (start < s.length && s.charAt(start) == '\r') start += 1
        require(start < s.length && s.charAt(start) == '\n',
          "PDF: stream keyword not followed by a newline")
        start += 1
        // /Length from the dict's top level only: mask nested dicts
        val top = new StringBuilder
        var d = 0
        var t = 0
        while (t < dict.length) {
          if (dict.startsWith("<<", t)) { d += 1; top.append("  "); t += 2 }
          else if (dict.startsWith(">>", t)) { d -= 1; top.append("  "); t += 2 }
          else { top.append(if (d == 0) dict.charAt(t) else ' '); t += 1 }
        }
        val lm = java.util.regex.Pattern.compile("/Length\\s+(\\d+)")
          .matcher(top.toString)
        require(lm.find(), "PDF: stream without a top-level /Length")
        val len = lm.group(1).toInt
        require(start + len <= p.length, "PDF: /Length runs past EOF")
        out += ((dict, java.util.Arrays.copyOfRange(p, start, start + len)))
        i = start + len // never match inside payload bytes
      } else i = j
    }
    out.result()
  }

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || !inf.needsInput(), "PDF: truncated Flate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Decode one PDF literal string starting at `(`; returns
    * (decoded, index after the closing `)`). Handles nesting and the
    * escape set. */
  private def literal(s: String, from: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = from + 1
    var depth = 1
    while (depth > 0) {
      require(i < s.length, "PDF: unterminated string")
      s.charAt(i) match {
        case '\\' =>
          require(i + 1 < s.length, "PDF: dangling escape")
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < s.length && j < i + 4 &&
                s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append(v.toChar); i = j
            case c => sb.append(c); i += 2 // \( \) \\ and friends
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  /** Text runs of one content stream: `(…) Tj` and `[…] TJ` shows,
    * with a line break at every `Td`/`T*` AFTER the first show. */
  private def contentText(content: String): Seq[String] = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var sawShow = false
    var pendingBreak = false
    var i = 0
    def flushBreak(): Unit =
      if (pendingBreak && sawShow) {
        lines += cur.toString; cur.clear(); pendingBreak = false
      } else pendingBreak = false
    while (i < content.length) {
      content.charAt(i) match {
        case '(' =>
          val (txt, ni) = literal(content, i)
          i = ni
          // show only when a text-show operator follows the operand;
          // a string operand of any other operator is not text
          val rest = content.substring(i).dropWhile(_.isWhitespace)
          if (rest.startsWith("Tj") || rest.startsWith("'") ||
            rest.startsWith("\"")) {
            flushBreak()
            cur.append(txt)
            sawShow = true
          }
        case '[' => // TJ array: strings concatenate, kerning skips
          val seg = new StringBuilder
          var j = i + 1
          while (j < content.length && content.charAt(j) != ']') {
            if (content.charAt(j) == '(') {
              val (t, nj) = literal(content, j)
              seg.append(t); j = nj
            } else j += 1
          }
          j = math.min(j + 1, content.length)
          val rest = content.substring(j).dropWhile(_.isWhitespace)
          if (rest.startsWith("TJ")) {
            flushBreak()
            cur.append(seg)
            sawShow = true
          }
          i = j
        case 'T' if i + 1 < content.length &&
            (content.charAt(i + 1) == 'd' || content.charAt(i + 1) == '*') =>
          pendingBreak = true
          i += 2
        case _ => i += 1
      }
    }
    if (cur.nonEmpty || sawShow) lines += cur.toString
    lines.toSeq
  }

  /** (filter label, n_lines, extracted text) of the first content
    * stream in the document. */
  def extractText(p: Array[Byte]): (String, Int, String) = {
    val ss = streams(p)
    require(ss.nonEmpty, "PDF: no stream objects")
    val (dict, data) = ss.head
    val flate = dict.contains("/FlateDecode")
    val content = new String(if (flate) inflate(data) else data,
      "ISO-8859-1")
    val lines = contentText(content)
    (if (flate) "flate" else "raw", lines.length, lines.mkString("\n"))
  }

  // ------------------------------------------------------ Spark plumbing

  final case class PdfTextRow(doc_id: Long, pdf_filter: String,
                              n_lines: Int, text_out: String)

  def pdfsFromDocuments(spark: SparkSession, docs: DataFrame)
    : Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Multimodal.spreadIds(spark, docs).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        Multimodal.MediaRow(id, pdfBytes(id, text.split(" "))) }
  }

  def extractPdfs(media: Dataset[Multimodal.MediaRow])
    : Dataset[PdfTextRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (filter, n, text) = extractText(r.payload)
        PdfTextRow(r.id, filter, n, text)
      }
    }
  }
}
