package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record extraction — the container every web
  * crawl actually ships (Common Crawl et al.): a WARC capsule is a
  * concatenation of records, each a header block (`WARC/1.0` +
  * `WARC-Type` / `WARC-Target-URI` / `Content-Length` headers),
  * `\r\n\r\n`, `Content-Length` payload bytes, `\r\n\r\n`. The
  * response records' payloads are HTTP messages whose bodies are the
  * HTML that [[HtmlExtract]] consumes — together they form the raw
  * front of a pretraining pipeline: WARC → HTTP → HTML → text.
  *
  * The record walk is CONTENT-LENGTH ACCOUNTED, not delimiter-split:
  * payloads legally contain `\r\n\r\n` (every HTTP response does)
  * and even `WARC/1.0`, so the only correct parse jumps by declared
  * length — implemented as a bounded `aggregate` fold over record
  * slots, pure Column expressions end to end (zero UDFs; the fold
  * is codegen'd per row, scan-parallel). Grain: one WARC capsule
  * per row, like every binary column in the multimodal family — a
  * multi-GB WARC FILE splitter is a DSv2 reader concern, documented
  * boundary.
  */
object WarcExtract {

  private val RecStruct =
    "array<struct<rtype:string,uri:string,payload:string>>"

  /** The bounded record fold, finished by `fin` over the final
    * `(pos, recs)` state. */
  private def foldRecords(warc: Column, maxRecords: Int,
                          fin: Column => Column): Column = {
    val sep = lit("\r\n\r\n")
    aggregate(
      sequence(lit(1), lit(maxRecords)),
      struct(lit(1).as("pos"), array().cast(RecStruct).as("recs")),
      (st, _) => {
        val pos = st.getField("pos")
        val hEnd = call_function("locate", sep, warc, pos)
        val hdr = call_function("substring", warc, pos, hEnd - pos)
        val clen = regexp_extract(hdr, "Content-Length: ([0-9]+)", 1)
          .cast("int")
        val ok = pos <= length(warc) && hEnd > 0 &&
          hdr.startsWith("WARC/") && clen.isNotNull
        val rec = struct(
          regexp_extract(hdr, "WARC-Type: ([a-z]+)", 1).as("rtype"),
          regexp_extract(hdr, "WARC-Target-URI: ([^\r\n]+)", 1).as("uri"),
          call_function("substring", warc, hEnd + 4, clen).as("payload"))
        when(ok, struct(
          (hEnd + 4 + clen + 4).as("pos"),
          concat(st.getField("recs"), array(rec)).as("recs")))
          .otherwise(st)
      },
      fin)
  }

  /** Parse up to `maxRecords` records of a WARC capsule into
    * `array<struct<rtype, uri, payload>>` in capsule order. Malformed
    * trailing bytes (no `WARC/` magic, missing header terminator)
    * stop the walk — records parsed so far are kept. Capsules that
    * may EXCEED `maxRecords` should go through [[walk]], which
    * reports the cap instead of silently dropping the tail. */
  def records(warc: Column, maxRecords: Int = 8): Column =
    foldRecords(warc, maxRecords, st => st.getField("recs"))

  /** [[records]] with the truncation surfaced:
    * `struct(recs, consumed_bytes, truncated)` — `consumed_bytes` is
    * the prefix the walk accounted for, and `truncated` is true
    * exactly when the slot budget ran out WITH another well-formed
    * record (`WARC/` magic) waiting at the cursor. A malformed tail
    * is NOT truncation (the walk stops there by design at any
    * budget); un-walked clean records are silent data loss, which
    * this flag makes loud. */
  def walk(warc: Column, maxRecords: Int = 8): Column =
    foldRecords(warc, maxRecords, st => {
      val pos = st.getField("pos")
      val recs = st.getField("recs")
      struct(
        recs.as("recs"),
        (pos - 1).cast("long").as("consumed_bytes"),
        (size(recs) === maxRecords && pos <= length(warc) &&
          call_function("substring", warc, pos, lit(5)) === "WARC/")
          .as("truncated"))
    })

  /** First record of a given `WARC-Type` (null when absent). */
  def firstOfType(recs: Column, rtype: String): Column =
    element_at(filter(recs, r => r.getField("rtype") === rtype), 1)

  /** Body of an HTTP message payload: everything after the first
    * `\r\n\r\n` (status line + headers end there by RFC 9112). */
  def httpBody(payload: Column): Column =
    payload.substr(locate("\r\n\r\n", payload) + 4, length(payload))

  /** HTTP status code of a response payload (null when not HTTP). */
  def httpStatus(payload: Column): Column =
    regexp_extract(payload, "^HTTP/1\\.[01] ([0-9]+)", 1).cast("int")

  // ------------------------------------------------------------ generator

  /** Test-corpus generator: the 3 records (warcinfo → request →
    * response) of a document's capsule as an ARRAY — the response
    * payload is a full HTTP 200 carrying [[HtmlExtract.render]]'s
    * markup for the document's tokens, the target URI is
    * [[UrlCanon.renderUrl]], and every record carries a
    * `WARC-Record-ID` naming the doc id (`urn:graft:<id>` — how the
    * file reader's rows join back to `documents`). Content-Length is
    * computed from the actual payload, so the byte-accounting walk is
    * exercised against real lengths (both non-response payloads
    * contain `\r\n` sequences; the response payload contains the
    * header terminator itself). Array grain exists for the
    * record-per-gzip-member file writer ([[graft.sources.WarcGz]]);
    * [[renderWarc]] is the concatenated capsule. */
  def renderWarcRecords(docId: Column, words: Column,
                        encodeHttp: Boolean = false): Column = {
    val url = UrlCanon.renderUrl(docId)
    // encodeHttp: responses leave under REAL transport variants
    // (identity / chunked / gzip / chunked+deflate, keyed by doc_id —
    // [[HttpDecode.encodeResponse]]); content stays the same HTML, so
    // a decoding consumer's output — and its oracle — is unchanged.
    val http =
      if (encodeHttp)
        HttpDecode.encodeResponse(HtmlExtract.render(docId, words),
          pmod(docId, lit(4)).cast("int"), lit("utf-8"),
          pmod(docId, lit(4)) <= 1)
      else concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        HtmlExtract.render(docId, words))
    def rec(rtype: String, uri: Option[Column], payload: Column) =
      renderRecord(docId, rtype, uri, payload)
    array(
      rec("warcinfo", None, lit("software: graft\r\n")),
      rec("request", Some(url),
        lit("GET /p HTTP/1.1\r\nHost: example.com\r\n\r\n")),
      rec("response", Some(url), http))
  }

  /** One WARC record as a byte-carrier string: headers (type, the
    * `urn:graft:<id>` record id, optional target URI, optional
    * `WARC-Refers-To` — how `revisit` records name their original
    * capture), Content-Length from the ACTUAL payload, the payload,
    * the record terminator. */
  def renderRecord(docId: Column, rtype: String, uri: Option[Column],
                   payload: Column,
                   refersTo: Option[Column] = None): Column =
    concat(lit(s"WARC/1.0\r\nWARC-Type: $rtype\r\n"),
      lit("WARC-Record-ID: <urn:graft:"), docId.cast("string"),
      lit(">\r\n"),
      uri.map(u => concat(lit("WARC-Target-URI: "), u, lit("\r\n")))
        .getOrElse(lit("")),
      refersTo.map(r => concat(lit("WARC-Refers-To: "), r, lit("\r\n")))
        .getOrElse(lit("")),
      lit("Content-Length: "), length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))

  /** WET-shaped records (Common Crawl's text product): warcinfo + one
    * `conversion` record whose payload IS the extracted text. The
    * EXPORT direction of the crawl front — a pipeline that ships its
    * extraction output ships it in exactly this container. */
  def renderWetRecords(docId: Column, text: Column): Column =
    array(
      renderRecord(docId, "warcinfo", None,
        lit("software: graft\r\nformat: WET\r\n")),
      renderRecord(docId, "conversion", Some(UrlCanon.renderUrl(docId)),
        text))

  /** The concatenated capsule form of [[renderWarcRecords]] (t31's
    * input grain). */
  def renderWarc(docId: Column, words: Column): Column =
    array_join(renderWarcRecords(docId, words), "")
}
