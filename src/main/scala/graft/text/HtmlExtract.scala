package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the FIRST pass of every web-scale
  * pretraining pipeline (raw crawl HTML precedes everything the
  * t2–t24 battery scores), absent from the pandas reference (ref
  * etl_documents.py assumes extracted text arrives in the dump) and
  * filled here as part of the LLM-pipeline extension surface.
  *
  * The shape is jusText/trafilatura's two-level rule, dependency-free
  * and expressed ENTIRELY as codegen'd Column expressions (the §2.8
  * zero-UDF invariant — scan-parallel at any corpus size, zero
  * shuffles):
  *
  *   1. DOCUMENT level: drop comments, then `<script>`/`<style>`/
  *      `<head>` subtrees wholesale (their text is never content).
  *   2. BLOCK level: closing block tags (`</p> </div> </h1>…` and
  *      `<br>`) become line breaks; inline tags (`<b> <a> <span>…`)
  *      are stripped in place, entities decoded (`&amp;` LAST — a
  *      naive first-pass `&amp;lt;` would double-decode), whitespace
  *      normalized.
  *   3. LINE keep rule: a line survives with ≥ 3 words AND link
  *      density ≤ 1/3 (chars inside `<a>` anchors vs total chars —
  *      integer arithmetic, no float threshold). Nav bars and link
  *      farms die by density; footers and stub lines by word count —
  *      the jusText boilerplate classification, linearized.
  *
  * Scale shape: pure per-row fold — the extraction plan is
  * exchange-free (ScaleSpec pins t29 alongside t10/t11/t22) and the
  * regexes run inside WholeStageCodegen. At 100 TB this is a scan.
  */
object HtmlExtract {

  /** The named entities the extractor decodes — HTML4's top tier by
    * real-crawl frequency (WHATWG names beyond this table pass
    * through literally; the full table is 2k+ names, almost all of
    * them vanishingly rare). Order within the table is irrelevant:
    * decode is one-entity-per-`&` (see [[decodeEntities]]), never a
    * replace chain. */
  private val NamedEntities: Seq[(String, String)] = Seq(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ",
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "middot" -> "·", "sect" -> "§", "para" -> "¶",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedil" -> "ç", "ntilde" -> "ñ", "szlig" -> "ß",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü")

  /** Entity decode: numeric `&#NNN;` / `&#xHHHH;` (any BMP code
    * point — UTF-16BE bytes built from the code point, so `&#8212;`
    * (—) and `&#xe9;` (é) decode exactly; lone surrogates and
    * supplementary planes pass through literally) plus the
    * [[NamedEntities]] table. Implemented as a split at `&` + one
    * decode per part: each `&` consumes AT MOST ONE leading entity,
    * so `&amp;lt;` yields the literal `&lt;` without a second pass —
    * the double-decode a replace-chain must order around is
    * structurally impossible. One string walk per row, zero UDFs. */
  def decodeEntities(c: Column): Column = {
    val parts = split(c, "&", -1)
    val tail = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixed = transform(tail, p => {
      // entity name/payload ends at the FIRST ';', and no supported
      // form is longer than 7 chars before it — everything else is a
      // bare '&' restored literally. The bound keeps the name
      // substring tiny and skips the decode machinery on ordinary
      // text; CaseWhen codegen evaluates only the taken branch, so
      // the numeric regexes run solely on '#'-leading parts and the
      // named lookup is ONE literal-map probe, not a comparison chain.
      val sc = call_function("locate", lit(";"), p)
      val rest = p.substr(sc + 1, length(p))
      val dec = regexp_extract(p, "^#([0-9]{1,5});", 1)
      val hx = regexp_extract(p, "^#[xX]([0-9a-fA-F]{1,4});", 1)
      val code = when(dec =!= "", dec.cast("int"))
        .when(hx =!= "", conv(hx, 16, 10).cast("int"))
      val bmp = code.isNotNull && code >= 1 && code <= 65535 &&
        !(code >= 55296 && code <= 57343) // lone surrogates stay literal
      val numeric = when(bmp,
        concat(decode(unhex(lpad(hex(code), 4, "0")), "UTF-16BE"), rest))
      val named = element_at(typedlit(NamedEntities.toMap),
        p.substr(lit(1), sc - 1))
      coalesce(
        when(sc >= 2 && sc <= 8,
          when(p.startsWith("#"), numeric)
            .otherwise(concat(named, rest))),
        concat(lit("&"), p))
    })
    concat(element_at(parts, 1), array_join(fixed, ""))
  }

  /** Tag-strip + entity-decode + whitespace-normalize one fragment. */
  private def cleanText(c: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(c, "<[^>]*>", " ")), " +", " "))

  /** Extract `html` into a struct
    * `(n_blocks: long, n_kept: long, extracted: string)` —
    * `n_blocks` counts non-empty text blocks, `n_kept` the ones the
    * keep rule retains, `extracted` their cleaned text joined by
    * `\n` in document order. */
  def extract(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    // one alternation with a backreference: <head> subtrees swallow
    // their own <style>/<script> children in a single match
    val noBoiler = regexp_replace(noComment,
      "(?is)<(script|style|head)[^>]*>.*?</\\1>", " ")
    val broken = regexp_replace(noBoiler,
      "(?i)</(p|div|h[1-6]|li|ul|ol|nav|footer|header|article|section" +
        "|table|tr|td|th|blockquote|pre)>|<br[^>]*>", "\n")
    val lines = transform(split(broken, "\n"), l => {
      val txt = cleanText(l)
      val linkChars = aggregate(
        transform(regexp_extract_all(l, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)),
          a => length(cleanText(a))),
        lit(0), (acc, x) => acc + x)
      struct(txt.as("txt"), linkChars.as("lc"))
    })
    val nonEmpty = filter(lines, s => s.getField("txt") =!= "")
    val kept = filter(nonEmpty, s =>
      size(split(s.getField("txt"), " ")) >= 3 &&
        s.getField("lc") * 3 <= length(s.getField("txt")))
    struct(
      size(nonEmpty).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"),
      array_join(transform(kept, s => s.getField("txt")), "\n")
        .as("extracted"))
  }

  /** All `<a href>` values of `html` in document order, entities
    * decoded (real markup carries `&amp;` inside query strings — an
    * un-decoded href canonicalizes wrong). The raw-crawl side of the
    * frontier step: outlinks feed [[UrlCanon.canonicalize]] and a
    * seen-set anti-join to become the next crawl wave. Pure Column. */
  def links(html: Column): Column =
    transform(
      regexp_extract_all(html,
        lit("(?si)<a[^>]*?href\\s*=\\s*[\"']([^\"']*)"), lit(1)),
      h => decodeEntities(h))

  // ------------------------------------------------------------ generator

  /** Test-corpus generator: render a document's tokens into real HTML
    * whose expected extraction is SQL-replayable from the tokens
    * alone (the mm6/mm11 generator-oracle pattern applied to markup).
    * Tokens chunk into paragraphs of 8; paragraph i renders as
    *   - i % 5 == 2 → a LINK FARM (every word its own anchor) — the
    *     density rule must drop it;
    *   - even i     → `<p>&quot;w0&quot;&nbsp;w1 … &#39;wk-1&#39;</p>`
    *     (entity escapes exercised; kept iff k ≥ 3);
    *   - odd i      → `<div><b>w0</b> &amp; w1 … wk-1</div>` (inline
    *     tag + bare entity; kept iff k+1 ≥ 3)
    * wrapped in a head (title/style/script — must vanish wholesale),
    * a nav bar (density-dropped), an HTML comment, and an all-link
    * footer (word-count-dropped). */
  def render(docId: Column, words: Column): Column = {
    def par(i: Column): Column = {
      val v = slice(words, i * 8 + 1, lit(8))
      val k = size(v)
      val farm = concat(lit("<p>"),
        array_join(transform(v, t =>
          concat(lit("<a href=\"#\">"), t, lit("</a>"))), " "),
        lit("</p>"))
      val even = concat(lit("<p>&quot;"), element_at(v, 1), lit("&quot;"),
        when(k >= 2, concat(lit("&nbsp;"),
          when(k > 2, concat(array_join(slice(v, lit(2), k - 2), " "),
            lit(" "))).otherwise(lit("")),
          lit("&#39;"), element_at(v, k), lit("&#39;")))
          .otherwise(lit("")),
        lit("</p>"))
      val odd = concat(lit("<div><b>"), element_at(v, 1),
        lit("</b> &amp;"),
        when(k >= 2, concat(lit(" "),
          array_join(slice(v, lit(2), k - 1), " "))).otherwise(lit("")),
        lit("</div>"))
      when(i % 5 === 2, farm).when(i % 2 === 0, even).otherwise(odd)
    }
    val nPars = floor((size(words) + lit(7)) / lit(8)).cast("int")
    concat(
      lit("<html><head><title>Doc "), docId,
      lit("</title><style>p{color:#fff;}</style>" +
        "<script>var t=1;</script></head><body>" +
        "<nav><a href=\"/\">home</a> <a href=\"/a\">about</a> " +
        "<a href=\"/c\">contact</a></nav><!-- id "), docId, lit(" -->"),
      array_join(transform(
        sequence(lit(0), nPars - 1), i => par(i)), ""),
      lit("<div>(c) <a href=\"/tos\">terms</a></div></body></html>"))
  }
}
