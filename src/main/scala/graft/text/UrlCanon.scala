package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the standard FIRST dedup key of a crawl
  * pipeline (before any content hashing): the same page is fetched
  * as `HTTP://Example.COM:80/p?utm_source=feed&b=1&a=2` and
  * `http://example.com/p?a=2&b=1`, and exact-dedup on the raw string
  * misses the equality. Absent from the pandas reference; part of
  * the LLM-pipeline extension surface next to [[HtmlExtract]].
  *
  * Rules (the conservative, semantics-preserving subset every
  * canonicalizer agrees on):
  *   1. scheme + authority lowercase (RFC 3986 §6.2.2.1);
  *   2. percent-encoding normalized (RFC 3986 §6.2.2.2): hex digits
  *      uppercased, UNRESERVED octets (`A-Z a-z 0-9 - . _ ~`)
  *      decoded — reserved octets (`%2F`, `%26`, …) stay encoded, so
  *      component boundaries never shift;
  *   3. fragment dropped (never sent to the server);
  *   4. default port stripped (`:80` for http, `:443` for https);
  *   5. tracking params removed (`utm_*`, `fbclid`, `gclid`);
  *   6. remaining query params sorted bytewise, empty query dropped;
  *   7. empty path normalized to `/`.
  *
  * Pure per-row Column expressions — zero UDFs, zero shuffles; at
  * 100 TB this is a free column on the crawl scan, and the dedup it
  * keys is ONE shuffle on the canonical string.
  */
object UrlCanon {

  /** RFC 3986 §6.2.2.2 percent-encoding normalization: every `%XX`
    * triplet is uppercased, and triplets encoding an UNRESERVED
    * octet decode to the bare character. Implemented as a split at
    * `%` + per-part transform (each part after the first begins with
    * the two hex digits of one triplet): a regexp-replace chain over
    * the 66 unreserved octets would be ~66 regex passes per row; the
    * split walks the string once. A `%` not followed by two hex
    * digits (malformed escape) passes through untouched — real crawl
    * URLs contain them and a canonicalizer must not corrupt. */
  def normalizePercent(url: Column): Column = {
    val parts = split(url, "%", -1)
    val tail = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixed = transform(tail, p => {
      val hex = upper(p.substr(1, 2))
      val code = conv(hex, 16, 10).cast("int")
      val rest = p.substr(lit(3), length(p))
      val unreserved =
        (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
          (code >= 48 && code <= 57) ||
          code.isin(45, 46, 95, 126) // - . _ ~
      when(!p.rlike("^[0-9A-Fa-f]{2}"), concat(lit("%"), p))
        .when(unreserved, concat(call_function("char", code), rest))
        .otherwise(concat(lit("%"), hex, rest))
    })
    concat(element_at(parts, 1), array_join(fixed, ""))
  }

  /** Canonical form of `url` under the rules above.
    *
    * The percent-normalized form feeds all four component
    * extractions, and HOF lambdas (normalizePercent's `transform`)
    * sit outside whole-stage codegen's subexpression elimination — so
    * the normalized string is LET-BOUND once per row through a
    * single-element `transform` (the array element evaluates once;
    * lambda references read the bound value). Without the binding the
    * split+transform pass re-runs per component reference. */
  def canonicalize(rawUrl: Column): Column =
    element_at(
      transform(array(normalizePercent(rawUrl)), u => canonOfNormalized(u)),
      1)

  private def canonOfNormalized(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1))
    val path = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    // query = first '?' to fragment: the path regex stops at the
    // first '?', so anchoring the query to the LAST pre-fragment '?'
    // (round 14's '^[^#]*\?') silently dropped 'a=1?' from
    // 'http://x/p?a=1?b=2' — a false-merge under URL dedup
    val query = regexp_extract(url, "^[^?#]*\\?([^#]*)", 1)
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)="))
    val canonQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), authNoPort,
      when(path === "", lit("/")).otherwise(path),
      when(canonQ =!= "", concat(lit("?"), canonQ)).otherwise(lit("")))
  }

  /** Test-corpus generator (t30): a raw URL from `doc_id` arithmetic
    * exercising every rule — mixed-case scheme/host, explicit default
    * ports, tracking params interleaved out of sort order, fbclid on
    * every 4th id, fragments on ids ≡ 1 (mod 6), and (round 15)
    * percent-variant spellings: the path carries `~` literal /
    * `%7e` / `%7E` and the `c` param `%2F` / `%2f` keyed on id%3 —
    * so each 40-apart equal group reaches the same canonical form
    * through DIFFERENT percent spellings. Ids 40 apart with
    * id%3 ∈ {0,1} canonicalize EQUAL through different raw forms, so
    * the dedup stage has real groups at every sf. SQL-replayable. */
  def renderUrl(id: Column): Column = {
    def s(c: Column): Column = c.cast("string")
    concat(
      when(id % 2 === 0, lit("HTTP")).otherwise(lit("https")),
      lit("://"),
      when(id % 3 === 0, lit("Example.COM"))
        .when(id % 3 === 1, concat(lit("example.com"),
          when(id % 2 === 0, lit(":80")).otherwise(lit(":443"))))
        .otherwise(lit("Sub.Example.org:8080")),
      lit("/p/"),
      when(id % 3 === 0, lit("~v")).when(id % 3 === 1, lit("%7ev"))
        .otherwise(lit("%7Ev")),
      s(id % 40),
      lit("?utm_source=feed&b="), s(id % 5),
      lit("&utm_campaign=c"), s(id % 3),
      lit("&a="), s(id % 4),
      lit("&c="),
      when(id % 3 === 1, lit("%2fq")).otherwise(lit("%2Fq")),
      when(id % 4 === 0, concat(lit("&fbclid=x"), s(id % 9)))
        .otherwise(lit("")),
      when(id % 6 === 1, concat(lit("#sec"), s(id % 7)))
        .otherwise(lit("")))
  }
}
