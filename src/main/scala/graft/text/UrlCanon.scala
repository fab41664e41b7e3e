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
  *   2. fragment dropped (never sent to the server);
  *   3. default port stripped (`:80` for http, `:443` for https);
  *   4. tracking params removed (`utm_*`, `fbclid`, `gclid`);
  *   5. remaining query params sorted bytewise, empty query dropped;
  *   6. empty path normalized to `/`.
  *
  * Pure per-row Column expressions — zero UDFs, zero shuffles; at
  * 100 TB this is a free column on the crawl scan, and the dedup it
  * keys is ONE shuffle on the canonical string.
  */
object UrlCanon {

  /** Canonical form of `url` under the rules above. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1))
    val path = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "^[^#]*\\?([^#]*)", 1)
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
    * every 4th id, fragments on ids ≡ 1 (mod 6). Ids 40 apart with
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
      lit("/p/"), s(id % 40),
      lit("?utm_source=feed&b="), s(id % 5),
      lit("&utm_campaign=c"), s(id % 3),
      lit("&a="), s(id % 4),
      when(id % 4 === 0, concat(lit("&fbclid=x"), s(id % 9)))
        .otherwise(lit("")),
      when(id % 6 === 1, concat(lit("#sec"), s(id % 7)))
        .otherwise(lit("")))
  }
}
