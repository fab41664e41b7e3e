package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt politeness filtering (RFC 9309) — the gate a crawl
  * pipeline applies between URL canonicalization and fetch/keep: a
  * URL is kept iff the LONGEST matching rule prefix for its host
  * allows it (ties break toward Allow, no match means allowed — the
  * RFC's resolution order). Part of the LLM-pipeline extension
  * surface next to [[UrlCanon]]/[[HtmlExtract]]; the pandas reference
  * has no crawl surface at all.
  *
  * Shape at scale: the rules table is per-HOST and tiny relative to
  * the URL corpus (even the whole web's robots corpus is ~10⁸ rows vs
  * 10¹¹ URLs), so the decision is one BROADCAST join URL×rule on host
  * + a prefix filter + a per-URL longest-match window — no shuffle of
  * the URL side beyond the window's, and with URLs already
  * partitioned by host (the crawl layout) the window is
  * exchange-free. Zero UDFs.
  */
object Robots {

  /** Parse one robots.txt body into `array<struct<verdict, prefix>>`
    * — `Allow:`/`Disallow:` lines of the `User-agent: *` convention
    * (group handling: the caller passes the `*` group's text; a
    * crawler with its own token selects its group upstream). Empty
    * Disallow ("Disallow:" with no path — the RFC's allow-everything
    * idiom) and comments/foreign lines drop. */
  def parseRules(txt: Column): Column =
    filter(
      transform(split(txt, "\n"), l => struct(
        lower(trim(regexp_extract(l, "(?i)^\\s*(allow|disallow)\\s*:", 1)))
          .as("verdict"),
        trim(regexp_extract(l,
          "(?i)^\\s*(?:allow|disallow)\\s*:\\s*(\\S+)", 1)).as("prefix"))),
      s => s.getField("verdict") =!= "" && s.getField("prefix") =!= "")

  /** Decide every URL row against a rules table.
    *
    * @param urls  columns `host`, `path` (+ anything else, carried)
    * @param rules columns `host`, `verdict` (`allow`/`disallow`),
    *              `prefix`
    * @return urls + `matched_prefix` (longest match, "" when none)
    *         and `allowed` (1/0) — RFC 9309 §2.3.2: longest prefix
    *         wins, ties to allow, unmatched allowed. */
  def decide(urls: DataFrame, rules: DataFrame, keyCols: Seq[String])
    : DataFrame = {
    // a URL whose host has rules but none MATCHING must survive as
    // allowed — flag hits instead of filtering, then rank hits first
    val matched = urls
      .join(broadcast(rules), Seq("host"), "left")
      .withColumn("hit",
        col("prefix").isNotNull && col("path").startsWith(col("prefix")))
    // hits first, longest prefix first; 'allow' < 'disallow'
    // lexically = the RFC's tie resolution for free
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("hit").desc, length(col("prefix")).desc_nulls_last,
        col("verdict").asc)
    matched
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("matched_prefix",
        when(col("hit"), col("prefix")).otherwise(lit("")))
      .withColumn("allowed",
        when(!col("hit") || col("verdict") === "allow", 1).otherwise(0))
      .drop("rn", "hit", "verdict", "prefix")
  }
}
