package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt politeness filtering (RFC 9309) — the gate a crawl
  * pipeline applies between URL canonicalization and fetch/keep: a
  * URL is kept iff the LONGEST matching rule for its host allows it
  * (ties break toward Allow, no match means allowed — the RFC's
  * resolution order), with the `*`/`$` wildcards §2.2.3 makes
  * MANDATORY honored via per-rule anchored regexes ([[ruleRegex]] —
  * real-web rules like `Disallow: /a*.php$` are common, and
  * prefix-only matching silently mis-gates them). Part of the
  * LLM-pipeline extension surface next to
  * [[UrlCanon]]/[[HtmlExtract]]; the pandas reference has no crawl
  * surface at all.
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
    * — `Allow:`/`Disallow:` lines (pass a whole single-group file, or
    * [[selectGroup]]'s output for multi-group files). Empty Disallow
    * ("Disallow:" with no path — the RFC's allow-everything idiom)
    * and comments/foreign lines drop. */
  def parseRules(txt: Column): Column =
    filter(
      transform(split(txt, "\n"), l => struct(
        lower(trim(regexp_extract(l, "(?i)^\\s*(allow|disallow)\\s*:", 1)))
          .as("verdict"),
        trim(regexp_extract(l,
          "(?i)^\\s*(?:allow|disallow)\\s*:\\s*(\\S+)", 1)).as("prefix"))),
      s => s.getField("verdict") =!= "" && s.getField("prefix") =!= "")

  /** A rule path as the anchored regex RFC 9309 §2.2.3 REQUIRES:
    * `*` matches any character sequence, a TRAILING `$` anchors the
    * end of the path (elsewhere `$` is literal — the de-facto
    * interpretation every major implementation shares); all other
    * regex metacharacters escape to literals. Pure Column — built
    * per rule row at match time (the rules side is tiny and
    * broadcast; the per-URL side never builds regexes). */
  def ruleRegex(p: Column): Column = {
    val anchored = p.endsWith("$")
    val body = when(anchored, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val esc = regexp_replace(body, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** `Crawl-delay: N` seconds from a robots group's text — the
    * de-facto politeness extension (absent from RFC 9309 but honored
    * by most crawlers and very common in the wild). Max over the
    * group's lines when several appear (the conservative read), NULL
    * when none — callers supply their default pacing. Fractional and
    * malformed values parse as absent (the major-crawler behavior:
    * unparsable directives are ignored, never fetch-blocking). */
  def crawlDelay(txt: Column): Column =
    array_max(transform(
      filter(split(txt, "\n"),
        l => l.rlike("(?i)^\\s*crawl-delay\\s*:\\s*[0-9]+\\s*$")),
      l => regexp_extract(l, "(?i)^\\s*crawl-delay\\s*:\\s*([0-9]+)", 1)
        .cast("long")))

  /** RFC 9309 §2.2.1 GROUP SELECTION, pure Column: a robots.txt is a
    * sequence of groups (a run of consecutive `User-agent:` lines
    * followed by their rules); a crawler uses the group(s) whose
    * product token matches it case-insensitively EXACTLY, else the
    * `*` group(s), else nothing (allow-all). When several groups
    * match at the winning specificity their rules COMBINE (the RFC's
    * merge requirement). Returns the selected groups' rule text,
    * ready for [[parseRules]] — "" when no group matches. One fold
    * over the lines per row; group count is bounded by the text, not
    * a slot budget. */
  def selectGroup(txt: Column, agent: Column): Column = {
    val tagged = aggregate(
      split(txt, "\n"),
      struct(lit(0).as("gid"), lit(false).as("prevUA"),
        array().cast("array<struct<gid:int,ua:string,rule:string>>")
          .as("acc")),
      (st, l) => {
        val isUA = l.rlike("(?i)^\\s*user-agent\\s*:")
        val uaVal = lower(trim(regexp_extract(l,
          "(?i)^\\s*user-agent\\s*:\\s*(\\S+)", 1)))
        // a UA line FOLLOWING a non-UA line opens a new group;
        // consecutive UA lines share one group (the RFC's run rule)
        val gid = when(isUA && !st.getField("prevUA"),
          st.getField("gid") + 1).otherwise(st.getField("gid"))
        val entry = struct(gid.as("gid"),
          when(isUA, uaVal).as("ua"),
          when(!isUA, l).as("rule"))
        struct(gid.as("gid"), isUA.as("prevUA"),
          concat(st.getField("acc"), array(entry)).as("acc"))
      },
      st => st.getField("acc"))
    element_at(transform(array(tagged), acc => {
      val maxGid = coalesce(
        array_max(transform(acc, e => e.getField("gid"))), lit(0))
      val gids = when(maxGid >= 1, sequence(lit(1), maxGid))
        .otherwise(array().cast("array<int>"))
      val groups = transform(gids, g => {
        val mine = filter(acc, e => e.getField("gid") === g)
        val uas = filter(mine, e => e.getField("ua").isNotNull)
        val spec =
          when(exists(uas, u => u.getField("ua") === lower(agent)), 2)
            .when(exists(uas, u => u.getField("ua") === "*"), 1)
            .otherwise(0)
        struct(spec.as("spec"),
          array_join(transform(
            filter(mine, e => e.getField("rule").isNotNull),
            e => e.getField("rule")), "\n").as("body"))
      })
      val best = coalesce(
        array_max(transform(groups, s => s.getField("spec"))), lit(0))
      when(best > 0, array_join(transform(
        filter(groups, s => s.getField("spec") === best),
        s => s.getField("body")), "\n")).otherwise(lit(""))
    }), 1)
  }

  /** Decide every URL row against a rules table.
    *
    * @param urls  columns `host`, `path` (+ anything else, carried)
    * @param rules columns `host`, `verdict` (`allow`/`disallow`),
    *              `prefix` (a rule path, `*`/`$` wildcards included)
    * @return urls + `matched_prefix` (the winning rule's path, ""
    *         when none) and `allowed` (1/0) — RFC 9309 §2.3.2: the
    *         longest (most-octets) matching RULE wins, ties to
    *         Allow, unmatched allowed. */
  def decide(urls: DataFrame, rules: DataFrame, keyCols: Seq[String])
    : DataFrame = {
    // a URL whose host has rules but none MATCHING must survive as
    // allowed — flag hits instead of filtering, then rank hits first.
    // The regex TEXT builds on the rules side (once per rule, inside
    // the broadcast build), not per joined row; the per-evaluation
    // Pattern compile that a non-foldable rlike pays is the
    // documented residual (rules are chars-long — compile is µs)
    val matched = urls
      .join(broadcast(rules.withColumn("rrx", ruleRegex(col("prefix")))),
        Seq("host"), "left")
      .withColumn("hit",
        col("prefix").isNotNull && regexp_like(col("path"), col("rrx")))
    // hits first, longest RULE first (octet length, wildcards
    // counted — the RFC's specificity order); 'allow' < 'disallow'
    // lexically = the RFC's tie resolution for free; the final
    // rule-text key makes the WINNING RULE deterministic when two
    // same-verdict same-length rules both match
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("hit").desc, length(col("prefix")).desc_nulls_last,
        col("verdict").asc, col("prefix").asc_nulls_last)
    matched
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("matched_prefix",
        when(col("hit"), col("prefix")).otherwise(lit("")))
      .withColumn("allowed",
        when(!col("hit") || col("verdict") === "allow", 1).otherwise(0))
      .drop("rn", "hit", "verdict", "prefix", "rrx")
  }
}
