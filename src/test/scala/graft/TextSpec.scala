package graft

import org.apache.spark.sql.functions._
import graft.text.{MinHash, SimHash, TextAnalysis => TA}

class TextSpec extends SparkSuite {
  import spark.implicits._

  test("token stats on known text") {
    val df = Seq((1L, "the quick brown fox the end")).toDF("id", "text")
    val r = df.select(TA.tokenCount($"text"), TA.distinctTokenCount($"text"),
      TA.totalTokenLen($"text")).first()
    assert(r.getLong(0) == 6 && r.getLong(1) == 5 && r.getLong(2) == 22)
  }

  test("langId picks the marker-dominant language, en on ties") {
    val df = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "el gato y la casa es de x"),
      (3L, "the cat and the dog is a pet"),
      (4L, "nothing matching at all")).toDF("id", "text")
    val (_, _, _, pred) = TA.langId($"text")
    val got = df.select($"id", pred.as("p")).orderBy("id").collect().map(_.getString(1))
    assert(got.toSeq == Seq("de", "es", "en", "en"))
  }

  test("fingerprint is order-sensitive, stable across evaluation") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("id", "text")
    val fp = df.select($"id", TA.fingerprint($"text").as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1) == fp(3))
    assert(fp(1) != fp(2))
  }

  test("shingles: k-gram count and short-doc guard") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val sh = MinHash.shingles(df, "id", "text", 3)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1) == 2) // "a b c", "b c d"
    assert(!sh.contains(2)) // shorter than k → no shingles, no negative sequence
  }

  test("minhash LSH finds the planted near-duplicate and skips unrelated docs") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val pairs = MinHash.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("connectedComponents: chains merge transitively, singletons self-canonical") {
    import graft.text.DedupClusters
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 7L).toDF("id")
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = DedupClusters.connectedComponents(nodes, pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (5L, 5L), (6L, 5L), (7L, 7L)))
  }

  test("repetition signals: top-token run fold and duplicate-bigram fraction") {
    val df = Seq(
      (1L, "a b a b a"),        // top token 'a' x3 of 5; bigrams: ab ba ab ba -> 2/4 dup
      (2L, "x y z"),            // all distinct: top 1/3, bigrams xy yz -> 0 dup
      (3L, "w w w w"),          // degenerate repeat: top 4/4, bigrams all "w w" -> 2/3 dup
      (4L, "solo")              // single token: no bigrams -> frac 0.0
    ).toDF("id", "text")
    val r = df.select($"id", TA.topTokenCount($"text").as("top"),
      TA.dupBigramFrac($"text").as("dup"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((3L, 0.5)))
    assert(r(2L) == ((1L, 0.0)))
    assert(r(3L)._1 == 4L && math.abs(r(3L)._2 - (1.0 - 1.0 / 3.0)) < 1e-15)
    assert(r(4L) == ((1L, 0.0)))
  }

  test("passage dedup: first global occurrence wins, docs reassemble in order") {
    import graft.text.PassageDedup
    // k=2 passages: doc 1 = [a b][c d], doc 2 repeats [a b] then adds
    // [x y]; doc 3 repeats [a b] TWICE (cross-doc and within-doc dups)
    // and nothing else — it must survive as an empty row, not vanish
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b a b")).toDF("doc_id", "text")
    val r = PassageDedup.dedup(docs, $"text", k = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, 2L, "a b c d")))
    assert(r(2L) == ((2L, 1L, "x y")))
    assert(r(3L) == ((2L, 0L, "")))
    // trailing short passage is its own unit: [a b][c] vs [c] elsewhere
    val docs2 = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val r2 = PassageDedup.dedup(docs2, $"text", k = 2)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r2(1L) == "a b c")
    assert(r2(2L) == "") // doc 1's trailing [c] came first in doc order
  }

  test("simhash: identical docs equal, near docs close, distant docs far") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "completely different words entirely here now")).toDF("id", "text")
    val sigs = df.select($"id", SimHash.simhash($"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1) == sigs(2))
    val dist = df.sparkSession.range(1).select(
      SimHash.hamming(lit(sigs(1)), lit(sigs(3)))).first().getInt(0)
    assert(dist > 0)
  }

  test("dup spans: any-alignment overlap merges into one maximal span") {
    import graft.text.DupSpans
    // "abcdefghij" sits offset-shifted inside doc 2 — every one of its
    // 5-grams occurs in both docs, nothing else repeats
    val docs = Seq(
      (1L, "abcdefghij"),
      (2L, "zzabcdefghijyy")).toDF("doc_id", "text")
    val r = DupSpans.profile(docs, $"text", k = 5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))).toMap
    assert(r(1L) == ((10L, 10L, 1L, 1.0)))
    assert(r(2L)._1 == 14L && r(2L)._2 == 10L && r(2L)._3 == 1L)
    assert(math.abs(r(2L)._4 - 10.0 / 14) < 1e-12)
  }

  test("dup spans: within-document repetition counts (suffix-array rule)") {
    import graft.text.DupSpans
    // every 3-gram of "abcabcabc" recurs within the one document
    val docs = Seq((1L, "abcabcabc"), (2L, "qrstuvwxy"))
      .toDF("doc_id", "text")
    val r = DupSpans.profile(docs, $"text", k = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((9L, 1L)))
    assert(r(2L) == ((0L, 0L))) // clean doc keeps its row with zeros
  }

  test("html extraction: general markup, not just the generator's") {
    import graft.text.HtmlExtract
    // hand-written HTML exercising shapes the t29 generator never
    // emits: nested inline tags, script IN BODY, uppercase tags,
    // <br> splits, double-decode bait (&amp;lt; must yield literal
    // "&lt;", never "<"), a heading, and a link whose low density
    // keeps its line
    val html =
      "<HTML><HEAD><TITLE>x</TITLE></HEAD><BODY>" +
        "<h1>Big news today folks</h1>" +
        "<p>See <a href=\"/more\">the details</a> about this here " +
        "story now</p>" +
        "<script>var inBody = 'must not leak';</script>" +
        "<p>one &amp;lt; two escaped tokens stay literal</p>" +
        "<div>first half<br>tail too short</div>" +
        "<p><a href=\"/1\">spam</a> <a href=\"/2\">links</a> " +
        "<a href=\"/3\">forever</a></p>" +
        "</BODY></HTML>"
    val r = Seq(Tuple1(html)).toDF("html")
      .select(HtmlExtract.extract($"html").as("e"))
      .select($"e.n_blocks", $"e.n_kept", $"e.extracted").first()
    val extracted = r.getString(2)
    // blocks: h1, details-p, escaped-p, "first half", "tail too
    // short", spam-p = 6; kept: h1 + details + escaped + "tail too
    // short" (3 words) = 4
    assert(r.getLong(0) == 6, s"n_blocks: $r")
    assert(r.getLong(1) == 4, s"n_kept: $r")
    assert(extracted == "Big news today folks\n" +
      "See the details about this here story now\n" +
      "one &lt; two escaped tokens stay literal\n" +
      "tail too short", s"extracted: <$extracted>")
    assert(!extracted.contains("must not leak") && !extracted.contains("spam"))
  }

  test("entity decode: numeric + named table beyond the generator's") {
    import graft.text.HtmlExtract
    val cases = Seq(
      // numeric decimal / hex, incl. BMP beyond latin-1
      "caf&eacute; &#233; &#xe9;" -> "café é é",
      "a&mdash;b &#8212; &#x2014;" -> "a—b — —",
      "it&#x27;s &#39;quoted&#39;" -> "it's 'quoted'",
      // one entity per '&': the double-decode bait stays literal
      "&amp;lt; &amp;#39;" -> "&lt; &#39;",
      // unknown name, lone surrogate, out-of-range, bare '&' pass through
      "&zzz; &#xD800; &#999999; a&b &" -> "&zzz; &#xD800; &#999999; a&b &",
      "&euro;9 &copy; &laquo;x&raquo;" -> "€9 © «x»")
    val got = cases.map(_._1).toDF("s")
      .select($"s", HtmlExtract.decodeEntities($"s").as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((raw, want) <- cases)
      assert(got(raw) == want, s"<$raw> -> <${got(raw)}>, want <$want>")
  }

  test("url canonicalization: general forms, not just the generator's") {
    import graft.text.UrlCanon
    val cases = Seq(
      // default port + case + tracking + sort + fragment
      "HTTPS://WWW.Site.ORG:443/A/b?z=1&utm_medium=email&a=2#top" ->
        "https://www.site.org/A/b?a=2&z=1",
      // non-default port kept; path case preserved; gclid dropped
      "http://host.com:8080/Path?gclid=abc&b=1" ->
        "http://host.com:8080/Path?b=1",
      // empty path → /; all params tracking → query dropped
      "http://Host.com?utm_source=x&fbclid=y" -> "http://host.com/",
      // :80 is NOT default for https
      "https://h.io:80/x" -> "https://h.io:80/x",
      // param whose NAME merely contains 'utm_' mid-string survives
      "http://a.b/p?xutm_source=1" -> "http://a.b/p?xutm_source=1",
      // query anchors at the FIRST '?': a literal '?' inside the
      // value must not shear the first pair away
      "http://x.com/p?a=1?b=2" -> "http://x.com/p?a=1?b=2",
      // RFC 3986 §6.2.2.2: unreserved octets decode (%7e → ~,
      // %41 → A), reserved ones stay encoded but uppercase (%2a →
      // %2A) — in path and query alike
      "http://h.io/%7euser/%41b?x=%2a" -> "http://h.io/~user/Ab?x=%2A",
      // '%' not followed by two hex digits passes through untouched
      "http://h.io/100%valid" -> "http://h.io/100%valid",
      "http://h.io/x%" -> "http://h.io/x%")
    val got = cases.map(_._1).toDF("url")
      .select($"url", UrlCanon.canonicalize($"url").as("canon"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((raw, want) <- cases)
      assert(got(raw) == want, s"$raw -> ${got(raw)}, want $want")
  }

  test("robots filter: longest match, tie to allow, unmatched allowed") {
    import graft.text.Robots
    val rules = Seq(
      ("a.com", "disallow", "/x"),
      ("a.com", "allow", "/x/pub"),
      ("a.com", "allow", "/y"),
      ("a.com", "disallow", "/y"), // equal-length tie: allow must win
      ("b.org", "disallow", "/")).toDF("host", "verdict", "prefix")
    val urls = Seq(
      (1L, "a.com", "/x/secret"),   // blocked by /x
      (2L, "a.com", "/x/pub/page"), // longer /x/pub allows
      (3L, "a.com", "/z"),          // rules on host, none match
      (4L, "a.com", "/y/thing"),    // tie → allow
      (5L, "b.org", "/anything"),   // blanket block
      (6L, "c.net", "/no/rules"))   // host without rules
      .toDF("doc_id", "host", "path")
    val got = Robots.decide(urls, rules, Seq("doc_id"))
      .select("doc_id", "matched_prefix", "allowed").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got(1L) == (("/x", 0)), got(1L).toString)
    assert(got(2L) == (("/x/pub", 1)))
    assert(got(3L) == (("", 1)))
    assert(got(4L) == (("/y", 1)))
    assert(got(5L) == (("/", 0)))
    assert(got(6L) == (("", 1)))
    // parser: comments, empty-Disallow idiom, case variants, and
    // foreign directives (Sitemap:) all handled
    val parsed = Seq(Tuple1("User-agent: *\n# c\nDISALLOW: /a\n" +
        "allow: /a/b\nDisallow:\nSitemap: http://x\n"))
      .toDF("t")
      .select(explode(Robots.parseRules($"t")).as("r"))
      .select("r.verdict", "r.prefix").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(parsed == Set(("disallow", "/a"), ("allow", "/a/b")),
      parsed.toString)
  }

  test("robots groups: specific token beats *, matching groups combine") {
    import graft.text.Robots
    val txt =
      "User-agent: otherbot\nDisallow: /all\n" +
        "# comment between groups\n" +
        "User-agent: graftbot\nUser-agent: thirdbot\nDisallow: /g1\n" +
        "User-agent: *\nDisallow: /star\nAllow: /star/pub\n" +
        "User-agent: GraftBot\nAllow: /g2\n" // second match: must COMBINE
    val df = Seq(Tuple1(txt)).toDF("t")
    def sel(agent: String): String =
      df.select(Robots.selectGroup($"t", lit(agent)).as("g"))
        .first().getString(0)
    // exact token (case-insensitive) wins over *; both matching
    // groups' rules combine; the shared-run group (graftbot+thirdbot)
    // serves both tokens
    assert(sel("graftbot").contains("Disallow: /g1") &&
      sel("graftbot").contains("Allow: /g2") &&
      !sel("graftbot").contains("/star") &&
      !sel("graftbot").contains("/all"), sel("graftbot"))
    assert(sel("thirdbot").contains("Disallow: /g1") &&
      !sel("thirdbot").contains("/g2"))
    // unknown token falls back to the * group
    assert(sel("strangerbot").contains("Disallow: /star") &&
      sel("strangerbot").contains("Allow: /star/pub") &&
      !sel("strangerbot").contains("/g1"))
    // no * group and no token match -> "" (allow-all)
    val noStar = Seq(Tuple1("User-agent: otherbot\nDisallow: /x\n"))
      .toDF("t")
    assert(noStar.select(Robots.selectGroup($"t", lit("graftbot")))
      .first().getString(0) == "")
    // selected text feeds parseRules directly
    val rules = df.select(explode(Robots.parseRules(
        Robots.selectGroup($"t", lit("graftbot")))).as("r"))
      .select("r.verdict", "r.prefix").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rules == Set(("disallow", "/g1"), ("allow", "/g2")), rules)
  }

  test("robots wildcards: RFC 9309 * and $ rules, length-order ranking") {
    import graft.text.Robots
    val rules = Seq(
      ("a.com", "disallow", "/*.php$"),   // the RFC's own example shape
      ("a.com", "allow", "/pub/*.php$"),  // longer rule wins it back
      ("a.com", "disallow", "/f*o"),      // mid-pattern star, no anchor
      ("a.com", "disallow", "/d$ir"),     // mid-string $ is LITERAL
      ("b.org", "disallow", "/x*"),       // trailing star = prefix
      ("b.org", "allow", "/x"))           // tie vs /x* at len 2? no: /x* len 3
      .toDF("host", "verdict", "prefix")
    val urls = Seq(
      (1L, "a.com", "/a.php"),        // blocked by /*.php$
      (2L, "a.com", "/a.php3"),       // $ anchor → NOT matched, allowed
      (3L, "a.com", "/x/y.php"),      // * spans directories → blocked
      (4L, "a.com", "/pub/i.php"),    // /pub/*.php$ (11) > /*.php$ (7)
      (5L, "a.com", "/foooo"),        // /f*o matches anywhere-prefix
      (6L, "a.com", "/d$ir/z"),       // literal $ inside path
      (7L, "a.com", "/d/ir"),         // $ NOT a wildcard mid-string
      (8L, "b.org", "/xyz"))          // /x* (3) beats allow /x (2)
      .toDF("doc_id", "host", "path")
    val got = Robots.decide(urls, rules, Seq("doc_id"))
      .select("doc_id", "matched_prefix", "allowed").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got(1L) == (("/*.php$", 0)), got(1L).toString)
    assert(got(2L) == (("", 1)), got(2L).toString)
    assert(got(3L) == (("/*.php$", 0)))
    assert(got(4L) == (("/pub/*.php$", 1)))
    assert(got(5L) == (("/f*o", 0)))
    assert(got(6L) == (("/d$ir", 0)))
    assert(got(7L) == (("", 1)))
    assert(got(8L) == (("/x*", 0)))
  }

  test("warc records: content-length accounting survives delimiter bait") {
    import graft.text.WarcExtract
    // payload contains BOTH the record terminator and a fake record
    // magic — a delimiter-split parser would shear here; the
    // length-accounted walk must not
    val bait = "first\r\n\r\nWARC/1.0\r\nsecond"
    val warc =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a/\r\n" +
        s"Content-Length: ${bait.length}\r\n\r\n$bait\r\n\r\n" +
        "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nok\r\n\r\n" +
        "trailing garbage without magic"
    val r = Seq(Tuple1(warc)).toDF("w")
      .select(WarcExtract.records($"w").as("recs"))
      .selectExpr("size(recs) AS n", "recs[0].rtype", "recs[0].uri",
        "recs[0].payload", "recs[1].rtype", "recs[1].payload").first()
    assert(r.getInt(0) == 2, s"garbage must stop the walk: $r")
    assert(r.getString(1) == "response" && r.getString(2) == "http://a/")
    assert(r.getString(3) == bait, s"payload sheared: <${r.getString(3)}>")
    assert(r.getString(4) == "metadata" && r.getString(5) == "ok")
    // http helpers: body after the header terminator, status parsed
    val h = Seq(Tuple1("HTTP/1.1 301 Moved\r\nLocation: x\r\n\r\nbody\r\n\r\nmore"))
      .toDF("p").select(WarcExtract.httpStatus($"p"),
        WarcExtract.httpBody($"p")).first()
    assert(h.getInt(0) == 301 && h.getString(1) == "body\r\n\r\nmore")
  }

  test("warc walk: slot exhaustion reports truncation, malformed tail does not") {
    import graft.text.WarcExtract
    def rec(i: Int) =
      s"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 4\r\n\r\np$i-x\r\n\r\n"
    // 9 clean records against the default 8-slot budget: the 9th is
    // un-walked CLEAN data — must be loud, not silent
    val nine = (0 until 9).map(rec).mkString
    // 2 records then garbage: the walk stops by design — no truncation
    val garbaged = (0 until 2).map(rec).mkString + "no magic here"
    val r = Seq((nine, 1), (garbaged, 2)).toDF("w", "k")
      .select($"k", WarcExtract.walk($"w").as("s"), length($"w").as("len"))
      .selectExpr("k", "size(s.recs) AS n", "s.consumed_bytes",
        "s.truncated", "len")
      .collect().map(x => x.getInt(0) ->
        ((x.getInt(1), x.getLong(2), x.getBoolean(3), x.getInt(4)))).toMap
    val (n1, c1, t1, l1) = r(1)
    assert(n1 == 8 && t1, s"9-record capsule must truncate: ${r(1)}")
    assert(c1 == l1 - rec(8).length.toLong,
      s"consumed must stop before the 9th record: ${r(1)}")
    val (n2, c2, t2, _) = r(2)
    assert(n2 == 2 && !t2, s"malformed tail is not truncation: ${r(2)}")
    assert(c2 == 2L * rec(0).length)
    // a fully-walked capsule consumes every byte and is not truncated
    val full = Seq(Tuple1((0 until 8).map(rec).mkString)).toDF("w")
      .select(WarcExtract.walk($"w").as("s"), length($"w").as("len"))
      .selectExpr("size(s.recs)", "s.consumed_bytes", "s.truncated", "len")
      .first()
    assert(full.getInt(0) == 8 && !full.getBoolean(2) &&
      full.getLong(1) == full.getInt(3).toLong, s"full walk: $full")
  }

  test("http decode: chunked framing, content codings, charset sniff order") {
    import graft.text.HttpDecode
    def carrier(b: Array[Byte]): String = new String(b, "ISO-8859-1")
    def gz(s: String, cs: String) = carrier(
      graft.expressions.HttpCodecFuncs.gzip(s.getBytes(cs)))
    def zl(s: String, cs: String) = carrier(
      graft.expressions.HttpCodecFuncs.zlib(s.getBytes(cs)))
    val htmlLatin = "<meta charset=\"iso-8859-1\"><p>Café ole si</p>"
    val rows = Seq(
      // identity + header charset
      (1L, "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "Content-Length: 11\r\n\r\n<p>a b c</p>"),
      // chunked with extension, uppercase hex size, trailer field
      (2L, "HTTP/1.1 200 OK\r\nTransfer-Encoding: CHUNKED\r\n\r\n" +
        "5;ext=1\r\n<p>a \r\nC\r\nAbc defg</p>\r\n0\r\nX-Trailer: v\r\n\r\n"),
      // gzip body, no charset anywhere -> utf-8 default (é multibyte)
      (3L, "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" +
        gz("<p>café au lait</p>", "UTF-8")),
      // chunked + deflate(zlib) + meta-sniffed latin-1
      (4L, {
        val body = zl(htmlLatin, "ISO-8859-1")
        f"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
          f"Content-Encoding: deflate\r\n\r\n${body.length}%x\r\n$body%s\r\n0\r\n\r\n"
      }),
      // raw deflate under the deflate token (the real-web deviation)
      (5L, "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + {
        val d = new java.util.zip.Deflater(-1, true)
        d.setInput("<p>raw x y</p>".getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](256); val n = d.deflate(buf); d.end()
        carrier(java.util.Arrays.copyOf(buf, n))
      })).toDF("id", "payload")
    val dec = rows.select($"id",
      HttpDecode.decodeResponse($"payload").as("d")).orderBy("id")
      .select($"id", $"d.status", $"d.transfer_encoding",
        $"d.content_encoding", $"d.charset", $"d.body").collect()
    assert(dec(0).getInt(1) == 200 && dec(0).getString(5) == "<p>a b c</p>")
    assert(dec(0).getString(4) == "utf-8")
    assert(dec(1).getString(2) == "chunked" &&
      dec(1).getString(5) == "<p>a Abc defg</p>")
    assert(dec(2).getString(3) == "gzip" &&
      dec(2).getString(5) == "<p>café au lait</p>")
    assert(dec(3).getString(4) == "iso-8859-1" &&
      dec(3).getString(5) == htmlLatin)
    assert(dec(4).getString(5) == "<p>raw x y</p>")
    // torn chunk framing refuses loudly instead of emitting a prefix
    val torn = Seq(("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nabcde\r\nff\r\nshort")).toDF("payload")
    val e = intercept[Exception](
      torn.select(HttpDecode.decodeResponse($"payload")).collect())
    assert(e.getMessage.contains("chunked body torn") ||
      e.getCause != null && e.getCause.getMessage.contains("chunked body torn"),
      e.getMessage)
    // generator round trip: every variant decodes back to the html
    val html = "<p>générateur test</p>"
    val gen = Seq(0, 1, 2, 3).toDF("v")
      .select($"v", HttpDecode.encodeResponse(lit(html), $"v",
        lit("utf-8"), $"v" <= 1).as("p"))
    val back = gen.select($"v",
      HttpDecode.decodeResponse($"p").as("d")).orderBy("v")
      .select($"d.body", $"d.charset").collect()
    assert(back.forall(_.getString(0) == html))
    // latin-1 generator + meta sniff (no header charset)
    val genL = Seq(3).toDF("v").select(HttpDecode.encodeResponse(
      lit(htmlLatin), $"v", lit("iso-8859-1"), lit(false)).as("p"))
    val backL = genL.select(HttpDecode.decodeResponse($"p").as("d"))
      .select($"d.body", $"d.charset").first()
    assert(backL.getString(0) == htmlLatin &&
      backL.getString(1) == "iso-8859-1")
    // windows-1252: C1 range decodes to glyphs (smart quotes, €, —),
    // undefined C1 bytes pass through; plain latin-1 must NOT remap
    val w1252bytes = Array[Byte](
      '<', 'p', '>', 0x93.toByte, 'a', 0x94.toByte, ' ',
      0x85.toByte, ' ', 0x80.toByte, 0x96.toByte, 0x81.toByte,
      '<', '/', 'p', '>')
    val wPayload = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=windows-1252\r\n\r\n" +
      carrier(w1252bytes)
    val wGot = Seq(Tuple1(wPayload)).toDF("payload")
      .select(HttpDecode.decodeResponse($"payload").as("d"))
      .select($"d.body", $"d.charset").first()
    assert(wGot.getString(0) == "<p>\u201ca\u201d \u2026 \u20ac\u2013\u0081</p>",
      wGot.getString(0))
    assert(wGot.getString(1) == "windows-1252")
    val lPayload = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=iso-8859-1\r\n\r\n" +
      carrier(w1252bytes)
    val lGot = Seq(Tuple1(lPayload)).toDF("payload")
      .select(HttpDecode.decodeResponse($"payload").as("d"))
      .select($"d.body").first().getString(0)
    assert(lGot.contains("a"), "latin-1 must keep C1 as-is")
  }

  test("crawl-delay: max of parsed lines, malformed/absent -> null") {
    import graft.text.Robots
    val cases = Seq(
      ("User-agent: *\nCrawl-delay: 5\nDisallow: /x\n", java.lang.Long.valueOf(5L)),
      // several directives: the conservative (max) read
      ("Crawl-delay: 2\ncrawl-DELAY:  7 \nCrawl-delay: 3\n", java.lang.Long.valueOf(7L)),
      // fractional and garbage values are ignored, never blocking
      ("Crawl-delay: 1.5\nCrawl-delay: soon\n", null),
      ("User-agent: *\nDisallow:\n", null))
    val got = cases.toDF("txt", "want")
      .select(Robots.crawlDelay($"txt").as("got"), $"want").collect()
    got.foreach(r => assert(r.get(0) == r.get(1),
      s"crawlDelay mismatch: got ${r.get(0)} want ${r.get(1)}"))
  }

  test("pii scrub: general forms, not just the generator's") {
    val cases = Seq(
      // emails: mixed case, plus/percent tags, subdomains, adjacent punct
      ("mail First.Last+tag@sub.Example.CO.uk end", "mail <EMAIL> end"),
      ("x a%b_c-d@dom-1.io, y", "x <EMAIL>, y"),
      // phones: NANP ddd-ddd-dddd only; partial or longer runs survive
      ("call 555-867-5309 now", "call <PHONE> now"),
      ("order 12-345-6789 stays", "order 12-345-6789 stays"),
      // ipv4 dotted quads; version-like triples survive
      ("host 192.168.0.1 up", "host <IP> up"),
      ("spark 4.1.2 is not an ip", "spark 4.1.2 is not an ip"),
      // email-first: a numeric-label domain with an alpha TLD is one
      // EMAIL, not an address wrapped around an IP; a TLD-less
      // ip-literal mailbox is out of email scope and the quad masks
      ("a user@1.2.3.org b", "a <EMAIL> b"),
      ("a user@10.0.0.1 b", "a user@<IP> b"),
      // all three in one row
      ("e@x.org 555-000-1111 8.8.8.8", "<EMAIL> <PHONE> <IP>"))
    val got = cases.toDF("text", "want")
      .select(TA.piiScrub($"text").as("got"), $"want").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"scrub mismatch: got '${r.getString(0)}' want '${r.getString(1)}'"))
  }

  test("dup spans: gap wider than k splits islands; short docs no grams") {
    import graft.text.DupSpans
    // two shared 6-char regions separated by >k unique filler on each
    // side → two spans in each doc; doc 3 is shorter than k
    val docs = Seq(
      (1L, "AAAAAA 123456789 BBBBBB"),
      (2L, "AAAAAA 987654321 BBBBBB"),
      (3L, "tiny")).toDF("doc_id", "text")
    val r = DupSpans.profile(docs, $"text", k = 6).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    // shared regions are "AAAAAA " and " BBBBBB" (7 chars each: the
    // adjoining space windows also match)
    assert(r(1L)._2 == 2L && r(2L)._2 == 2L)
    assert(r(1L) == r(2L))
    assert(r(3L) == ((0L, 0L)))
  }
}
