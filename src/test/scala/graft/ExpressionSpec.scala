package graft

import org.apache.spark.sql.functions._
import graft.expressions.SimHash64

class ExpressionSpec extends SparkSuite {
  import spark.implicits._

  test("simhash64: identical text equal, different text differs, null-safe") {
    val df = Seq(Some("alpha beta gamma"), Some("alpha beta gamma"),
      Some("other words here"), None).toDF("text")
    val got = df.select(SimHash64.simhash64($"text").as("h")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0) == got(1))
    assert(got(0) != got(2))
    assert(got(0).isDefined)
    assert(got(3).isEmpty)
  }

  test("simhash64 single-token text = md5 top-64-bits sign pattern") {
    // with one token every bit sum is ±1, so the simhash IS the top
    // 64 bits of md5(token)
    val tok = "hello"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val expected = (0 until 64).foldLeft(0L) { (acc, j) =>
      if (((digest(j >> 3) >> (7 - (j & 7))) & 1) == 1) acc | (1L << (63 - j)) else acc
    }
    val got = Seq(tok).toDF("text")
      .select(SimHash64.simhash64($"text")).first().getLong(0)
    assert(got == expected)
  }

  test("simhash64 registered as SQL function and codegen-evaluated") {
    SimHash64.register(spark)
    val viaSql = spark.sql("SELECT simhash64('a b c') AS h").first().getLong(0)
    val viaCol = Seq("a b c").toDF("text")
      .select(SimHash64.simhash64($"text")).first().getLong(0)
    assert(viaSql == viaCol)
  }

  test("simhash64 matches split() token semantics incl. trailing/empty segments") {
    val df = Seq("a", "a ", "", " ").toDF("text")
    val h = df.select(SimHash64.simhash64($"text")).collect().map(_.getLong(0))
    // "a " = ["a",""] ≠ "a" = ["a"]
    assert(h(0) != h(1))
    // "" = [""] → single-token signature = top 64 bits of md5("")
    val d = java.security.MessageDigest.getInstance("MD5").digest(Array.emptyByteArray)
    val emptySig = (0 until 64).foldLeft(0L) { (acc, j) =>
      if (((d(j >> 3) >> (7 - (j & 7))) & 1) == 1) acc | (1L << (63 - j)) else acc
    }
    assert(h(2) == emptySig)
    // " " = ["",""] → two identical tokens → same sign pattern
    assert(h(3) == emptySig)
  }

  test("nfc: recomposes decomposed sequences, null-safe, SQL-registered") {
    import graft.expressions.NfcNormalize
    val decomposed = "cafe\u0301 zu\u0308rich"   // e + U+0301, u + U+0308
    val composed   = "caf\u00e9 z\u00fcrich"     // precomposed NFC forms
    val df = Seq(Some(decomposed), Some(composed), Some("plain ascii"), None)
      .toDF("text")
    val got = df.select(NfcNormalize.nfc($"text").as("n"),
        length($"text").as("lr"), length(NfcNormalize.nfc($"text")).as("ln"))
      .collect()
    assert(got(0).getString(0) == composed)          // recomposed
    assert(got(0).getInt(1) == got(0).getInt(2) + 2) // two marks merged
    assert(got(1).getString(0) == composed)          // already-NFC unchanged
    assert(got(2).getString(0) == "plain ascii")     // ASCII fast path
    assert(got(3).isNullAt(0))                       // null-safe
    // SQL surface
    NfcNormalize.register(spark)
    df.createOrReplaceTempView("nfc_docs")
    val viaSql = spark.sql("SELECT nfc(text) FROM nfc_docs").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(viaSql(0).contains(composed) && viaSql(3).isEmpty)
  }

  test("near-duplicate texts have small hamming distance at 64 bits") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, base + " extra"),
      (3L, (100 to 140).map(i => s"zzz$i").mkString(" "))).toDF("id", "text")
    val h = df.select($"id", SimHash64.simhash64($"text").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(3L)))
    assert(ham(h(1L), h(2L)) <= 8)
  }
  test("bpe_token_count: priority merges, hand-computed values, codegen") {
    import graft.expressions.{BpeFuncs, BpeTokenCount}
    // hand-derived under the fixed merges table (priority order,
    // merge-all-occurrences): "the"->[the], "then"->[the,n],
    // "and"->[and], "interesting"->[in,t,er,es,t,ing],
    // "started"->[st,ar,t,e,d] (te|d never fires: t|e is not a rule),
    // "aaa" has no a|a rule -> 3 chars, "xyz" merges nothing
    assert(BpeFuncs.tokensOf("the") == 1)
    assert(BpeFuncs.tokensOf("then") == 2)
    assert(BpeFuncs.tokensOf("and") == 1)
    assert(BpeFuncs.tokensOf("interesting") == 6)
    assert(BpeFuncs.tokensOf("started") == 5)
    assert(BpeFuncs.tokensOf("aaa") == 3)
    assert(BpeFuncs.tokensOf("xyz") == 3)
    assert(BpeFuncs.tokensOf("") == 0)
    // whole-document: [A-Za-z]+ words, ASCII lowercasing, everything
    // else a separator: "The THEN and?? started33xyz" ->
    // the(1) + then(2) + and(1) + started(5) + xyz(3) = 12
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeFuncs.countTokens(
      UTF8String.fromString("The THEN and?? started33xyz")) == 12L)
    assert(BpeFuncs.countTokens(UTF8String.fromString("")) == 0L)
    assert(BpeFuncs.countTokens(UTF8String.fromString("?!3 9")) == 0L)

    // expression path (codegen) agrees with the kernel; null-safe
    import spark.implicits._
    val df = Seq((1L, "The THEN and?? started33xyz"), (2L, ""),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.select($"id",
      BpeTokenCount.bpeTokenCount($"t").as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 12L, 2L -> 0L, 3L -> -1L))

    // SQL registration
    BpeTokenCount.register(spark)
    df.createOrReplaceTempView("bpe_docs")
    val sql = spark.sql(
      "SELECT id, bpe_token_count(t) AS n FROM bpe_docs WHERE t IS NOT NULL")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql == Map(1L -> 12L, 2L -> 0L))
  }

  test("http codec: gzip/zlib/raw inflate round trips, corrupt refusals") {
    import graft.expressions.{HttpCodecFuncs => F, HttpCodec}
    import spark.implicits._
    val payloads = Seq("hello".getBytes("UTF-8"), Array.empty[Byte],
      Array.tabulate(100000)(i => (i % 253).toByte))
    for (b <- payloads if b.nonEmpty) {
      assert(F.inflate(F.gzip(b)).toSeq == b.toSeq)
      assert(F.inflate(F.zlib(b)).toSeq == b.toSeq)
      // raw deflate (no container) sniffs through too
      val d = new java.util.zip.Deflater(-1, true)
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      assert(F.inflate(out.toByteArray).toSeq == b.toSeq)
    }
    // corrupt gzip CRC refuses (GzipMemberIterator contract)
    val g = F.gzip("corrupt me please".getBytes)
    g(12) = (g(12) ^ 0x40).toByte
    intercept[Exception](F.inflate(g))
    // truncated zlib refuses
    val z = F.zlib("truncate me now please".getBytes)
    intercept[Exception](F.inflate(java.util.Arrays.copyOf(z, z.length - 4)))
    // expression path (codegen): round trip + null-safety
    val df = Seq((1L, "x y z"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.select($"id", org.apache.spark.sql.functions.decode(
        HttpCodec.inflate(HttpCodec.gzipCompress(
          org.apache.spark.sql.functions.encode($"t", "UTF-8"))), "UTF-8")
        .as("r")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(got == Map(1L -> "x y z", 2L -> null))
  }
}
