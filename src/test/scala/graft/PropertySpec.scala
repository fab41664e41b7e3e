package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ops.Cleanse

/** Property tests (SURVEY.md §5: cleanse/recode idempotence) — the
  * Column expressions are checked against direct Scala ports of the
  * reference's Python semantics on generated inputs, batched through
  * one DataFrame per property for speed. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val junkString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '+', '-', '(',
      ')', '0', '5', '9', '.', '#'))).map(_.mkString)

  /** Direct port of `utils/tools.py:15-27`. */
  private def cleanContactRef(num: String): Option[String] = {
    if (num == null) return None
    val digits = num.filter(c => c == '+' || c.isDigit)
    if (digits.isEmpty) return None
    val stripped = digits.dropWhile(_ == '0')
    if (stripped.startsWith("5")) Some("+966" + stripped.take(12))
    else if (stripped.startsWith("9")) Some("+" + stripped.take(14))
    else Some(stripped.take(15))
  }

  private def runBatch(inputs: Seq[String],
                       f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Option[String]] = {
    inputs.toDF("s").select(f(col("s")).cast("string")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq
  }

  test("cleanContact expression == reference port on generated junk") {
    val inputs = Gen.listOfN(300, junkString).sample.get
    val got = runBatch(inputs, Cleanse.cleanContact)
    val want = inputs.map(cleanContactRef)
    inputs.lazyZip(got).lazyZip(want).foreach { (in, g, w) =>
      assert(g == w, s"input=[$in]")
    }
  }

  test("stripToNull is idempotent") {
    val inputs = Gen.listOfN(300,
      Gen.oneOf(junkString, Gen.const("   "), Gen.const(" NULL "))).sample.get
    val once  = runBatch(inputs, c => Cleanse.stripToNull(c, Seq("", "NULL")))
    val twice = runBatch(once.map(_.orNull),
      c => Cleanse.stripToNull(c, Seq("", "NULL")))
    assert(once == twice)
  }

  test("latLong is idempotent and NULL-absorbing") {
    val nums = Gen.listOfN(200, Gen.chooseNum(-2000.0, 2000.0)).sample.get
    val df = nums.toDF("x")
    val once = df.select(Cleanse.latLong(col("x")).as("a"))
    val twice = once.select(Cleanse.latLong(col("a")).cast("double").as("b"))
    val a = once.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val b = twice.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(a.sameElements(b))
    assert(a.zip(nums).forall { case (o, x) => (math.abs(x) > 999) == o.isEmpty })
  }

  test("quantized cosine is symmetric and bounded on random embeddings") {
    import graft.sim.Embeddings
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f)).map(_.toArray)
    val vecs = Gen.listOfN(30, vecGen).sample.get
      .filter(_.exists(_ != 0f)).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("vec_id", "embedding")
    val top = Embeddings.bruteForceTopK(df, df, "vec_id", "embedding", k = vecs.size)
    val sims = top.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    sims.foreach { case ((a, b), s) =>
      assert(s <= 1.0 + 1e-9 && s >= -1.0 - 1e-9, s"cos out of range: $s")
      assert(math.abs(s - sims((b, a))) < 1e-12, "asymmetric cosine")
    }
  }
}
