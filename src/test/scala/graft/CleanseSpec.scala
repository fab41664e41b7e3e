package graft

import org.apache.spark.sql.functions._
import graft.ops.Cleanse

/** Edge-case semantics ported from the reference's behavior
  * (`utils/tools.py`): these are the values FIXTURES.md says fixtures
  * must cover. */
class CleanseSpec extends SparkSuite {
  import spark.implicits._

  private def one(input: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Option[String] = {
    val df = Seq(Option(input)).toDF("s")
    Option(df.select(c(col("s")).cast("string")).first().getString(0))
  }

  test("cleanContact matches reference branch semantics (tools.py:15-27)") {
    // local 05xx → strip leading 0 → starts with 5 → +966 prefix
    assert(one("0501234567", Cleanse.cleanContact).contains("+966501234567"))
    // already-intl 00966… → strip 0s → starts with 9 → '+' prefix
    assert(one("00966501234567", Cleanse.cleanContact).contains("+966501234567"))
    // punctuation stripped before rules
    assert(one("+966 50-123", Cleanse.cleanContact).contains("+96650123"))
    // other-country numbers pass through truncated to 15
    assert(one("12345678901234567890", Cleanse.cleanContact).contains("123456789012345"))
    // junk-only and empty → NULL
    assert(one("abc", Cleanse.cleanContact).isEmpty)
    assert(one("", Cleanse.cleanContact).isEmpty)
    assert(one(null, Cleanse.cleanContact).isEmpty)
  }

  test("cleanContact truncation: 5-branch keeps 12 chars, 9-branch keeps 14") {
    assert(one("5123456789012345", Cleanse.cleanContact).contains("+966512345678901"))
    assert(one("91234567890123456", Cleanse.cleanContact).contains("+91234567890123"))
  }

  test("parseDate2 parses both reference formats, null on garbage (tools.py:30-40)") {
    assert(one("May 29 2020 8:39AM", Cleanse.parseDate2).contains("2020-05-29 08:39:00"))
    assert(one("3/3/2025 1:28:20 PM", Cleanse.parseDate2).contains("2025-03-03 13:28:20"))
    assert(one("29/05/2020", Cleanse.parseDate2).isEmpty)
    assert(one("garbage", Cleanse.parseDate2).isEmpty)
    assert(one(null, Cleanse.parseDate2).isEmpty)
  }

  test("stripToNull: trim, empty→NULL, literal 'NULL'→NULL (cars.py:70-72)") {
    def f(s: String) = one(s, c => Cleanse.stripToNull(c, Seq("", "NULL")))
    assert(f("  x ").contains("x"))
    assert(f("   ").isEmpty)
    assert(f(" NULL ").isEmpty)
    assert(f("NULLable").contains("NULLable"))
  }

  test("latLong: 6dp quantization + out-of-domain NULL (locations.py:75-80)") {
    def f(s: String) = one(s, Cleanse.latLong)
    assert(f("46.6752950001").contains("46.675295"))
    assert(f("1000.5").isEmpty)
    assert(f("-1000.5").isEmpty)
    assert(f("999.0").contains("999.0"))
    assert(f("not a number").isEmpty)
  }

  test("whitelist keeps only allowed values (locations.py:89)") {
    val df = Seq(1, 2, 3, 4, 99).toDF("v")
    val kept = df.select(Cleanse.whitelist(col("v"), Seq(1, 2, 3)).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(kept.toSeq == Seq(Some(1), Some(2), Some(3), None, None))
  }
}
