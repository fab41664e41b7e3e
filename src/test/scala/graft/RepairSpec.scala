package graft

import org.apache.spark.sql.functions._
import graft.ops.Repair

class RepairSpec extends SparkSuite {
  import spark.implicits._

  test("fixCheckout derives the missing third value (tools.py:43-55)") {
    // (subtotal, grandTotal, tax, discountTotal) → expected repaired triple
    val rows = Seq(
      (0.0, 110.0, 10.0, 0.0),   // missing subtotal → gt - tax + disc = 100
      (100.0, 0.0, 10.0, 0.0),   // missing grandTotal → sub - disc + tax = 110
      (100.0, 110.0, 0.0, 0.0),  // missing tax → gt - sub + disc = 10
      (100.0, 110.0, 10.0, 5.0), // all present → unchanged
      (0.0, 0.0, 10.0, 5.0)      // only one present → unchanged
    ).toDF("sub", "gt", "tax", "disc")
    val (s, g, t) = Repair.fixCheckout(col("sub"), col("gt"), col("tax"), col("disc"))
    val got = rows.select(s.as("s"), g.as("g"), t.as("t")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(got(0) == ((100.0, 110.0, 10.0)))
    assert(got(1) == ((100.0, 110.0, 10.0)))
    assert(got(2) == ((100.0, 110.0, 10.0)))
    assert(got(3) == ((100.0, 110.0, 10.0)))
    assert(got(4) == ((0.0, 0.0, 10.0)))
  }

  test("ratioGuarded: zero and null denominators → ifZero, not inf/NaN") {
    val df = Seq((10.0, 2.0), (10.0, 0.0)).toDF("n", "d")
    val got = df.select(Repair.ratioGuarded(col("n"), col("d")).as("r"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(5.0, 0.0))
  }

  test("discountBackfill mutual repair (orders.py:116-117)") {
    val df = Seq(
      (0.0, 10.0, 200.0),  // total missing → 10% of 200 = 20
      (30.0, 0.0, 200.0),  // percent missing → 30/200 = 0.15
      (30.0, 0.0, 0.0)     // zero subtotal → percent 0-guarded
    ).toDF("total", "pct", "sub")
    val (t, p) = Repair.discountBackfill(col("total"), col("pct"), col("sub"))
    val got = df.select(t.as("t"), p.as("p")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got(0) == ((20.0, 10.0)))
    assert(got(1) == ((30.0, 0.15)))
    assert(got(2) == ((30.0, 0.0)))
  }

  test("plusOneYear clamps month-end like pandas DateOffset") {
    val df = Seq("2020-02-29").toDF("d")
    val got = df.select(Repair.plusOneYear(col("d")).cast("string")).first().getString(0)
    assert(got == "2021-02-28")
  }
}
