package graft

import org.apache.spark.sql.functions._

/** Sketch support (approximate distinct counting). Deliberately NOT in
  * SparkEntry.queries: HLL implementations differ across engines, so
  * sketch estimates can never hash-match a DuckDB oracle — accuracy
  * and mergeability are asserted here instead. a8_distinct_counts
  * carries the exact-count twin in the oracle gate. */
class SketchSpec extends SparkSuite {

  test("approx_count_distinct within 5% of exact on testdata") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).first()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("hll sketches merge across partitions (the scale property)") {
    val li = Tables.lineitem(spark, sf)
    // per-group sketches unioned == sketch of the union (mergeability
    // is what makes the sketch computable map-side at 100 TB)
    val merged = li.groupBy("l_returnflag")
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .first().getLong(0)
    val direct = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))))
      .first().getLong(0)
    assert(merged == direct)
  }

  test("count-min sketch finds the heavy hitter without exact counting") {
    // CMS is the bounded-memory frequency sketch for heavy-hitter
    // screens at 100 TB (exact groupBy counts carry |distinct keys|
    // through the shuffle; the sketch is fixed-size and mergeable).
    // Estimates overcount only (collisions add), never undercount.
    val li = Tables.lineitem(spark, sf)
    val sketch = li.stat.countMinSketch(col("l_returnflag"),
      eps = 0.001, confidence = 0.99, seed = 42)
    val exact = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val heavy = exact.maxBy(_._2)
    for ((k, n) <- exact) {
      val est = sketch.estimateCount(k)
      assert(est >= n, s"CMS undercounted $k: $est < $n")
      assert(est <= n + (0.001 * exact.values.sum).toLong + 1,
        s"CMS overcount for $k beyond eps bound: $est vs $n")
    }
    assert(exact.keys.maxBy(sketch.estimateCount) == heavy._1)
  }
}
