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
}
