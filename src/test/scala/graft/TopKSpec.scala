package graft

import org.apache.spark.sql.functions._
import graft.expressions.TopKStructs

class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("top_k equals the row_number window formulation on testdata") {
    val part = Tables.part(spark, sf)
    val viaAgg = part.groupBy($"p_brand")
      .agg(TopKStructs.topK(
        struct($"p_retailprice", $"p_partkey"), 3, Seq(true, false)).as("top"))
      .select($"p_brand", explode($"top").as("t"))
      .select($"p_brand", $"t.p_partkey".as("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"p_brand")
      .orderBy($"p_retailprice".desc, $"p_partkey".asc)
    val viaWindow = part
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"p_brand", $"p_partkey")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("top_k keeps heap bounded and merges partials across partitions") {
    // 40 input partitions, one group: the plan MUST partial-aggregate
    // (each map task ships <= k rows), and the merged result is the
    // global best — this exercises update, serialize/deserialize at
    // the shuffle boundary, merge, and eval.
    val df = spark.range(0, 100000, 1, 40)
      .select(lit("g").as("g"), (col("id") * 37 % 100003).as("m"), col("id"))
    val got = df.groupBy($"g")
      .agg(TopKStructs.topK(struct($"m", $"id"), 5, Seq(true, false)).as("top"))
      .select(explode($"top.m").as("m")).as[Long].collect()
    // ground truth via the same arithmetic
    val truth = (0L until 100000L).map(i => i * 37 % 100003)
      .sorted(Ordering[Long].reverse).take(5)
    assert(got.toSeq == truth.toSeq)
    // plan shape: ObjectHashAggregate with a partial pass before the
    // exchange (map-side combine is the scale property claimed)
    val plan = df.groupBy($"g")
      .agg(TopKStructs.topK(struct($"m", $"id"), 5, Seq(true, false)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(plan.contains("partial_top_k") || plan.contains("partial top_k"),
      s"expected a partial aggregation pass:\n${plan.take(600)}")
  }

  test("top_k with k larger than the group returns the whole group, best-first") {
    val df = Seq(("a", 3L, 1L), ("a", 9L, 2L), ("b", 5L, 3L))
      .toDF("g", "m", "id")
    val got = df.groupBy($"g")
      .agg(TopKStructs.topK(struct($"m", $"id"), 10, Seq(true, false)).as("top"))
      .select($"g", $"top.m".as("ms")).as[(String, Seq[Long])]
      .collect().toMap
    assert(got("a") == Seq(9L, 3L) && got("b") == Seq(5L))
  }
}
