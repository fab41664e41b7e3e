package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** The automatic interval-join rewrite ([[graft.plans.RangeJoinRewrite]]):
  * result-identical to the naive plan in every orientation, loop-join-free
  * when enabled, inert when disabled or when an equi-key already exists. */
class RangeRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def loopJoins(df: DataFrame) =
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec leaf that collect() cannot descend into
    df.queryExecution.sparkPlan.collectWithSubqueries {
      case l: BroadcastNestedLoopJoinExec => l
      case c: CartesianProductExec => c
    }

  private def points = ((0L to 400L by 5L).map(p => (p, s"p$p")) :+
    ((-1L, null.asInstanceOf[String]))).toDF("p", "ptag")
      .withColumn("p", when(col("ptag").isNull, lit(null)).otherwise(col("p")))
  private def intervals = Seq(
    (1L, 0L, 100L), (2L, 50L, 150L), (3L, 150L, 150L),
    (4L, 95L, 305L), (5L, 399L, 400L)).toDF("iid", "s", "e")
      .unionAll(Seq(("x", 6L)).toDF("pad", "iid")
        .select(col("iid"), lit(null).cast("long").as("s"), lit(420L).as("e")))

  private def withRule[T](binWidth: Long)(body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.BinWidthConf, binWidth.toString)
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
      spark.conf.unset(RangeJoinRewrite.BinWidthConf)
    }
  }

  private def sorted(df: DataFrame) =
    df.select("p", "iid").orderBy("p", "iid").collect().map(_.toSeq).toSeq

  test("strict upper bound, point on left: same rows, no loop join") {
    val naive = sorted(points.join(intervals, $"p" >= $"s" && $"p" < $"e"))
    withRule(100L) {
      val q = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
      assert(sorted(q) == naive && naive.nonEmpty)
      assert(loopJoins(q).isEmpty,
        s"rewrite missed:\n${q.queryExecution.executedPlan}")
    }
  }

  test("inclusive upper bound (BETWEEN) and point-on-right orientation") {
    val naiveBetween = sorted(points.join(intervals, $"p".between($"s", $"e")))
    val naiveFlip = sorted(intervals.join(points, $"p" >= $"s" && $"p" < $"e"))
    withRule(100L) {
      val between = points.join(intervals, $"p".between($"s", $"e"))
      assert(sorted(between) == naiveBetween)
      assert(loopJoins(between).isEmpty)
      // boundary: inclusive upper keeps p == e (100 ∈ [0,100])
      assert(sorted(between) != sorted(points.join(intervals, $"p" >= $"s" && $"p" < $"e")))
      val flipped = intervals.join(points, $"p" >= $"s" && $"p" < $"e")
      assert(sorted(flipped) == naiveFlip)
      assert(loopJoins(flipped).isEmpty)
    }
  }

  test("SQL text form rewrites too; rule is inert without the conf") {
    points.createOrReplaceTempView("rr_points")
    intervals.createOrReplaceTempView("rr_intervals")
    val sql = "SELECT p, iid FROM rr_points JOIN rr_intervals ON p >= s AND p < e"
    val naive = spark.sql(sql).orderBy("p", "iid").collect().map(_.toSeq).toSeq
    assert(loopJoins(spark.sql(sql)).nonEmpty) // baseline IS a loop join
    withRule(100L) {
      val q = spark.sql(sql)
      assert(q.orderBy("p", "iid").collect().map(_.toSeq).toSeq == naive)
      assert(loopJoins(q).isEmpty)
    }
  }

  test("joins with an equi-key or non-integral bounds are left untouched") {
    withRule(100L) {
      val equi = points.join(intervals,
        $"p" === $"iid" && $"p" >= $"s" && $"p" < $"e")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      val nonIntegral = points.withColumn("pd", $"p".cast("double"))
        .join(intervals.withColumn("sd", $"s".cast("double"))
          .withColumn("ed", $"e".cast("double")),
          $"pd" >= $"sd" && $"pd" < $"ed")
      assert(!nonIntegral.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
  }
}
