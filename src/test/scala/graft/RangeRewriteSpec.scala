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

  test("RANGE_JOIN hint: two interval joins in one plan, each at its own width") {
    withExtensionSession { s =>
      // parquet inputs: ConvertToLocalRelation would fold local plans
      val tmp = java.nio.file.Files.createTempDirectory("rr_hint_").toString
      s.range(0, 400, 5).selectExpr("id AS p").write.parquet(s"$tmp/p")
      s.range(0, 4).selectExpr("id AS iid", "id * 100 AS s1", "id * 100 + 150 AS e1")
        .write.parquet(s"$tmp/i1")
      // second interval table at a 100× coarser scale — one global bin
      // width cannot fit both joins
      s.range(0, 4).selectExpr("id AS jid", "id * 10000 - 20000 AS s2",
        "id * 10000 - 5000 AS e2").write.parquet(s"$tmp/i2")
      val p  = s.read.parquet(s"$tmp/p")
      val i1 = s.read.parquet(s"$tmp/i1")
      val i2 = s.read.parquet(s"$tmp/i2")

      def naive = p.join(i1, col("p") >= col("s1") && col("p") < col("e1"))
        .join(i2, col("p") >= col("s2") && col("p") < col("e2"))
      val expected = naive.select("p", "iid", "jid").orderBy("p", "iid", "jid")
        .collect().map(_.toSeq).toSeq
      assert(expected.nonEmpty && loopJoins(naive).nonEmpty) // baseline loops

      val hinted = p.join(i1, col("p") >= col("s1") && col("p") < col("e1"))
        .hint("range_join", 100L)
        .join(i2, col("p") >= col("s2") && col("p") < col("e2"))
        .hint("range_join", 10000L)
      assert(hinted.select("p", "iid", "jid").orderBy("p", "iid", "jid")
        .collect().map(_.toSeq).toSeq == expected)
      assert(loopJoins(hinted).isEmpty,
        s"hinted joins still loop:\n${hinted.queryExecution.sparkPlan}")
      // each join binned at ITS width: the bin arithmetic (x div w)
      // must appear with both widths in the optimized plan
      val optimized = hinted.queryExecution.optimizedPlan.toString
      assert(optimized.contains("div 100)"), s"no 100-wide bin in:\n$optimized")
      assert(optimized.contains("div 10000)"), s"no 10000-wide bin in:\n$optimized")

      // SQL hint form binds too
      p.createOrReplaceTempView("rrh_points")
      i1.createOrReplaceTempView("rrh_intervals")
      val viaSql = s.sql("""SELECT /*+ RANGE_JOIN(100) */ p, iid
        |FROM rrh_points JOIN rrh_intervals ON p >= s1 AND p < e1""".stripMargin)
      assert(loopJoins(viaSql).isEmpty,
        s"SQL hint ignored:\n${viaSql.queryExecution.sparkPlan}")

      // malformed hint fails loudly at analysis, not silently mis-bins
      intercept[Exception] {
        p.join(i1, col("p") >= col("s1") && col("p") < col("e1"))
          .hint("range_join", "wide").queryExecution.analyzed
      }
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
