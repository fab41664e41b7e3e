package graft

import graft.expressions.{SimHash64, TopKStructs}
import graft.plans.GraftExtensions

/** The engine's SQL surface: the custom expressions must be reachable
  * from `spark.sql(...)`, both via `spark.sql.extensions`
  * ([[GraftExtensions]] — how a cluster deployment gets them) and via
  * the per-session `register` helpers (how a live session adds them).
  */
class SqlSurfaceSpec extends SparkSuite {
  import spark.implicits._

  // withExtensionSession lives in SparkSuite (shared with RangeRewriteSpec)

  test("GraftExtensions injects simhash64 + top_k into pure SQL") {
    withExtensionSession { s =>
      s.createDataFrame(Seq(
        (1L, "the quick brown fox", "a", 3.0),
        (2L, "the quick brown fox", "a", 1.0),
        (3L, "jumped over the dog", "a", 2.0),
        (4L, "something else here", "b", 5.0)
      )).toDF("id", "text", "g", "m").createOrReplaceTempView("docs")

      // simhash64 through SQL == the Column API expression
      val viaSql = s.sql("SELECT id, simhash64(text) AS h FROM docs")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaCol = s.table("docs")
        .select($"id", SimHash64.simhash64($"text").as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSql == viaCol)
      assert(viaSql(1L) == viaSql(2L)) // identical text, identical hash

      // top_k through SQL: top-2 by m desc per group, analyzer wraps
      // the bare aggregate exactly like a built-in
      val top = s.sql(
        """SELECT g, transform(top_k(struct(m, id), 2, true), x -> x.id) AS ids
          |FROM docs GROUP BY g ORDER BY g""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(top("a") == Seq(1L, 3L)) // m: 3.0, 2.0
      assert(top("b") == Seq(4L))

      // bad arity / non-literal k fail analysis loudly, not at runtime
      intercept[Exception](s.sql("SELECT top_k(struct(m)) FROM docs").collect())
      intercept[Exception](
        s.sql("SELECT top_k(struct(m), id) FROM docs GROUP BY g").collect())
    }
  }

  test("GraftExtensions injects the range-join rewrite (conf-gated)") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    withExtensionSession { s =>
      // parquet inputs: ConvertToLocalRelation would fold the plan
      val tmp = java.nio.file.Files.createTempDirectory("sql_rr_").toString
      s.range(0, 400, 5).selectExpr("id AS p").write.parquet(s"$tmp/p")
      s.range(0, 4).selectExpr("id AS iid", "id * 100 AS s", "id * 100 + 150 AS e")
        .write.parquet(s"$tmp/i")
      s.read.parquet(s"$tmp/p").createOrReplaceTempView("rrx_points")
      s.read.parquet(s"$tmp/i").createOrReplaceTempView("rrx_intervals")
      val sql = "SELECT p, iid FROM rrx_points JOIN rrx_intervals ON p >= s AND p < e"
      def loops(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.sparkPlan.collectWithSubqueries {
          case l: BroadcastNestedLoopJoinExec => l
          case c: CartesianProductExec => c
        }
      val naive = s.sql(sql).collect().map(_.toSeq).sortBy(_.toString)
      assert(loops(s.sql(sql)).nonEmpty) // conf unset → rule inert
      s.conf.set(graft.plans.RangeJoinRewrite.BinWidthConf, "100")
      try {
        val q = s.sql(sql)
        assert(loops(q).isEmpty,
          s"injected rule did not rewrite:\n${q.queryExecution.sparkPlan}")
        assert(q.collect().map(_.toSeq).sortBy(_.toString).sameElements(naive))
      } finally s.conf.unset(graft.plans.RangeJoinRewrite.BinWidthConf)
    }
  }

  test("schema_of_json infers the e7b nested document shape") {
    // the inference arm of the e7b read path: an inferred-schema STRING
    // has no DuckDB twin to hash against, so it is pinned here instead
    // of in the oracle. Inference on a representative doc yields the
    // exact struct e7b's from_json declares (modulo the corrupt-record
    // column, which is a parser policy, not document shape).
    val doc =
      """{"meta":{"k":7,"type":"click"},"items":[{"q":14},{"q":8}]}"""
    val inferred = spark.sql(
      s"SELECT schema_of_json('$doc') AS s").collect().head.getString(0)
    assert(inferred ==
      "STRUCT<items: ARRAY<STRUCT<q: BIGINT>>, meta: STRUCT<k: BIGINT, type: STRING>>")
    // and a from_json with the inferred schema round-trips the doc
    val rt = spark.sql(
      s"""SELECT to_json(from_json('$doc', schema_of_json('$doc'))) AS j""")
      .collect().head.getString(0)
    assert(rt == """{"items":[{"q":14},{"q":8}],"meta":{"k":7,"type":"click"}}""")
  }

  test("per-session register() exposes the same functions on a live session") {
    SimHash64.register(spark)
    TopKStructs.register(spark)
    Seq((1L, "a b c", 2.0), (2L, "a b c", 7.0))
      .toDF("id", "text", "m").createOrReplaceTempView("live_docs")
    val r = spark.sql(
      """SELECT count(DISTINCT simhash64(text)) AS nh,
        |       transform(top_k(struct(m, id), 1, true), x -> x.id) AS best
        |FROM live_docs""".stripMargin).collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getSeq[Long](1) == Seq(2L))
  }
}
