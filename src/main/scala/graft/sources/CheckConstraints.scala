package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, expr, lit, not}

/** Write-side CHECK-constraint enforcement — the reference's
  * integrity-assert-and-abort (`utils/custom_err.py:1-6`, raised at
  * e.g. `Main_Modules/Locations/locations.py:108-111`) as a
  * declarative table property: every write path evaluates the
  * constraint predicates over the incoming rows and ABORTS the whole
  * batch on the first violation — nothing commits, matching both the
  * reference's transaction rollback and Delta's enforced CHECK.
  *
  * SQL CHECK semantics: a row violates only when the predicate is
  * FALSE — NULL passes (`coalesce(pred, true)`), the ANSI rule.
  * The probe is `limit(1)` over the violating subset, so a clean
  * batch pays one pass with an early-exit plan, never a full count.
  */
object CheckConstraints {

  /** Fail loudly if any `frame` row violates any of `checks`
    * (name → predicate SQL over the table's LOGICAL columns). ONE
    * probe job regardless of constraint count: all predicates project
    * as violation flags in a single pass, the early-exit `limit(1)`
    * fetches the first bad row, and the error names every constraint
    * that row breaks. */
  def enforce(table: String, checks: Seq[(String, String)],
              frame: DataFrame, verb: String): Unit =
    if (checks.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val flags = checks.map { case (name, sql) =>
        not(coalesce(expr(sql), lit(true))).as(name) }
      val bad = frame.select(flags: _*)
        .where(checks.map(c => col(c._1)).reduce(_ || _))
        .limit(1).collect()
      bad.headOption.foreach { r =>
        val broken = checks.filter { case (n, _) => r.getAs[Boolean](n) }
        throw new IllegalArgumentException(
          s"$verb $table: rows violate CHECK constraint" +
            (if (broken.size > 1) "s " else " ") +
            broken.map { case (n, s) => s"'$n' ($s)" }.mkString(", ") +
            " — batch aborted, nothing committed")
      }
    }

  /** The `check.<name>` options a [[graft.plans.GraftCatalog]] table
    * carries for the native V1 write path. */
  def fromOptions(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
    : Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    options.entrySet().asScala.toSeq
      .filter(_.getKey.startsWith("check."))
      .map(e => e.getKey.stripPrefix("check.") -> e.getValue)
      .sortBy(_._1)
  }
}
