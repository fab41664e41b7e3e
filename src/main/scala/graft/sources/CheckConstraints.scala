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
    * (name → predicate SQL over the table's LOGICAL columns). */
  def enforce(table: String, checks: Seq[(String, String)],
              frame: DataFrame, verb: String): Unit =
    checks.foreach { case (name, sql) =>
      val bad = frame.where(not(coalesce(expr(sql), lit(true))))
        .limit(1).count()
      require(bad == 0,
        s"$verb $table: rows violate CHECK constraint '$name' " +
          s"($sql) — batch aborted, nothing committed")
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
