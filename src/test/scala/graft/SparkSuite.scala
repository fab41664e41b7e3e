package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy), ANSI off for
  * pandas-coerce parity, UTC, small shuffle partitioning. */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  /** A genuinely NEW session built with GraftExtensions, over the same
    * SparkContext as the shared suite session (getOrCreate returns the
    * existing session unless active+default are cleared first). */
  def withExtensionSession[A](f: SparkSession => A): A = {
    val prev = spark // force the shared session (and its context) first
    // `spark.sql.extensions` is a STATIC conf: a new session over an
    // existing SparkContext resolves it from the CONTEXT's conf (the
    // builder option would be ignored) — exactly how a cluster deploy
    // passes it via spark-submit --conf. Pin it for the test's scope.
    org.apache.spark.graftbridge.TestConfBridge.set(prev.sparkContext,
      "spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s ne prev, "expected a fresh session with extensions applied")
      f(s)
    } finally {
      org.apache.spark.graftbridge.TestConfBridge.remove(
        prev.sparkContext, "spark.sql.extensions")
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
