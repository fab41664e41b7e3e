package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * In the reference every pipeline begins with a JDBC scan of a `dbo.*`
  * table (e.g. `/root/reference/Main_Modules/Accounts/accounts.py:44`);
  * here the equivalent source is a parquet scan, which Catalyst serves
  * with vectorized reads, predicate pushdown and column pruning. At
  * cluster scale these would be partitioned/bucketed tables — the
  * operators below never assume single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` has shipped with `ts` as TIMESTAMP(NANOS) in
    * some generator versions and TIMESTAMP(MICROS) in others, so the
    * read adapts to the footer instead of assuming either. NANOS is
    * rejected outright by Spark's vectorized reader; read nanos as
    * long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
    * microseconds (lossless here: the generator emits µs precision).
    * Integer `div`, not `/` — double division loses precision above
    * 2^53 and epoch-nanos is ~1.7e18. A MICROS footer already lands
    * as a timestamp column and passes through untouched; either way
    * callers see the same µs-precision `ts`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = table(s, d, "events")
    t.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        t.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // no isAdjustedToUTC flag in the footer → NTZ; every session
        // here runs spark.sql.session.timeZone=UTC, so the cast to
        // LTZ is the identity on the µs values (and matches DuckDB's
        // epoch_us over the same naive timestamps)
        t.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => t
    }
  }

  /** Register the whole star schema as temp views, so `spark.sql`
    * text queries run against it verbatim — the catalog surface a
    * user migrating SQL workloads lands on (cluster equivalent:
    * external tables in a metastore over the same paths). Idempotent
    * per session. */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
