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

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects outright; read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
    * microseconds (lossless here: the generator emits µs precision).
    * Integer `div`, not `/` — double division loses precision above
    * 2^53 and epoch-nanos is ~1.7e18. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
