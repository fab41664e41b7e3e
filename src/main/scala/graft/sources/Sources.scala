package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Source adapters (SURVEY.md §2.1 S1-S7).
  *
  * The reference reads SQL Server through SQLAlchemy with hand-built
  * SQL (`accounts.py:44`, `fks_mapper.py:16-110`). The Spark-native
  * equivalent is the JDBC source with the *same* pushdown expressed
  * declaratively: the keyset predicate and column list land in a
  * `dbtable` subquery the server executes, and partitioned reads
  * parallelize what the reference does single-threaded.
  *
  * No external database exists in this environment; the live JDBC
  * execute path (partitioned backfill, keyset drain, write-back) is
  * tested against an embedded Derby instance (JdbcSpec), the SQL
  * Server `TOP` shape at the query-construction level, and the
  * parquet path stands in for the oracle-gated queries — identical
  * DataFrames downstream.
  */
object Sources {

  /** S3 as server-side SQL: the exact keyset-pagination subquery shape
    * of the reference (`SELECT TOP n cols FROM t WHERE id > wm ORDER BY
    * id`), as a JDBC `dbtable` so the server — not Spark — applies
    * TOP/ORDER. */
  def keysetSubquery(table: String, idCol: String, watermark: Long,
                     batchSize: Int, columns: Seq[String] = Seq("*"),
                     extraPredicate: Option[String] = None): String = {
    val cols  = columns.mkString(", ")
    val extra = extraPredicate.map(p => s" AND ($p)").getOrElse("")
    s"(SELECT TOP $batchSize $cols FROM $table " +
      s"WHERE $idCol > $watermark$extra ORDER BY $idCol) AS batch"
  }

  /** [[keysetSubquery]] in the ANSI SQL:2008 `FETCH FIRST` form —
    * portable to Derby/Postgres/Oracle/DB2 (and SQL Server 2012+),
    * where `TOP` is SQL Server-only. Same server-side pushdown. */
  def keysetSubqueryAnsi(table: String, idCol: String, watermark: Long,
                         batchSize: Int, columns: Seq[String] = Seq("*"),
                         extraPredicate: Option[String] = None): String = {
    val cols  = columns.mkString(", ")
    val extra = extraPredicate.map(p => s" AND ($p)").getOrElse("")
    s"(SELECT $cols FROM $table WHERE $idCol > $watermark$extra " +
      s"ORDER BY $idCol FETCH FIRST $batchSize ROWS ONLY) AS batch"
  }

  /** JDBC reader for one ANSI-dialect keyset batch (live-tested against
    * embedded Derby in JdbcSpec). */
  def jdbcKeysetAnsi(spark: SparkSession, url: String, table: String,
                     idCol: String, watermark: Long, batchSize: Int,
                     columns: Seq[String] = Seq("*"),
                     extraPredicate: Option[String] = None): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable",
        keysetSubqueryAnsi(table, idCol, watermark, batchSize, columns, extraPredicate))

  /** JDBC reader for one keyset batch. Partitioning options are
    * deliberately absent: a TOP-n batch is one unit of work; the
    * parallelism lever at scale is many tables × the driver loop, or
    * `partitionColumn` bounds for full-table backfills (see
    * [[jdbcFullTable]]). */
  def jdbcKeyset(spark: SparkSession, url: String, table: String, idCol: String,
                 watermark: Long, batchSize: Int,
                 columns: Seq[String] = Seq("*"),
                 extraPredicate: Option[String] = None): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable",
        keysetSubquery(table, idCol, watermark, batchSize, columns, extraPredicate))

  /** Full-table parallel backfill: range-partitioned JDBC scan —
    * `numPartitions` concurrent cursors over `[lower, upper]` strides
    * of the key. This is the initial-load path the reference lacks
    * (it pages serially even for backfills). */
  def jdbcFullTable(spark: SparkSession, url: String, table: String,
                    idCol: String, lower: Long, upper: Long,
                    numPartitions: Int): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", idCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
}
