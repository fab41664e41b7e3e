package graft.plans

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Sinks, StatsSinks, TxnManifest}
import graft.util.AtomicText

/** Incremental MATERIALIZED VIEWs over graft manifest tables — the
  * Delta "incremental materialized view on a CDF-enabled table"
  * recipe as a first-class engine surface (the reference's analogue
  * is the hand-maintained summary tables its pipelines rebuild from
  * scratch each run, e.g. the per-account rollups around
  * `accounts.py` — here the rebuild cost is O(changed rows), not
  * O(table)).
  *
  * Shape: `CREATE MATERIALIZED VIEW mv LOCATION '<dir>' AS SELECT
  * k1[, k2…], agg(..) AS out[, …] FROM <registered graft table>
  * [WHERE <pred>] GROUP BY k1[, k2…]` with aggs drawn from
  * count(*) / count(c) / sum(c) / avg(c) / min(c) / max(c).
  * Anything outside that surface refuses loudly at CREATE — never a
  * silently-wrong refresh.
  *
  * REFRESH reads the source's change feed `(lastV, curV]` — the same
  * `table_changes` scan the CDC surface serves — and:
  *  - **additive mode** (no min/max): folds signed deltas
  *    (+1 insert/update_postimage, −1 delete/update_preimage) into
  *    per-group accumulators and MERGEs only the touched groups.
  *    The BASE TABLE IS NEVER READ — refresh cost is O(delta) +
  *    O(touched groups), the 100 TB contract.
  *  - **recompute mode** (any min/max — not incrementally
  *    maintainable under deletes): recomputes ONLY the groups whose
  *    keys appear in the delta, via a semi-join the stats/bloom
  *    sidecars prune on the base scan. Cost is O(delta) + O(affected
  *    groups' rows), still never a full rebuild.
  *
  * Crash safety: the source version consumed by MV batch B is
  * recorded at `<loc>/state/<B>` BEFORE B commits — a crash between
  * the two leaves an inert state file (B never committed, so the
  * effective watermark is still batch B−1's) and the re-run
  * overwrites it. A refresh that double-applied a delta would
  * silently corrupt every accumulator; this ordering makes the
  * apply exactly-once without a transaction spanning two files.
  *
  * The MV's storage is itself a graft manifest table keyed on the
  * group-by columns, so refresh rides [[Sinks.merge]] unchanged:
  * stats-pruned probes, atomic partial-rewrite commits, time travel
  * over refresh history for free.
  */
object GraftMvs {

  /** One aggregate column of the view: `func` ∈ count_star, count,
    * sum, avg, min, max; `arg` is None only for count_star. */
  final case class AggSpec(out: String, func: String, arg: Option[String])

  final case class MvDef(name: String, src: String, groupKeys: Seq[String],
                         aggs: Seq[AggSpec], where: Option[String],
                         outSchema: StructType, storSchema: StructType) {
    def additive: Boolean =
      aggs.forall(a => a.func != "min" && a.func != "max")
  }

  private val views =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def norm(n: String): String = n.toLowerCase(Locale.ROOT)

  def lookup(name: String): Option[String] = Option(views.get(norm(name)))
  def unregister(name: String): Unit = { views.remove(norm(name)); () }

  private def dataRoot(base: String) = s"$base/data"
  private def manifestPath(base: String) = s"$base/manifest.tsv"
  private def defPath(base: String) = s"$base/mvdef.tsv"

  private val GRows = "__grows"
  private def nCol(out: String) = s"__n__$out"
  private def sCol(out: String) = s"__s__$out"

  // ---------------------------------------------------------------- def IO

  private def writeDef(base: String, d: MvDef): Unit = {
    val lines = Seq(
      s"name\t${d.name}",
      s"src\t${d.src}",
      s"keys\t${d.groupKeys.mkString(",")}") ++
      d.aggs.map(a => s"agg\t${a.out}\t${a.func}\t${a.arg.getOrElse("")}") ++
      d.where.map(w => s"where\t$w").toSeq ++ Seq(
      s"outschema\t${d.outSchema.json}",
      s"storschema\t${d.storSchema.json}")
    AtomicText.writeAtomically(defPath(base), lines.mkString("\n") + "\n")
  }

  private[plans] def readDef(base: String): MvDef = {
    val lines = AtomicText.readLines(defPath(base))
    require(lines.nonEmpty, s"no materialized-view definition at $base")
    def one(k: String): String = lines.collectFirst {
      case l if l.startsWith(k + "\t") => l.drop(k.length + 1) }.getOrElse(
      throw new IllegalStateException(s"mvdef at $base: missing '$k'"))
    def opt(k: String): Option[String] = lines.collectFirst {
      case l if l.startsWith(k + "\t") => l.drop(k.length + 1) }
    val aggs = lines.filter(_.startsWith("agg\t")).map { l =>
      val p = l.split('\t')
      AggSpec(p(1), p(2), if (p.length > 3 && p(3).nonEmpty) Some(p(3)) else None)
    }
    MvDef(one("name"), one("src"), one("keys").split(',').toSeq, aggs,
      opt("where"),
      DataType.fromJson(one("outschema")).asInstanceOf[StructType],
      DataType.fromJson(one("storschema")).asInstanceOf[StructType])
  }

  // ------------------------------------------------------------- state IO

  /** Source batch id consumed by MV batch `mvBatch`; written BEFORE
    * that batch commits (see class doc for the crash argument). */
  private def writeState(base: String, mvBatch: Int, srcV: Int): Unit =
    AtomicText.writeAtomically(s"$base/state/$mvBatch", s"$srcV\n")

  private def stateFor(base: String, mvBatch: Int): Int = {
    val l = AtomicText.readLines(s"$base/state/$mvBatch")
    require(l.nonEmpty, s"mv state file missing for committed batch " +
      s"$mvBatch under $base — state must be written before the commit")
    l.head.trim.toInt
  }

  // ------------------------------------------------------------- parsing

  /** Extract (source table, group keys, aggs, where-SQL) from the
    * CREATE's SELECT body, refusing anything outside the maintained
    * surface with the unsupported shape named. */
  private[plans] def parseSelect(selectSql: String)
    : (String, Seq[String], Seq[AggSpec], Option[String]) = {
    val plan = CatalystSqlParser.parsePlan(selectSql)
    val agg = plan match {
      case a: Aggregate => a
      case other => throw new IllegalArgumentException(
        "CREATE MATERIALIZED VIEW: the SELECT must be a single " +
          s"GROUP BY aggregation over one table; got ${other.nodeName}")
    }
    val (srcName, where) = agg.child match {
      case UnresolvedRelation(parts, _, _) => (parts.mkString("."), None)
      case Filter(cond, UnresolvedRelation(parts, _, _)) =>
        (parts.mkString("."), Some(cond.sql))
      case other => throw new IllegalArgumentException(
        "CREATE MATERIALIZED VIEW: FROM must be a bare registered " +
          s"table (optionally WHERE-filtered); got ${other.nodeName}")
    }
    val keys = agg.groupingExpressions.map {
      case a: UnresolvedAttribute => a.nameParts.mkString(".")
      case other => throw new IllegalArgumentException(
        "CREATE MATERIALIZED VIEW: GROUP BY must list plain columns; " +
          s"got ${other.sql}")
    }
    val aggs = agg.aggregateExpressions.flatMap {
      case a: UnresolvedAttribute =>
        val n = a.nameParts.mkString(".")
        require(keys.exists(_.equalsIgnoreCase(n)),
          s"CREATE MATERIALIZED VIEW: select column '$n' is not a " +
            "GROUP BY key and not an aggregate")
        None // served as a key; order follows groupKeys
      case Alias(f: UnresolvedFunction, out) => Some(parseAgg(f, out))
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias
          if ua.child.isInstanceOf[UnresolvedFunction] =>
        throw new IllegalArgumentException(
          s"CREATE MATERIALIZED VIEW: alias every aggregate — " +
            s"'${ua.child.sql}' needs AS <name> (the refresh stores it " +
            "by name)")
      case other => throw new IllegalArgumentException(
        "CREATE MATERIALIZED VIEW: select items must be group keys or " +
          s"aliased aggregates; got ${other.sql}")
    }
    require(aggs.nonEmpty, "CREATE MATERIALIZED VIEW: at least one " +
      "aggregate column is required")
    val outs = aggs.map(a => norm(a.out))
    require(outs.distinct.size == outs.size,
      s"CREATE MATERIALIZED VIEW: duplicate output names in " +
        aggs.map(_.out).mkString(", "))
    aggs.foreach(a => require(!a.out.startsWith("__"),
      s"CREATE MATERIALIZED VIEW: output name '${a.out}' collides with " +
        "the engine's internal accumulator prefix '__'"))
    (srcName, keys, aggs, where)
  }

  private def parseAgg(f: UnresolvedFunction, out: String): AggSpec = {
    require(!f.isDistinct, "CREATE MATERIALIZED VIEW: DISTINCT " +
      "aggregates are not incrementally maintainable — " +
      s"'${f.sql}' refused")
    val name = f.nameParts.last.toLowerCase(Locale.ROOT)
    def argCol: String = f.arguments match {
      case Seq(a: UnresolvedAttribute) => a.nameParts.mkString(".")
      case other => throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW: $name takes one plain column, " +
          s"got (${other.map(_.sql).mkString(", ")})")
    }
    name match {
      case "count" => f.arguments match {
        case Seq() | Seq(_: UnresolvedStar) => AggSpec(out, "count_star", None)
        case Seq(Literal(v, IntegerType)) if v == 1 =>
          AggSpec(out, "count_star", None) // parser rewrites count(*) → count(1)
        case _ => AggSpec(out, "count", Some(argCol))
      }
      case "sum" | "avg" | "min" | "max" => AggSpec(out, name, Some(argCol))
      case other => throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW: aggregate '$other' is not " +
          "maintainable here (supported: count, sum, avg, min, max)")
    }
  }

  // -------------------------------------------------------------- schemas

  /** Widest exact accumulator for a sum over `t` — refresh adds into
    * this column forever, so it must absorb any number of deltas. */
  private def accType(t: DataType): DataType = t match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType                        => DoubleType
    case d: DecimalType                                => DecimalType(38, d.scale)
    case other => throw new IllegalArgumentException(
      s"materialized view: cannot sum over type ${other.sql}")
  }

  private def fieldOf(schema: StructType, name: String): StructField =
    schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view: column '$name' is not in the source " +
          s"schema (${schema.fieldNames.mkString(", ")})"))

  private def storageSchema(srcSchema: StructType, keys: Seq[String],
                            aggs: Seq[AggSpec]): StructType = {
    val keyFields = keys.map(k => fieldOf(srcSchema, k))
    val aggFields = aggs.flatMap { a =>
      a.func match {
        case "count_star" | "count" =>
          Seq(StructField(a.out, LongType, nullable = false))
        case "min" | "max" =>
          Seq(StructField(a.out, fieldOf(srcSchema, a.arg.get).dataType))
        case "sum" =>
          val t = accType(fieldOf(srcSchema, a.arg.get).dataType)
          Seq(StructField(a.out, t),
            StructField(nCol(a.out), LongType, nullable = false))
        case "avg" =>
          val t = accType(fieldOf(srcSchema, a.arg.get).dataType)
          Seq(StructField(sCol(a.out), t),
            StructField(nCol(a.out), LongType, nullable = false))
      }
    }
    StructType(keyFields ++ aggFields :+
      StructField(GRows, LongType, nullable = false))
  }

  /** The view's SELECT as real Spark aggregates — the authority for
    * the served output types (probed once at CREATE). */
  private def realAggCols(aggs: Seq[AggSpec]): Seq[Column] = aggs.map { a =>
    (a.func match {
      case "count_star" => count(lit(1))
      case "count"      => count(col(a.arg.get))
      case "sum"        => sum(col(a.arg.get))
      case "avg"        => avg(col(a.arg.get))
      case "min"        => min(col(a.arg.get))
      case "max"        => max(col(a.arg.get))
    }).as(a.out)
  }

  // --------------------------------------------------------------- create

  def create(spark: SparkSession, name: String, location: String,
             selectSql: String): Unit = {
    require(lookup(name).isEmpty,
      s"materialized view '$name' already exists")
    val (srcName, keys, aggs, where) = parseSelect(selectSql)
    val entry = GraftSqlTables.lookup(srcName.split('.').toSeq).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW: '$srcName' is not a registered " +
          "graft table"))
    require(!entry.isClone, "CREATE MATERIALIZED VIEW over a shallow " +
      "clone is not supported — materialize the clone first (OPTIMIZE), " +
      "or define the view on the clone source")
    val base = snapshotRead(spark, entry)
    val live = where.fold(base)(w => base.where(expr(w)))
    keys.foreach(k => fieldOf(base.schema, k))
    val outSchema = live.groupBy(keys.map(col): _*)
      .agg(realAggCols(aggs).head, realAggCols(aggs).tail: _*).schema
    val stor = storageSchema(base.schema, keys, aggs)
    val d = MvDef(name, srcName, keys, aggs, where, outSchema, stor)
    writeDef(location, d)
    views.put(norm(name), location)
    read(spark, name).createOrReplaceTempView(tempViewName(name))
    ()
  }

  private def tempViewName(name: String): String = name.replace('.', '_')

  /** Latest-snapshot read of the SOURCE table (logical names when it
    * is a columnMapping table — the same option set `table_changes`
    * passes). */
  private def snapshotRead(spark: SparkSession,
                           entry: GraftSqlTables.Entry): DataFrame = {
    var r = spark.read.format("graft-manifest")
      .option("manifest", entry.manifestPath)
    entry.schemaLogPath.foreach(p => r = r.option("schemaLog", p))
    r.load(entry.root)
  }

  // -------------------------------------------------------------- refresh

  /** Returns (fromExclusive, toInclusive, applied?) — applied=false
    * is the no-op refresh (nothing new committed upstream, nothing
    * committed here). */
  def refresh(spark: SparkSession, name: String): (Int, Int, Boolean) = {
    val baseDir = lookup(name).getOrElse(throw new IllegalArgumentException(
      s"materialized view '$name' is not registered"))
    val d = readDef(baseDir)
    val entry = GraftSqlTables.lookup(d.src.split('.').toSeq).getOrElse(
      throw new IllegalStateException(
        s"materialized view '$name': source table '${d.src}' is no " +
          "longer registered"))
    val srcMan = new TxnManifest(entry.manifestPath)
    val curV = srcMan.committed().keys.maxOption.getOrElse(-1)
    val mvMan = new TxnManifest(manifestPath(baseDir))
    val mvB = mvMan.committed().keys.maxOption.getOrElse(-1)
    val lastV = if (mvB < 0) -1 else stateFor(baseDir, mvB)
    if (curV <= lastV) return (lastV, curV, false)

    var r = spark.read.format("graft-manifest")
      .option("manifest", entry.manifestPath)
      .option("changeFeed", "true")
      .option("startingBatchId", lastV.toString) // exclusive lower bound
      .option("endingBatchId", curV.toString)
    entry.schemaLogPath.foreach(p => r = r.option("schemaLog", p))
    val changes = r.load(entry.root)
    val delta = d.where.fold(changes)(w => changes.where(expr(w)))

    val newBatch = mvB + 1
    writeState(baseDir, newBatch, curV) // inert until the commit below
    if (d.additive) refreshAdditive(spark, d, baseDir, mvMan, mvB, newBatch, delta)
    else refreshRecompute(spark, d, entry, baseDir, mvMan, mvB, newBatch, delta)
    read(spark, name).createOrReplaceTempView(tempViewName(name))
    (lastV, curV, true)
  }

  /** Group-key columns with an IN-PLAN null refusal: the MV's storage
    * identity is key equality ([[Sinks.merge]]), and SQL `=` never
    * matches NULL — a null-keyed group would duplicate on every
    * refresh instead of updating. The guard binds exactly the rows
    * the refresh aggregates (zero extra jobs); `raise_error`'s
    * NullType branch coerces to the key type. */
  private def guardedKeys(keys: Seq[String]): Seq[Column] = keys.map(k =>
    when(col(k).isNotNull, col(k)).otherwise(raise_error(lit(
      s"materialized view: NULL group key '$k' — null-keyed groups are " +
        "not maintainable (key-equality merge); filter them in the " +
        "view's WHERE"))).as(k))

  /** Conform `df` to the storage schema: column order and exact types
    * (accumulator arithmetic widens decimals; the cast pins them). */
  private def conform(df: DataFrame, stor: StructType): DataFrame =
    df.select(stor.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
      .toSeq: _*)

  private def refreshAdditive(spark: SparkSession, d: MvDef, baseDir: String,
                              mvMan: TxnManifest, mvB: Int, newBatch: Int,
                              delta: DataFrame): Unit = {
    val w = when(col(Sinks.ChangeTypeCol).isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val deltaAggs: Seq[Column] = d.aggs.flatMap { a =>
      a.func match {
        case "count_star" => Seq(sum(w).as(a.out))
        case "count" => Seq(
          sum(when(col(a.arg.get).isNotNull, w).otherwise(0L)).as(a.out))
        case "sum" => Seq(
          sum(when(col(a.arg.get).isNotNull, w * col(a.arg.get))).as(a.out),
          sum(when(col(a.arg.get).isNotNull, w).otherwise(0L)).as(nCol(a.out)))
        case "avg" => Seq(
          sum(when(col(a.arg.get).isNotNull, w * col(a.arg.get))).as(sCol(a.out)),
          sum(when(col(a.arg.get).isNotNull, w).otherwise(0L)).as(nCol(a.out)))
        case other => sys.error(s"additive refresh on $other") // unreachable
      }
    } :+ sum(w).as(GRows)
    val dAgg = delta.groupBy(guardedKeys(d.groupKeys): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)

    if (mvB < 0) { // bootstrap: the feed from −1 IS the full history
      val boot = conform(dAgg.filter(col(GRows) > 0), d.storSchema)
      StatsSinks.appendBatchStats(boot, dataRoot(baseDir), newBatch)
      mvMan.commit(newBatch, Seq(s"${dataRoot(baseDir)}/batch=$newBatch"))
    } else {
      val accCols = d.storSchema.fieldNames.filterNot(n =>
        d.groupKeys.exists(_.equalsIgnoreCase(n))).toSeq
      val dd = dAgg.select((d.groupKeys.map(col) ++
        accCols.map(n => col(n).as(s"__d_$n"))): _*)
      val cur = Sinks.readCommitted(spark, dataRoot(baseDir), mvMan)
      // right join: untouched groups are never read into the plan's
      // output — only delta groups (new or existing) flow onward
      val merged0 = cur.join(dd, d.groupKeys, "right")
      val merged = accCols.foldLeft(merged0) { (df, n) =>
        val t = d.storSchema(d.storSchema.fieldIndex(n)).dataType
        df.withColumn(n,
          coalesce(col(n), lit(0).cast(t)) +
            coalesce(col(s"__d_$n"), lit(0).cast(t)))
      }
      val updates = conform(merged.filter(col(GRows) > 0), d.storSchema)
      val deletes = merged.filter(col(GRows) <= 0)
        .select(d.groupKeys.map(col): _*)
      Sinks.merge(spark, Some(updates), Some(deletes), dataRoot(baseDir),
        mvMan, d.groupKeys, newBatch)
    }
  }

  private def refreshRecompute(spark: SparkSession, d: MvDef,
                               entry: GraftSqlTables.Entry, baseDir: String,
                               mvMan: TxnManifest, mvB: Int, newBatch: Int,
                               delta: DataFrame): Unit = {
    val storageAggs: Seq[Column] = d.aggs.flatMap { a =>
      a.func match {
        case "count_star" => Seq(count(lit(1)).as(a.out))
        case "count"      => Seq(count(col(a.arg.get)).as(a.out))
        case "min"        => Seq(min(col(a.arg.get)).as(a.out))
        case "max"        => Seq(max(col(a.arg.get)).as(a.out))
        case "sum" => Seq(sum(col(a.arg.get)).as(a.out),
          count(col(a.arg.get)).as(nCol(a.out)))
        case "avg" => Seq(sum(col(a.arg.get)).as(sCol(a.out)),
          count(col(a.arg.get)).as(nCol(a.out)))
      }
    } :+ count(lit(1)).as(GRows)
    val base = snapshotRead(spark, entry)
    val live = d.where.fold(base)(w => base.where(expr(w)))

    if (mvB < 0) {
      val full = conform(live.groupBy(guardedKeys(d.groupKeys): _*)
        .agg(storageAggs.head, storageAggs.tail: _*), d.storSchema)
      StatsSinks.appendBatchStats(full, dataRoot(baseDir), newBatch)
      mvMan.commit(newBatch, Seq(s"${dataRoot(baseDir)}/batch=$newBatch"))
    } else {
      // groups touched by ANY delta image (a pre-image that matched
      // the WHERE marks its group even when the post-image left it)
      val affected = delta.select(guardedKeys(d.groupKeys): _*).distinct()
      val rec = conform(
        live.join(affected, d.groupKeys, "left_semi")
          .groupBy(d.groupKeys.map(col): _*)
          .agg(storageAggs.head, storageAggs.tail: _*), d.storSchema)
      val gone = affected.join(rec.select(d.groupKeys.map(col): _*),
        d.groupKeys, "left_anti")
      Sinks.merge(spark, Some(rec), Some(gone), dataRoot(baseDir),
        mvMan, d.groupKeys, newBatch)
    }
  }

  // ----------------------------------------------------------------- read

  /** The view's contents under its DECLARED output schema (exactly
    * the types Spark's own aggregate over the source would produce —
    * probed and pinned at CREATE). */
  def read(spark: SparkSession, name: String): DataFrame = {
    val baseDir = lookup(name).getOrElse(throw new IllegalArgumentException(
      s"materialized view '$name' is not registered"))
    val d = readDef(baseDir)
    val mvMan = new TxnManifest(manifestPath(baseDir))
    val raw =
      if (mvMan.committed().isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], d.storSchema)
      else Sinks.readCommitted(spark, dataRoot(baseDir), mvMan)
    val served: Seq[Column] = d.groupKeys.map(col) ++ d.aggs.map { a =>
      val outT = d.outSchema(d.outSchema.fieldIndex(a.out)).dataType
      a.func match {
        case "count_star" | "count" | "min" | "max" =>
          col(a.out).cast(outT).as(a.out)
        case "sum" =>
          when(col(nCol(a.out)) === 0, lit(null))
            .otherwise(col(a.out)).cast(outT).as(a.out)
        case "avg" =>
          when(col(nCol(a.out)) === 0, lit(null))
            .otherwise(col(sCol(a.out)) / col(nCol(a.out)))
            .cast(outT).as(a.out)
      }
    }
    raw.select(served: _*)
  }

  def drop(name: String): Unit = {
    require(lookup(name).isDefined,
      s"materialized view '$name' is not registered")
    unregister(name)
  }
}

/** `CREATE MATERIALIZED VIEW <name> LOCATION '<dir>' AS <select>` */
final case class GraftMvCreateCommand(name: String, location: String,
                                      select: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftMvs.create(spark, name, location, select); Seq.empty
  }
}

/** `REFRESH MATERIALIZED VIEW <name>` → one row
  * (from_version, to_version, applied). */
final case class GraftMvRefreshCommand(name: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("from_version", IntegerType, nullable = false)(),
      AttributeReference("to_version", IntegerType, nullable = false)(),
      AttributeReference("applied", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (from, to, applied) = GraftMvs.refresh(spark, name)
    Seq(Row(from, to, applied))
  }
}

/** `DROP MATERIALIZED VIEW <name>` — unregisters (files remain; the
  * location is caller-owned, the VACUUM contract of temp state). */
final case class GraftMvDropCommand(name: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftMvs.drop(name); Seq.empty
  }
}
