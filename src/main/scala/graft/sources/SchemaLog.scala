package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.util.AtomicText

/** S10 at engine strength: versioned schema evolution over plain
  * parquet via COLUMN MAPPING — the Delta `columnMapping` design
  * re-expressed on the manifest layer.
  *
  * The reference evolves schemas with conditional DDL
  * (`IF NOT EXISTS(sys.columns...) ALTER TABLE ADD ...`,
  * `accounts.py:115-126`) — additive only, and a rename would rewrite
  * the table. Parquet's own `mergeSchema` has the same ceiling: it
  * unions by NAME, so a rename forks the column and a re-added column
  * resurrects dropped data. Column mapping removes the name from the
  * data path entirely:
  *
  *   - every logical column gets an immutable PHYSICAL id (`p0`,
  *     `p1`, ...) at ADD time; files only ever carry physical names;
  *   - RENAME rewrites one line of this log — zero data files touched;
  *   - DROP removes the mapping; the physical column stays in old
  *     files but no reader resolves it;
  *   - re-ADDing a dropped logical name allocates a FRESH physical id,
  *     so dropped data is never resurrected (the mergeSchema hazard);
  *   - ADD serves NULL for batches written before it (parquet clip).
  *
  * The log itself is tiny versioned state committed through
  * [[AtomicText]] (same crash-atomicity as the manifest): line 0 is
  * `next-physical-id`, then one line per column
  * `logical<TAB>physical<TAB>typeDDL`, newest version wins via the
  * atomic whole-file replace. Retype is WIDEN-ONLY ([[retype]]):
  * promotions the parquet reader performs losslessly (int chain up,
  * float→double, decimal precision-up) are metadata-only; anything
  * lossy still refuses loudly — silent narrowing cast-on-read is the
  * class of surprise this engine fails loudly on.
  *
  * Single-writer contract (same as [[TxnManifest]] and the CDC
  * watermark): evolution commands are read-modify-write of the whole
  * log, so two concurrent DDL issuers race last-writer-wins — serialize
  * schema changes through one owner, which is how every production
  * catalog treats DDL anyway.
  */
final class SchemaLog(path: String) {
  import SchemaLog.Col

  private def write(nextId: Int, cols: Seq[Col]): Unit = {
    cols.foreach { c =>
      AtomicText.requireCleanKey(c.logical, "logical column name")
      require(!c.logical.contains("\t"), "tab in column name")
    }
    val body = (nextId.toString +: cols.map(c =>
      s"${c.logical}\t${c.physical}\t${c.dataType.sql}")).mkString("\n")
    AtomicText.writeAtomically(path, body)
  }

  /** (next physical id, current columns); empty before init. */
  def current(): (Int, Seq[Col]) = {
    val lines = AtomicText.readLines(path)
    if (lines.isEmpty) (0, Nil)
    else (lines.head.trim.toInt, lines.tail.map { l =>
      val Array(lg, ph, ddl) = l.split('\t')
      Col(lg, ph, DataType.fromDDL(ddl))
    })
  }

  /** Create the mapping for a fresh table. */
  def init(schema: StructType): Unit = {
    require(current()._2.isEmpty, s"schema log $path already initialized")
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      Col(f.name, s"p$i", f.dataType)
    }
    write(schema.fields.length, cols.toSeq)
  }

  /** Metadata-only rename: zero data files touched. */
  def rename(from: String, to: String): Unit = {
    val (next, cols) = current()
    require(cols.exists(_.logical == from), s"no column $from")
    require(!cols.exists(_.logical == to), s"column $to already exists")
    write(next, cols.map(c => if (c.logical == from) c.copy(logical = to) else c))
  }

  /** Remove the mapping; old files keep the physical column, no reader
    * resolves it. */
  def drop(name: String): Unit = {
    val (next, cols) = current()
    require(cols.exists(_.logical == name), s"no column $name")
    write(next, cols.filterNot(_.logical == name))
  }

  /** Add a column. A re-added logical name gets a FRESH physical id —
    * dropped data stays dead. Pre-existing batches serve NULL. */
  def add(name: String, dataType: DataType): Unit = {
    val (next, cols) = current()
    require(!cols.exists(_.logical == name), s"column $name already exists")
    write(next + 1, cols :+ Col(name, s"p$next", dataType))
  }

  /** WIDEN-ONLY retype (Delta's type-widening table feature): the
    * physical id keeps its files untouched and every reader requests
    * the widened type — Spark 4's parquet reader promotes old files'
    * narrower physical type natively (int32→long, float→double,
    * decimal precision-up), so this is a metadata-only edit like
    * rename. NARROWING (or any lossy change) still refuses loudly:
    * silent cast-on-read stays the class of surprise this engine
    * rejects. */
  def retype(name: String, to: DataType): Unit = {
    val (next, cols) = current()
    val cur = cols.find(_.logical == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    require(SchemaLog.canWiden(cur.dataType, to),
      s"retype of '$name' from ${cur.dataType.sql} to ${to.sql} is not a " +
        "widening — only byte/short/int->long-chain, integral/float->" +
        "double, and decimal precision-up (integer digits and scale " +
        "never shrink) are metadata-only; anything else needs ADD + " +
        "backfill")
    write(next, cols.map(c => if (c.logical == name) c.copy(dataType = to)
                              else c))
  }
}

object SchemaLog {

  final case class Col(logical: String, physical: String, dataType: DataType)

  /** The widen-only lattice [[SchemaLog.retype]] accepts — exactly the
    * promotions Spark 4's parquet reader performs on narrower file
    * types (SPARK-40876), so a widened column reads old and new files
    * through one requested schema with zero rewrites. */
  private[graft] def canWiden(from: DataType, to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    val intChain: Map[DataType, Int] =
      Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
    (from, to) match {
      case (f, t) if f == t => false // a no-op retype is a user mistake
      case (f, t) if intChain.contains(f) && intChain.contains(t) =>
        intChain(t) > intChain(f)
      case (FloatType, DoubleType) => true
      case (f, DoubleType) if intChain.contains(f) && f != LongType =>
        true // long->double loses precision past 2^53 — refused
      case (f: DecimalType, t: DecimalType) =>
        // integer digits and scale may only GROW: every old value is
        // exactly representable in the new type
        t.scale >= f.scale && (t.precision - t.scale) >= (f.precision - f.scale) &&
          (t.precision > f.precision || t.scale > f.scale)
      case _ => false
    }
  }

  /** Serialize mapping columns as the log's own line format (no
    * next-id header) — the epoch-claim payload the streaming sink
    * pins a snapshot into. */
  def renderCols(cols: Seq[Col]): String =
    cols.map(c => s"${c.logical}\t${c.physical}\t${c.dataType.sql}")
      .mkString("\n")

  /** Parse [[renderCols]] lines back into mapping columns. */
  def parseCols(lines: Seq[String]): Seq[Col] =
    lines.filter(_.nonEmpty).map { l =>
      val Array(lg, ph, ddl) = l.split('\t')
      Col(lg, ph, DataType.fromDDL(ddl))
    }

  /** The PHYSICAL file-read schema the mapping implies: one field per
    * mapped column, physical name, the LOG's (possibly widened) type.
    * Passing this as an explicit read schema replaces `mergeSchema`
    * on mapped tables — required after a retype (parquet schema merge
    * refuses int/long mixes; the reader's widening promotion does
    * not), and strictly better before one: missing columns clip to
    * NULL and dropped physical columns are never even requested. */
  def physicalSchema(cols: Seq[Col]): StructType =
    StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c.physical, c.dataType)))

  /** Write one batch through the mapping: `df` carries LOGICAL names
    * (any subset order, all current columns required), files carry
    * physical ones — with their [[BatchStats]] sidecar (physical
    * names; the mapped scan translates its filters to match, so data
    * skipping holds on mapped tables). */
  def appendBatchMapped(df: DataFrame, root: String, log: SchemaLog,
                        batchId: Int): Unit = {
    val (_, cols) = log.current()
    require(cols.nonEmpty, "schema log not initialized")
    val missing = cols.map(_.logical).toSet -- df.columns.toSet
    require(missing.isEmpty, s"batch is missing logical columns $missing")
    StatsSinks.appendBatchStats(
      df.select(cols.map(c => col(c.logical).as(c.physical)): _*),
      root, batchId)
  }

  /** Row-level MERGE through the mapping: `updates` carries LOGICAL
    * names and `keys` are logical; both translate to physical before
    * the copy-on-write [[Sinks.mergeUpsert]] runs, so merge semantics
    * and metadata-only renames compose — a rename between two merges
    * needs no data migration. */
  def mergeUpsertMapped(spark: SparkSession, updates: DataFrame, root: String,
                        manifest: TxnManifest, log: SchemaLog,
                        keys: Seq[String], mergeId: Int,
                        cdf: Boolean = false): Unit = {
    val (_, cols) = log.current()
    require(cols.nonEmpty, "schema log not initialized")
    val toPhysical = cols.map(c => c.logical -> c.physical).toMap
    val missingKeys = keys.filterNot(toPhysical.contains)
    require(missingKeys.isEmpty, s"unknown merge keys $missingKeys")
    val missing = updates.columns.filterNot(toPhysical.contains)
    require(missing.isEmpty, s"updates carry unmapped columns ${missing.toSeq}")
    Sinks.mergeUpsert(spark,
      updates.select(updates.columns.map(c =>
        col(c).as(toPhysical(c))).toSeq: _*),
      root, manifest, keys.map(toPhysical), mergeId, cdf = cdf,
      physSchema = Some(physicalSchema(cols)))
  }

  /** Row-level DELETE through the mapping — [[mergeUpsertMapped]]'s
    * delete twin: `deleteKeys` carries LOGICAL key columns, translated
    * to physical before [[Sinks.mergeDelete]]'s copy-on-write runs, so
    * a takedown purge composes with renames the same way upserts do. */
  def mergeDeleteMapped(spark: SparkSession, deleteKeys: DataFrame,
                        root: String, manifest: TxnManifest, log: SchemaLog,
                        keys: Seq[String], mergeId: Int,
                        cdf: Boolean = false): Unit = {
    val (_, cols) = log.current()
    require(cols.nonEmpty, "schema log not initialized")
    val toPhysical = cols.map(c => c.logical -> c.physical).toMap
    val missingKeys = keys.filterNot(toPhysical.contains)
    require(missingKeys.isEmpty, s"unknown merge keys $missingKeys")
    Sinks.mergeDelete(spark,
      deleteKeys.select(keys.map(k => col(k).as(toPhysical(k))): _*),
      root, manifest, keys.map(toPhysical), mergeId, cdf = cdf,
      physSchema = Some(physicalSchema(cols)))
  }

  /** Manifest-resolved read through the mapping: committed dirs only,
    * physical columns resolved to the CURRENT logical names, columns
    * added after a batch served as NULL for its rows. */
  def readCommittedMapped(spark: SparkSession, root: String,
                          manifest: TxnManifest, log: SchemaLog): DataFrame = {
    val (_, cols) = log.current()
    require(cols.nonEmpty, "schema log not initialized")
    // the EXPLICIT physical schema replaces mergeSchema inference:
    // batches older than an ADD clip their missing column to NULL,
    // batches older than a widen-only RETYPE promote in the parquet
    // reader, and dropped physical columns are never decoded
    Sinks.readCommitted(spark, root, manifest,
        physSchema = Some(physicalSchema(cols)))
      .select(cols.map(c => col(c.physical).as(c.logical)): _*)
  }
}
