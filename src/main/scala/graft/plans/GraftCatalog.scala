package graft.plans

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{GraftManifestSource, GraftManifestTable}
import graft.util.AtomicText

/** DSv2 `TableCatalog` face of the manifest layer — the last mile of
  * the SQL surface: with
  * {{{
  *   spark.sql.catalog.graft           = graft.plans.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  * }}}
  * a SQL user creates, loads, and drops persistent named manifest
  * tables with DDL alone — the reference's workflow, whose tables are
  * DDL-owned names (`/root/reference/Setup/setup.sql:122-125`), needs
  * no Scala prelude anymore:
  * {{{
  *   CREATE TABLE graft.wm (id BIGINT, v STRING) USING `graft-manifest`
  *     TBLPROPERTIES ('keys' = 'id' [, 'cdf' = 'true']
  *       [, 'deletionVectors' = 'true'] [, 'schemaEvolution' = 'true']
  *       [, 'columnMapping' = 'true']
  *       [, 'path' = '<root>'] [, 'manifest' = '<commit file>'])
  *   INSERT INTO graft.wm ... / MERGE INTO graft.wm ... / OPTIMIZE graft.wm
  *   ALTER TABLE graft.wm RENAME COLUMN v TO val     -- columnMapping only
  *   SELECT * FROM graft.wm
  *   DROP TABLE graft.wm
  * }}}
  * `columnMapping` gives the table a [[graft.sources.SchemaLog]]:
  * files carry immutable physical names, so ALTER TABLE
  * RENAME/ADD/DROP COLUMN are metadata-only edits (see [[alterTable]])
  * and every DML verb evaluates under the CURRENT logical names.
  * Table metadata (declared schema, root, manifest path, merge keys,
  * cdf/DV/evolution flags) persists as one small file per table under
  * `<warehouse>/_catalog/`, written with the same crash-atomic
  * primitives as the manifest itself — `createExclusive` doubles as
  * the concurrent-CREATE guard (two racing CREATEs: one wins, one
  * gets TableAlreadyExists, never a torn metadata file).
  * [[GraftSqlTables.register]] becomes an implementation detail:
  * [[GraftSqlTables.lookup]] falls back to the session's catalogs, so
  * DML on `graft.t` resolves through this file with no prior
  * registration call.
  *
  * Reads resolve to the existing DSv2 provider
  * ([[graft.sources.GraftManifestTable]]): `SELECT` over a catalog
  * table plans the same pruned, stats-skipped, DV-aware scan as
  * `spark.read.format("graft-manifest")`. Batch writes ride the
  * table's V1 InsertableRelation fallback, so Spark's NATIVE
  * `INSERT INTO` / `INSERT OVERWRITE` / `CREATE TABLE ... AS
  * SELECT` / `df.writeTo(...).append()` all plan against catalog
  * tables (each lands one stats-indexed batch dir + one manifest
  * CAS); MERGE/UPDATE/DELETE/OPTIMIZE route through the graft
  * parser/executor as before.
  *
  * A table WITHOUT an explicit 'path' is MANAGED: its root lives
  * under the warehouse and `DROP TABLE` deletes data + metadata
  * (Delta's managed-table contract). With 'path' it is EXTERNAL:
  * `DROP TABLE` removes only the catalog entry.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  // ---- FunctionCatalog: the `bucket` transform resolver -----------
  // Storage-partitioned joins resolve a table's reported
  // `bucket(n, col)` transform against the TABLE'S catalog; serving
  // the function here is what lets Spark prove two graft scans
  // cluster identically (and shuffle a non-bucketed side to match).
  override def listFunctions(namespace: Array[String])
    : Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(Array.empty, "bucket"))
  }

  override def loadFunction(ident: Identifier)
    : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    if (ident.namespace().isEmpty &&
        ident.name().equalsIgnoreCase("bucket"))
      graft.sources.Bucketing.BucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
  }

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  override def capabilities()
    : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      // CREATE TABLE (c INT DEFAULT 5): Spark delivers the default as
      // CURRENT_DEFAULT column metadata inside the declared schema,
      // which the catalog stores verbatim — INSERT column lists and
      // MERGE partial INSERT lists fill from it
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // c GENERATED ALWAYS AS (expr): the expression rides column
      // metadata; write paths compute unlisted generated columns and
      // VALIDATE provided ones (Delta's contract)
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      // c BIGINT GENERATED ALWAYS AS IDENTITY [(START WITH s
      // INCREMENT BY k)]: values allocate from the CAS-fenced batch
      // id (high bits) + a batch-dense row index — unique and
      // direction-monotonic with ZERO coordination beyond the commit
      // the write performs anyway (graft.ops.Ids.fillIdentity)
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  // ---- metadata persistence -------------------------------------

  private def metaPath(table: String) = s"$warehouse/_catalog/$table.tbl"

  private def requireSimpleName(ident: Identifier): String = {
    if (ident.namespace().nonEmpty)
      throw new NoSuchNamespaceException(ident.namespace())
    val n = ident.name()
    require(n.matches("[A-Za-z0-9_]+"),
      s"graft catalog table names are [A-Za-z0-9_]+: got '$n'")
    n
  }

  /** One `k=v` line per field; the schema is Spark's own compact
    * DataType JSON, so round-trips are exact. */
  private def render(meta: Map[String, String]): String =
    meta.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")

  private def parse(path: String): Option[Map[String, String]] = {
    val lines = AtomicText.readLines(path)
    if (lines.isEmpty) None
    else Some(lines.map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"corrupt catalog entry line in $path: $l")
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap)
  }

  private[plans] def entryMeta(table: String): Option[Map[String, String]] =
    parse(metaPath(table))

  /** The [[GraftSqlTables.Entry]] for `table` — what the DML verbs
    * execute against; None when the catalog has no such table. */
  def entryFor(table: String): Option[GraftSqlTables.Entry] =
    entryMeta(table).map { m =>
      GraftSqlTables.Entry(
        root = m("root"), manifestPath = m("manifest"),
        keys = m.getOrElse("keys", "").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq,
        cdf = m.get("cdf").exists(_.toBoolean),
        deletionVectors = m.get("deletionVectors").exists(_.toBoolean),
        schemaEvolution = m.get("schemaEvolution").exists(_.toBoolean),
        schemaJson = m.get("schema"),
        bloomColumns = m.getOrElse("bloomColumns", "").split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq,
        schemaLogPath = m.get("schemaLog"),
        checks = m.collect { case (k, v) if k.startsWith("check.") =>
          k.stripPrefix("check.") -> v }.toSeq.sortBy(_._1),
        clusterBy = m.getOrElse("clusterBy", "").split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq,
        isClone = m.get("clone").exists(_.toBoolean),
        bucketBy = m.get("bucketBy").filter(_.nonEmpty)
          .map(graft.sources.Bucketing.parse))
    }

  // ---- TableCatalog ---------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/_catalog")
    val fs = dir.getFileSystem(hadoopConf)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".tbl"))
      .map(st => Identifier.of(Array.empty,
        st.getPath.getName.stripSuffix(".tbl")))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val name = requireSimpleName(ident)
    val meta = entryMeta(name)
      .getOrElse(throw new NoSuchTableException(ident))
    val root = meta("root")
    val manifest = meta("manifest")
    // columnMapping tables: the SchemaLog is the schema authority —
    // the CREATE-time declared schema is only its first version, and
    // every read/write resolves through the log's current mapping
    val schema = meta.get("schemaLog") match {
      case Some(lp) =>
        val (_, cols) = new graft.sources.SchemaLog(lp).current()
        StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c.logical, c.dataType)))
      case None if meta.get("clone").exists(_.toBoolean) =>
        // a clone's view spans inherited roots — the union merged
        // schema (post-divergence columns included); declared schema
        // serves the (crash-window) empty-manifest state. Declared
        // columns no file carries yet (ALTER ADD COLUMN) overlay the
        // union schema exactly like the plain-table branch below —
        // without this, an ADD on a clone would silently succeed
        // while SELECT of the column failed to resolve.
        val man = new graft.sources.TxnManifest(manifest)
        val (dataDirs, _) = graft.sources.Sinks.splitDv(man.committedDirsAll())
        val declaredC = DataType.fromJson(meta("schema"))
          .asInstanceOf[StructType]
        if (dataDirs.isEmpty) declaredC
        else {
          val live = SparkSession.active.read
            .option("mergeSchema", true).parquet(dataDirs: _*).schema
          StructType(live.fields ++ declaredC.fields.filterNot(df =>
            live.fieldNames.exists(_.equalsIgnoreCase(df.name))))
        }
      case None =>
        // live schema wins (additive evolution shows up); the declared
        // schema serves a created-but-not-yet-loaded table, so the first
        // SELECT of an empty table returns zero rows, not an error.
        // Declared columns no file carries yet (ALTER ADD COLUMN on a
        // plain table) OVERLAY the live schema — parquet clips them
        // to NULL for every existing file, Delta's metadata-only ADD.
        GraftManifestSource
          .mergedSchemaOpt(SparkSession.active, root, manifest) match {
          case None => DataType.fromJson(meta("schema")).asInstanceOf[StructType]
          case Some(live) =>
            val declared = DataType.fromJson(meta("schema"))
              .asInstanceOf[StructType].fields
            StructType(live.fields ++ declared.filterNot(df =>
              live.fieldNames.exists(_.equalsIgnoreCase(df.name))))
        }
    }
    // IDENTITY metadata lives on the DECLARED schema only (live
    // parquet schemas carry no field metadata) — overlay it onto the
    // served schema so the native write path sees the allocation
    // contract and refuses explicit GENERATED ALWAYS values
    val declaredFields = DataType.fromJson(meta("schema"))
      .asInstanceOf[StructType].fields
    val schemaServed = StructType(schema.fields.map { f =>
      declaredFields.find(df => df.name.equalsIgnoreCase(f.name) &&
          org.apache.spark.sql.catalyst.util.IdentityColumn
            .getIdentityInfo(df).nonEmpty)
        .map(df => f.copy(metadata = df.metadata))
        .getOrElse(f)
    })
    // generated-column invariants ride the native write path as
    // synthesized check options — a V1 insert that PROVIDES a
    // generated column gets the same provided-must-match validation
    // the statement INSERT applies
    val genChecks = DataType.fromJson(meta("schema"))
      .asInstanceOf[StructType].fields.toSeq.flatMap(f =>
        org.apache.spark.sql.catalyst.util.GeneratedColumn
          .getGenerationExpression(f)
          .map(g => s"check.generated_${f.name}" -> s"${f.name} <=> ($g)"))
    val opts = Map("path" -> root, "manifest" -> manifest) ++
      // merge keys + behavior flags ride as options so the native
      // SupportsDeleteV2 path has row identity and the DV/CDF config
      meta.get("keys").filter(_.nonEmpty).map("keys" -> _) ++
      meta.get("cdf").map("cdf" -> _) ++
      meta.get("deletionVectors").map("deletionVectors" -> _) ++
      meta.get("bloomColumns").filter(_.nonEmpty).map("bloomColumns" -> _) ++
      meta.get("schemaLog").map("schemaLog" -> _) ++
      meta.get("bucketBy").filter(_.nonEmpty).map("bucketBy" -> _) ++
      // CHECK constraints ride as options so the native V1 batch
      // write enforces them too (option keys lowercase by contract)
      meta.collect { case (k, v) if k.startsWith("check.") => k -> v } ++
      // informational key constraints surface through SHOW TBLPROPERTIES
      meta.collect { case (k, v) if k.startsWith("info.") => k -> v } ++
      // shallow clones read the UNION of every root the manifest
      // names (inherited + own); per-root write paths refuse
      meta.get("clone").filter(_.toBoolean).map("union" -> _) ++
      genChecks
    new GraftManifestTable(schemaServed,
      new CaseInsensitiveStringMap(opts.asJava))
  }

  /** `CREATE TABLE <this-catalog>.<name> SHALLOW CLONE <src>` — the
    * zero-copy fork: a fresh MANAGED table whose manifest names the
    * source's committed dirs ([[graft.sources.TxnManifest.cloneFrom]],
    * one CAS commit, no data moved). The clone diverges through its
    * own DML (inserts append under its root; merges copy-on-write
    * affected SOURCE dirs into clone-root rewrites — the source never
    * changes); the source's later commits stay invisible. Inherited
    * flags: merge keys only — cdf / deletionVectors / bloom /
    * columnMapping / clusterBy do not survive the fork (their state
    * is root-scoped), and OPTIMIZE / TRUNCATE / time travel /
    * streaming refuse on clones until materialization lands. Delta's
    * vacuum hazard applies: vacuuming the SOURCE can delete history a
    * live clone still references. */
  def createShallowClone(ident: Identifier,
                         src: GraftSqlTables.Entry,
                         srcSchema: StructType,
                         asOfVersion: Option[Long] = None): Table = {
    val name = requireSimpleName(ident)
    require(src.schemaLogPath.isEmpty,
      "graft catalog: SHALLOW CLONE of a columnMapping table is not " +
        "supported — the SchemaLog is root-scoped state the clone " +
        "cannot share")
    // a clone CAN fork a clone: the new manifest snapshots the
    // parent's whole union view (allRoots below), and union reads /
    // cross-root merges already span arbitrary root sets. A SNAPSHOT
    // clone of a clone stays refused for the same reason time travel
    // on clones does — the parent's historical view would drop
    // inherited rows.
    require(!(src.isClone && asOfVersion.nonEmpty),
      "graft catalog: VERSION/TIMESTAMP AS OF clone of a shallow " +
        "clone is not supported — materialize the parent first, or " +
        "snapshot-clone the original SOURCE table")
    val root = s"$warehouse/$name"
    val manifest = s"$root/_commits"
    val meta = Map(
      "schema" -> srcSchema.json,
      "root" -> root,
      "manifest" -> manifest,
      "keys" -> src.keys.mkString(","),
      "cdf" -> "false",
      "deletionVectors" -> "false",
      "schemaEvolution" -> src.schemaEvolution.toString,
      "bloomColumns" -> "",
      "clusterBy" -> "",
      "external" -> "false",
      "clone" -> "true") ++
      // bucketBy SURVIVES the fork: layout markers live per batch dir
      // (inherited dirs carry theirs), the routing function is
      // global, and every clone write path (insert, cross-root
      // merge, materialization) routes + marks under the clone's
      // root — the zero-copy fork of a bucketed fact table keeps its
      // exchange-free joins
      src.bucketBy.map(b =>
        "bucketBy" -> graft.sources.Bucketing.render(b))
    if (!AtomicText.createExclusive(metaPath(name), render(meta)))
      throw new TableAlreadyExistsException(ident)
    // after winning the name: one CAS snapshot of the source's view.
    // A crash here leaves an empty-manifest clone (reads serve the
    // declared schema, zero rows) — DROP and re-CREATE it.
    new graft.sources.TxnManifest(manifest)
      .cloneFrom(new graft.sources.TxnManifest(src.manifestPath), src.root,
        atVersion = asOfVersion, allRoots = src.isClone)
    loadTable(ident)
  }

  /** Flip a materialized clone to a plain table (its manifest now
    * references only its own root — [[GraftOptimizeCommand]]'s
    * materialization commit precedes this metadata edit; a crash
    * between them leaves a clone-flagged table whose union view ==
    * its root view, correct just conservative). */
  private[plans] def markMaterialized(table: String): Unit = {
    val meta = entryMeta(table).getOrElse(throw new NoSuchTableException(
      Identifier.of(Array.empty, table)))
    AtomicText.writeAtomically(metaPath(table),
      render(meta.updated("clone", "false")))
  }

  /** SQL time travel — `SELECT ... FROM <cat>.<t> VERSION AS OF <v>`:
    * `v` is a MANIFEST version (the numbers `DESCRIBE HISTORY` and
    * `RESTORE TO VERSION AS OF` use), served from that version's
    * claim tombstone so merges/restores replay faithfully. The schema
    * is the HISTORICAL one (inferred over that version's dirs), not
    * today's — a column added later does not appear in the past. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF takes a manifest version " +
          s"number (DESCRIBE HISTORY's versions), got '$version'"))
    travelTable(ident, v)
  }

  /** `... TIMESTAMP AS OF <ts>` — Spark hands the timestamp in
    * MICROseconds; resolved against the commit clock
    * ([[graft.sources.TxnManifest.versionAt]], millis). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val name = requireSimpleName(ident)
    val meta = entryMeta(name)
      .getOrElse(throw new NoSuchTableException(ident))
    val man = new graft.sources.TxnManifest(meta("manifest"))
    travelTable(ident, man.versionAt(timestampMicros / 1000))
  }

  private def travelTable(ident: Identifier, version: Long): Table = {
    val name = requireSimpleName(ident)
    val meta = entryMeta(name)
      .getOrElse(throw new NoSuchTableException(ident))
    // a shallow clone's historical view spans the SOURCE's dirs too;
    // the root filter below would silently drop every inherited row.
    // Refuse (matching the scaladoc) until the clone is materialized.
    require(!meta.get("clone").contains("true"),
      s"graft catalog: time travel on shallow clone '$name' is not " +
        "supported — the historical view would drop inherited source " +
        "rows; materialize the clone (OPTIMIZE) first, or time-travel " +
        "the SOURCE table")
    val root = meta("root")
    val manifest = meta("manifest")
    val man = new graft.sources.TxnManifest(manifest)
    val dirs = man.stateAt(version).toSeq.sortBy(_._1)
      .flatMap(_._2).filter(_.startsWith(root + "/"))
    if (dirs.isEmpty)
      throw new IllegalStateException(
        s"nothing committed under $root at manifest version $version")
    val (dataDirs, _) = graft.sources.Sinks.splitDv(dirs)
    // a mapped table time-travels under its CURRENT logical names
    // (the SchemaLog is not manifest-versioned — same rule as the
    // change feed, which serves history under today's names); plain
    // tables serve the HISTORICAL file schema
    val schema = meta.get("schemaLog") match {
      case Some(lp) =>
        val (_, cols) = new graft.sources.SchemaLog(lp).current()
        StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c.logical, c.dataType)))
      case None =>
        SparkSession.active.read
          .option("mergeSchema", true).parquet(dataDirs: _*).schema
    }
    new GraftManifestTable(schema, new CaseInsensitiveStringMap((Map(
      "path" -> root, "manifest" -> manifest,
      "atVersion" -> version.toString) ++
      meta.get("schemaLog").map("schemaLog" -> _)).asJava))
  }

  /** The connector-Column overload Spark's CREATE TABLE exec calls:
    * the stock Column[]→StructType bridge keeps DEFAULT metadata but
    * DROPS generation expressions, so fold them back into column
    * metadata before delegating — the write paths read them from the
    * stored schema ([[GraftSqlTables.generatedCols]]). Identity
    * columns are rejected loudly (no distributed high-water-mark
    * allocator here — an honest gap, not a silent one). */
  override def createTable(
      ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val base = org.apache.spark.sql.graftbridge.CatalogBridge
      .v2ColumnsToStructType(columns)
    val withGen = StructType(base.fields.zip(columns).map { case (f, c) =>
      val gen = Option(c.generationExpression()).map { g =>
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
            .GENERATION_EXPRESSION_METADATA_KEY, g)
          .build()
      }
      // identity spec folds into the stored schema the same way the
      // generation expression does (the stock bridge drops both);
      // the write paths read it back via IdentityColumn.getIdentityInfo
      val idn = Option(c.identityColumnSpec()).map { spec =>
        require(f.dataType == org.apache.spark.sql.types.LongType,
          s"graft catalog: IDENTITY column '${c.name()}' must be BIGINT " +
            s"(got ${f.dataType.sql}) — the batch-id allocation needs " +
            "the full 64-bit range")
        val ic = org.apache.spark.sql.catalyst.util.IdentityColumn
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(gen.getOrElse(f.metadata))
          .putLong(ic.IDENTITY_INFO_START, spec.getStart)
          .putLong(ic.IDENTITY_INFO_STEP, spec.getStep)
          .putBoolean(ic.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            spec.isAllowExplicitInsert)
          .build()
      }
      idn.orElse(gen).map(m => f.copy(metadata = m)).getOrElse(f)
    })
    createTable(ident, withGen, partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val name = requireSimpleName(ident)
    require(partitions.isEmpty,
      s"graft catalog: PARTITIONED BY is not supported — layout is " +
        "manifest-managed: 'bucketBy' for join co-location, " +
        "'clusterBy' / OPTIMIZE ZORDER BY for skipping, and " +
        "stats-proved retention DELETEs give the O(1) aged-slice " +
        "drop directory partitioning would")
    require(schema.nonEmpty,
      "graft catalog: CREATE TABLE needs a schema — an explicit " +
        "column list, or AS SELECT (the query's schema)")
    Option(properties.get(TableCatalog.PROP_PROVIDER)).foreach { p =>
      require(p.equalsIgnoreCase("graft-manifest"),
        s"graft catalog tables must be USING graft-manifest, got '$p'")
    }
    def prop(k: String): Option[String] =
      Option(properties.get(k))
        .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + k)))
    val external = prop("path").isDefined
    val root = prop("path").map(_.stripSuffix("/"))
      .getOrElse(s"$warehouse/$name")
    val manifest = prop("manifest").getOrElse(s"$root/_commits")
    val keys = prop("keys").toSeq.flatMap(_.split(','))
      .map(_.trim).filter(_.nonEmpty)
    keys.foreach(k => require(schema.fieldNames.exists(_.equalsIgnoreCase(k)),
      s"graft catalog: key '$k' is not a column of the declared schema " +
        s"(${schema.fieldNames.mkString(", ")})"))
    val bloomCols = prop("bloomColumns").toSeq.flatMap(_.split(','))
      .map(_.trim).filter(_.nonEmpty)
    bloomCols.foreach { c =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"graft catalog: bloomColumns names '$c', absent from the schema"))
      require(graft.sources.BloomIndex.indexable(f.dataType),
        s"graft catalog: bloomColumns column '$c' has unindexable type " +
          f.dataType.simpleString)
    }
    // columnMapping: files carry immutable physical names resolved
    // through a SchemaLog, which unlocks ALTER TABLE RENAME/ADD/DROP
    // COLUMN as metadata-only edits (zero data rewritten)
    val mapping = prop("columnMapping").exists(_.toBoolean)
    if (mapping) {
      // columnMapping COMPOSES with bloomColumns (round 12, the
      // bucketing recipe): sidecars key on the immutable PHYSICAL
      // file columns — the write path translates the declared
      // logical names per batch, and the merge/delete probes already
      // speak physical on mapped tables — so a RENAME COLUMN never
      // detaches point-lookup pruning (the meta's logical list
      // follows the rename; nothing on disk moves)
      require(!prop("schemaEvolution").exists(_.toBoolean),
        "graft catalog: columnMapping and schemaEvolution are mutually " +
          "exclusive — mapped tables evolve through ALTER TABLE ADD " +
          "COLUMN, not write-side drift")
      require(!org.apache.spark.sql.catalyst.util.GeneratedColumn
          .hasGeneratedColumns(schema),
        "graft catalog: columnMapping and GENERATED columns are mutually " +
          "exclusive — the mapping's SchemaLog does not carry generation " +
          "expressions")
    }
    val schemaLogPath = if (mapping) Some(s"$root/_schema_log") else None
    // bucketBy: hash-bucketed layout for storage-partitioned joins.
    // Composes with columnMapping (markers carry the immutable
    // PHYSICAL key names, so renames never detach the layout) and
    // with deletionVectors (DV deletes move no rows; DV updates'
    // appended batches bucket-route like any other write).
    val bucketBy = prop("bucketBy").map(graft.sources.Bucketing.parse)
    bucketBy.foreach { b =>
      require(b.gen == 0,
        "graft catalog: the ';gen=' layout-generation suffix is " +
          "engine-managed (bumped by ALTER COLUMN TYPE on a bucket " +
          "key) — declare bucketBy without it")
      b.keys.foreach { k =>
        require(schema.fieldNames.exists(_.equalsIgnoreCase(k)),
          s"graft catalog: bucketBy names '$k', absent from the " +
            s"schema (${schema.fieldNames.mkString(", ")})")
      }
    }
    // clusterBy: declared clustering columns — a bare OPTIMIZE
    // maintains this z-order (Delta's liquid-clustering UX)
    val clusterBy = prop("clusterBy").toSeq.flatMap(_.split(','))
      .map(_.trim).filter(_.nonEmpty)
    clusterBy.foreach(c => require(
      schema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"graft catalog: clusterBy names '$c', absent from the schema " +
        s"(${schema.fieldNames.mkString(", ")})"))
    val meta = Map(
      "schema" -> schema.json,
      "root" -> root,
      "manifest" -> manifest,
      "keys" -> keys.mkString(","),
      "cdf" -> prop("cdf").exists(_.toBoolean).toString,
      "deletionVectors" -> prop("deletionVectors").exists(_.toBoolean).toString,
      "schemaEvolution" -> prop("schemaEvolution").exists(_.toBoolean).toString,
      "bloomColumns" -> bloomCols.mkString(","),
      "clusterBy" -> clusterBy.mkString(","),
      "external" -> external.toString) ++
      schemaLogPath.map("schemaLog" -> _) ++
      bucketBy.map(b => "bucketBy" -> graft.sources.Bucketing.render(b)) ++
      // a later UNSET keeps this flag (and the bucketGen counter):
      // surviving markers mean a re-SET must account for them
      bucketBy.map(_ => "everBucketed" -> "true")
    // exclusive create IS the exists check — two racing CREATEs
    // cannot both win, and neither can observe a torn file
    if (!AtomicText.createExclusive(metaPath(name), render(meta)))
      throw new TableAlreadyExistsException(ident)
    // init the mapping only after winning the metadata race; an
    // EXTERNAL table whose root already carries a log re-attaches to
    // it (the log, not the CREATE statement, owns the evolved schema)
    schemaLogPath.foreach { lp =>
      val log = new graft.sources.SchemaLog(lp)
      if (log.current()._2.isEmpty) log.init(schema)
    }
    loadTable(ident)
  }

  /** Column DDL on columnMapping tables — each change is one
    * metadata-only [[graft.sources.SchemaLog]] edit (zero data files
    * touched, Delta's columnMapping contract):
    * {{{
    *   ALTER TABLE graft.t RENAME COLUMN a TO b
    *   ALTER TABLE graft.t ADD COLUMN c STRING
    *   ALTER TABLE graft.t DROP COLUMN c
    *   ALTER TABLE graft.t SET TBLPROPERTIES ('cdf' = 'true')
    * }}}
    * Renaming a merge-key column follows it into the table's `keys`.
    * Property changes are limited to the behavior toggles the catalog
    * understands; retype (UpdateColumnType) is WIDEN-ONLY — int chain
    * up / float→double / decimal precision-up are metadata-only
    * (readers promote old files); narrowing still refuses with the
    * SchemaLog's no-silent-cast rule (ADD + backfill instead).
    * Non-mapped tables reject column DDL with guidance: physical file
    * columns ARE their names there, so a rename would need a rewrite. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val name = requireSimpleName(ident)
    val meta = entryMeta(name)
      .getOrElse(throw new NoSuchTableException(ident))
    def log = new graft.sources.SchemaLog(meta.getOrElse("schemaLog",
      throw new UnsupportedOperationException(
        "graft catalog: RENAME/DROP COLUMN and retype need a " +
          "columnMapping table — CREATE TABLE ... TBLPROPERTIES " +
          "('columnMapping' = 'true'); this table's files carry logical " +
          "names, so a rename would rewrite data (ADD COLUMN works on " +
          "plain tables, and schema still evolves additively through " +
          "writes)")))
    val behaviorProps = Set("cdf", "deletionVectors", "schemaEvolution")
    var newMeta = meta
    def single(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"graft catalog: nested-column $what is not supported " +
          s"(got ${fieldNames.mkString(".")})")
      fieldNames.head
    }
    def keysOf(m: Map[String, String]): Seq[String] =
      m.getOrElse("keys", "").split(',').map(_.trim).filter(_.nonEmpty).toSeq
    changes.foreach {
      case r: TableChange.RenameColumn =>
        val from = single(r.fieldNames(), "rename")
        // stored EXPRESSIONS (CHECK constraints, generation
        // expressions, column DEFAULTs) reference columns by NAME in
        // SQL text a metadata rename cannot rewrite — refuse instead
        // of silently orphaning the reference
        val declared0 = DataType.fromJson(newMeta("schema"))
          .asInstanceOf[StructType]
        val exprSqls =
          newMeta.collect { case (k, v) if k.startsWith("check.") => v } ++
            declared0.fields.toSeq.flatMap { f =>
              org.apache.spark.sql.catalyst.util.GeneratedColumn
                .getGenerationExpression(f).toSeq ++
                (if (f.metadata.contains("CURRENT_DEFAULT"))
                   Seq(f.metadata.getString("CURRENT_DEFAULT"))
                 else Nil)
            }
        val ref = ("(?i)(?<![A-Za-z0-9_`])" +
          java.util.regex.Pattern.quote(from) + "(?![A-Za-z0-9_`])").r
        // backtick-QUOTED references (CHECK (`v` > 0)) must hit the
        // guard too: the quoted form slips past the word-boundary
        // lookarounds, so scan with the backticks blanked out —
        // tokens never merge (each backtick becomes a separator)
        require(!exprSqls.exists(e =>
            ref.findFirstIn(e.replace('`', ' ')).isDefined),
          s"graft catalog: cannot RENAME '$from' — a CHECK constraint, " +
            "GENERATED expression, or DEFAULT references it by name; " +
            "drop the referencing constraint/column first")
        log.rename(from, r.newName())
        // the rename follows into the DECLARED schema too: IDENTITY /
        // DEFAULT / GENERATED metadata key on the declared field name,
        // and a stale name would silently detach them (identity
        // allocation writing NULLs was the concrete failure)
        if (declared0.fieldNames.exists(_.equalsIgnoreCase(from)))
          newMeta += ("schema" -> StructType(declared0.fields.map(f =>
            if (f.name.equalsIgnoreCase(from)) f.copy(name = r.newName())
            else f)).json)
        val ks = keysOf(newMeta)
        if (ks.exists(_.equalsIgnoreCase(from)))
          newMeta += ("keys" -> ks.map(k =>
            if (k.equalsIgnoreCase(from)) r.newName() else k).mkString(","))
        // the rename follows into clusterBy: a stale declared
        // clustering column would wedge the next bare OPTIMIZE with
        // an unmappable-name failure
        val cb = newMeta.getOrElse("clusterBy", "").split(',')
          .map(_.trim).filter(_.nonEmpty)
        if (cb.exists(_.equalsIgnoreCase(from)))
          newMeta += ("clusterBy" -> cb.map(c =>
            if (c.equalsIgnoreCase(from)) r.newName() else c).mkString(","))
        // ... and into bloomColumns (the sidecars key on the
        // immutable PHYSICAL names, so coverage survives; only the
        // declared logical list needs the new name)
        val bc = newMeta.getOrElse("bloomColumns", "").split(',')
          .map(_.trim).filter(_.nonEmpty)
        if (bc.exists(_.equalsIgnoreCase(from)))
          newMeta += ("bloomColumns" -> bc.map(c =>
            if (c.equalsIgnoreCase(from)) r.newName() else c).mkString(","))
        // ... and into the bucket spec (the spec's keys are LOGICAL;
        // the recorded layout markers carry the immutable physical
        // twins, so nothing on disk moves)
        newMeta.get("bucketBy").filter(_.nonEmpty)
          .map(graft.sources.Bucketing.parse)
          .filter(_.keys.exists(_.equalsIgnoreCase(from)))
          .foreach { b =>
            newMeta += ("bucketBy" -> graft.sources.Bucketing.render(
              b.copy(keys = b.keys.map(k =>
                if (k.equalsIgnoreCase(from)) r.newName() else k))))
          }
      case a: TableChange.AddColumn =>
        require(a.position() == null,
          "graft catalog: ADD COLUMN FIRST/AFTER is not supported — " +
            "column order is the add order")
        val ac = single(a.fieldNames(), "add")
        // a NOT NULL addition over existing rows is a lie (they all
        // serve NULL) — Delta refuses it on non-empty tables; we
        // refuse it always (add nullable + backfill + constraint)
        require(a.isNullable,
          s"graft catalog: ADD COLUMN '$ac' NOT NULL is not supported " +
            "— existing rows would serve NULL for it; add it nullable " +
            "and backfill, then ADD CONSTRAINT")
        meta.get("schemaLog") match {
          case Some(_) => log.add(ac, a.dataType())
          case None =>
            // PLAIN tables take metadata-only ADD too (Delta needs no
            // column mapping for it): the column appends to the
            // DECLARED schema, the served schema overlays it, and
            // parquet clips it to NULL for every existing file. Only
            // rename/drop need the mapping (physical file columns
            // ARE their names there).
            val declared = DataType.fromJson(newMeta("schema"))
              .asInstanceOf[StructType]
            require(!declared.fieldNames.exists(_.equalsIgnoreCase(ac)),
              s"graft catalog: column '$ac' already exists")
            val withComment = Option(a.comment()).fold(
              org.apache.spark.sql.types.StructField(ac, a.dataType()))(c =>
              org.apache.spark.sql.types.StructField(ac, a.dataType())
                .withComment(c))
            newMeta += ("schema" -> declared.add(withComment).json)
        }
      case d: TableChange.DeleteColumn =>
        val c = single(d.fieldNames(), "drop")
        require(!keysOf(newMeta).exists(_.equalsIgnoreCase(c)),
          s"graft catalog: cannot DROP merge-key column '$c' — row " +
            "identity would be undefined; change keys first")
        require(!newMeta.get("bucketBy").filter(_.nonEmpty)
            .map(graft.sources.Bucketing.parse)
            .exists(_.keys.exists(_.equalsIgnoreCase(c))),
          s"graft catalog: cannot DROP bucket-key column '$c' — the " +
            "bucketed layout routes every write and join on it")
        // an indexed column leaves the bloom list with its drop (the
        // index is an optimization, not identity — nothing refuses)
        val dbc = newMeta.getOrElse("bloomColumns", "").split(',')
          .map(_.trim).filter(_.nonEmpty)
        if (dbc.exists(_.equalsIgnoreCase(c)))
          newMeta += ("bloomColumns" ->
            dbc.filterNot(_.equalsIgnoreCase(c)).mkString(","))
        log.drop(c)
      // ALTER COLUMN c TYPE <t> — WIDEN-ONLY retype (Delta's
      // type-widening feature): metadata-only, zero files touched;
      // every reader requests the widened type and the parquet
      // reader promotes narrower old files. Narrowing refuses inside
      // SchemaLog.retype.
      case t: TableChange.UpdateColumnType =>
        val rc = single(t.fieldNames(), "retype")
        log.retype(rc, t.newDataType())
        // a bucket key's TYPE is part of the routing function:
        // murmur3 hashes int 5 and bigint 5 differently, so after a
        // widen every existing file's recorded bucket is computed by
        // a DIFFERENT function than the one reads/joins now hash
        // with. The key name and count survive, so the marker header
        // alone would still MATCH — bump the layout GENERATION
        // instead: every existing header mismatches, the scan
        // degrades to a shuffle (correct, never a stale grouping),
        // and the next OPTIMIZE rewrites each dir hashed under the
        // widened type and stamps the new generation (its
        // `_optimized` tag carries the same render, so incremental
        // passes treat every pre-widen generation as fresh input).
        // The REBUCKET degrade→heal lifecycle, triggered by type.
        // While UNBUCKETED, any widen on an ever-bucketed table
        // still bumps the stored counter: surviving markers were
        // hashed under pre-widen types, and a later SET bucketBy
        // must never render a header they match.
        val curSpec = newMeta.get("bucketBy").filter(_.nonEmpty)
          .map(graft.sources.Bucketing.parse)
        val curGen = math.max(
          newMeta.get("bucketGen").flatMap(_.toIntOption).getOrElse(0),
          curSpec.map(_.gen).getOrElse(0))
        val everBucketed = curSpec.isDefined ||
          newMeta.get("everBucketed").exists(_.toBoolean)
        val isKey = curSpec.exists(_.keys.exists(_.equalsIgnoreCase(rc)))
        if (isKey || (curSpec.isEmpty && everBucketed)) {
          newMeta += ("bucketGen" -> (curGen + 1).toString)
          curSpec.filter(_.keys.exists(_.equalsIgnoreCase(rc)))
            .foreach(b => newMeta += ("bucketBy" ->
              graft.sources.Bucketing.render(b.copy(gen = curGen + 1))))
        }
      case sp: TableChange.SetProperty if sp.property() == "clusterBy" =>
        // re-clustering declaration: takes effect at the next bare
        // OPTIMIZE (Delta's ALTER TABLE ... CLUSTER BY shape)
        val cols = sp.value().split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val have = meta.get("schemaLog") match {
          case Some(lp) =>
            new graft.sources.SchemaLog(lp).current()._2.map(_.logical)
          case None => DataType.fromJson(meta("schema"))
            .asInstanceOf[StructType].fieldNames.toSeq
        }
        cols.foreach(c => require(have.exists(_.equalsIgnoreCase(c)),
          s"graft catalog: clusterBy names '$c', absent from the schema " +
            s"(${have.mkString(", ")})"))
        newMeta += ("clusterBy" -> cols.mkString(","))
      case sp: TableChange.SetProperty if sp.property() == "bucketBy" =>
        // REBUCKET — the grown-table lifecycle op ("10× the data,
        // double the buckets"): the spec changes as metadata; every
        // existing dir's marker now MISMATCHES, so the scan degrades
        // to a shuffle (correct results, never a wrong grouping)
        // until the next OPTIMIZE heals the whole table into the new
        // width (nothing matches the new generation tag, so the
        // incremental pass rewrites everything once). New writes
        // route under the new spec immediately.
        val b0 = graft.sources.Bucketing.parse(sp.value())
        require(b0.gen == 0,
          "graft catalog: the ';gen=' layout-generation suffix is " +
            "engine-managed — declare bucketBy without it")
        // the CURRENT generation carries over (and survives an
        // UNSET via the stored counter): after a bucket-key retype
        // (gen >= 1), a rebucket back to the original '<n>,<keys>'
        // string must NOT render the pre-retype header — those dirs'
        // buckets were hashed under the narrower type and matching
        // them again would silently mis-group joins
        val b = b0.copy(gen = math.max(
          newMeta.get("bucketGen").flatMap(_.toIntOption).getOrElse(0),
          newMeta.get("bucketBy").filter(_.nonEmpty)
            .map(graft.sources.Bucketing.parse(_).gen).getOrElse(0)))
        newMeta += ("everBucketed" -> "true")
        val haveB = meta.get("schemaLog") match {
          case Some(lp) =>
            new graft.sources.SchemaLog(lp).current()._2.map(_.logical)
          case None => DataType.fromJson(meta("schema"))
            .asInstanceOf[StructType].fieldNames.toSeq
        }
        b.keys.foreach(k => require(haveB.exists(_.equalsIgnoreCase(k)),
          s"graft catalog: bucketBy names '$k', absent from the schema " +
            s"(${haveB.mkString(", ")})"))
        newMeta += ("bucketBy" -> graft.sources.Bucketing.render(b))
      case rp: TableChange.RemoveProperty if rp.property() == "bucketBy" =>
        // UNBUCKET: the table serves as plain from here (markers
        // become inert); reversible with a later SET + OPTIMIZE
        newMeta += ("bucketBy" -> "")
      case sp: TableChange.SetProperty =>
        require(behaviorProps.contains(sp.property()),
          s"graft catalog: ALTER ... SET TBLPROPERTIES supports only " +
            s"${behaviorProps.mkString(", ")} and clusterBy; " +
            s"'${sp.property()}' is CREATE-time-only")
        require(sp.value() == "true" || sp.value() == "false",
          s"graft catalog: property '${sp.property()}' takes " +
            s"'true'/'false', got '${sp.value()}'")
        require(!(sp.property() == "schemaEvolution" && sp.value() == "true" &&
            meta.contains("schemaLog")),
          "graft catalog: columnMapping and schemaEvolution are mutually " +
            "exclusive — mapped tables evolve through ALTER TABLE ADD COLUMN")
        newMeta += (sp.property() -> sp.value())
      case rp: TableChange.RemoveProperty =>
        require(behaviorProps.contains(rp.property()),
          s"graft catalog: ALTER ... UNSET TBLPROPERTIES supports only " +
            s"${behaviorProps.mkString(", ")}")
        newMeta += (rp.property() -> "false")
      // CHECK constraints (Delta's ADD CONSTRAINT ... CHECK): stored
      // as predicate SQL in the table metadata, enforced by EVERY
      // write path (statement INSERT, native V1 write, MERGE/UPDATE
      // arms) with a batch-aborting loud failure — the reference's
      // integrity-assert-and-abort semantics
      // (`utils/custom_err.py:1-6`) as a declarative table property
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
            val cname = chk.name().toLowerCase(java.util.Locale.ROOT)
            require(cname.matches("[a-z0-9_]+"),
              s"graft catalog: constraint names are [a-z0-9_]+: got '$cname'")
            require(!newMeta.contains(s"check.$cname"),
              s"graft catalog: constraint '$cname' already exists")
            val sql = Option(chk.predicateSql()).filter(_.nonEmpty)
              .getOrElse(throw new IllegalArgumentException(
                s"graft catalog: CHECK constraint '$cname' has no " +
                  "predicate SQL"))
            // Delta's rule: existing rows must already satisfy it —
            // an ADD over violating data fails, never quietly lies
            val spark = SparkSession.active
            val man = new graft.sources.TxnManifest(meta("manifest"))
            if (man.committedDirs(meta("root")).nonEmpty) {
              val cur = meta.get("schemaLog") match {
                case Some(lp) => graft.sources.SchemaLog.readCommittedMapped(
                  spark, meta("root"), man, new graft.sources.SchemaLog(lp))
                case None =>
                  graft.sources.Sinks.readCommitted(spark, meta("root"), man)
              }
              import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
              val bad = cur.where(not(coalesce(expr(sql), lit(true))))
                .limit(1).count()
              require(bad == 0,
                s"graft catalog: cannot ADD CONSTRAINT '$cname' — existing " +
                  s"rows violate CHECK ($sql)")
            }
            newMeta += (s"check.$cname" -> sql)
          // PRIMARY KEY / UNIQUE / FOREIGN KEY: informational only
          // (Delta/Databricks RELY semantics) — enforcing uniqueness
          // would cost a full shuffle probe per write at 100 TB, and
          // row identity already comes from the merge keys. Declared
          // NOT ENFORCED they persist (optimizer hints, DDL-migration
          // compatibility with the reference's PK-carrying setup.sql);
          // ENFORCED refuses loudly.
          case c@(_: org.apache.spark.sql.connector.catalog.constraints.PrimaryKey |
                  _: org.apache.spark.sql.connector.catalog.constraints.Unique |
                  _: org.apache.spark.sql.connector.catalog.constraints.ForeignKey) =>
            require(!c.enforced(),
              s"graft catalog: ${c.name()} cannot be ENFORCED — key/unique " +
                "enforcement is a full shuffle per write at scale; declare " +
                "it NOT ENFORCED (informational) — row identity is already " +
                "the table's merge keys")
            val cname = c.name().toLowerCase(java.util.Locale.ROOT)
            require(cname.matches("[a-z0-9_]+"),
              s"graft catalog: constraint names are [a-z0-9_]+: got '$cname'")
            newMeta += (s"info.$cname" -> c.toDDL)
          case c => throw new UnsupportedOperationException(
            s"graft catalog: unsupported constraint type for " +
              s"'${c.name()}' — supported: CHECK (enforced), " +
              "PRIMARY KEY / UNIQUE / FOREIGN KEY (informational)")
        }
      case dc: TableChange.DropConstraint =>
        val cname = dc.name().toLowerCase(java.util.Locale.ROOT)
        if (newMeta.contains(s"check.$cname")) newMeta -= s"check.$cname"
        else if (newMeta.contains(s"info.$cname")) newMeta -= s"info.$cname"
        else require(dc.ifExists(),
          s"graft catalog: no constraint '$cname' to drop " +
            "(use IF EXISTS to tolerate)")
      case c => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change " +
          s"${c.getClass.getSimpleName} — supported: RENAME COLUMN, " +
          "ADD COLUMN, DROP COLUMN (columnMapping tables), and " +
          "SET/UNSET TBLPROPERTIES for the behavior toggles; retype is " +
          "deliberately rejected (widen by ADD + backfill)")
    }
    if (newMeta != meta)
      AtomicText.writeAtomically(metaPath(name), render(newMeta))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val name = requireSimpleName(ident)
    entryMeta(name) match {
      case None => false
      case Some(meta) =>
        val fs = new org.apache.hadoop.fs.Path(warehouse)
          .getFileSystem(hadoopConf)
        // managed tables own their data: root (under the warehouse)
        // goes with the entry; external tables keep their files
        if (!meta.get("external").exists(_.toBoolean)) {
          val root = new org.apache.hadoop.fs.Path(meta("root"))
          if (fs.exists(root)) fs.delete(root, true)
          val man = new org.apache.hadoop.fs.Path(meta("manifest"))
          // version claims live as siblings <manifest>.v<N>
          val dir = man.getParent
          if (dir != null && fs.exists(dir))
            fs.listStatus(dir).filter(_.getPath.getName
              .startsWith(man.getName)).foreach(st =>
              fs.delete(st.getPath, false))
        }
        fs.delete(new org.apache.hadoop.fs.Path(metaPath(name)), false)
        GraftSqlTables.unregister(s"$catalogName.$name")
        true
    }
  }

  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  /** `ALTER TABLE <cat>.<old> RENAME TO <new>` — a metadata-only move
    * of the catalog entry; the data root and manifest stay where they
    * are (for a MANAGED table the root keeps its creation-time
    * directory name — the name in the catalog, not the path, is the
    * table's identity, Delta's rule). The exclusive create on the new
    * entry is the race guard: two renames (or a rename racing a
    * CREATE) cannot both win. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = requireSimpleName(oldIdent)
    val to = requireSimpleName(newIdent)
    val meta = entryMeta(from)
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (!AtomicText.createExclusive(metaPath(to), render(meta)))
      throw new TableAlreadyExistsException(newIdent)
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(hadoopConf)
    fs.delete(new org.apache.hadoop.fs.Path(metaPath(from)), false)
    GraftSqlTables.unregister(s"$catalogName.$from")
  }

  // ---- SupportsNamespaces (single flat namespace) ----------------

  override def listNamespaces(): Array[Array[String]] = Array.empty

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty

  override def loadNamespaceMetadata(namespace: Array[String])
    : util.Map[String, String] =
    if (namespace.isEmpty) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are flat — tables live at <catalog>.<name>")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are flat")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are flat")

  private def hadoopConf =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
}
