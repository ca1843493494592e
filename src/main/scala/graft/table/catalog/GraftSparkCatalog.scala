package graft.table.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.{GraftSnapshot, GraftTable, SnapshotLog, TableMetadata}

/**
 * DataSource-V2 `TableCatalog` over graft tables, giving the reference's SQL
 * surface natively (reference IcebergSupport.scala:20 configures the same
 * shape for Iceberg):
 *
 * {{{
 * spark.sql.catalog.graft           = graft.table.catalog.GraftSparkCatalog
 * spark.sql.catalog.graft.warehouse = /path/to/warehouse
 *
 * SELECT * FROM graft.finance.activity
 * SELECT * FROM graft.finance.activity VERSION AS OF 'day1'     -- branch ref
 * SELECT * FROM graft.finance.activity VERSION AS OF 3          -- snapshot id
 * SELECT * FROM graft.finance.activity TIMESTAMP AS OF '...'    -- time travel
 * }}}
 *
 * Reads resolve a snapshot (driver-side metadata lookup) and expose its
 * live file list through Spark's own vectorized `ParquetTable`, so scans get
 * stock pushdown/pruning/codegen. `INSERT INTO` appends through the
 * transactional `GraftTable.append` commit (distributed parquet write, then
 * one snapshot-log commit — reference IcebergLoadActivityTask.scala:64-76
 * does all writes through SQL the same way); overwrite modes are rejected
 * so SQL can never bypass the snapshot log, and time-travel reads stay
 * read-only.
 */
class GraftSparkCatalog extends TableCatalog with ProcedureCatalog
  with org.apache.spark.sql.connector.catalog.FunctionCatalog
  with ViewCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must be set"))
  }

  override def name(): String = catalogName

  /** Declares column-default DDL support (`CREATE TABLE (c INT DEFAULT 5)`,
    * `ALTER TABLE … ADD COLUMN … DEFAULT`, `ALTER COLUMN … SET/DROP
    * DEFAULT`): without this, Spark's analyzer rejects the statements
    * before [[createTable]]/[[alterTable]] ever see them. */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** Catalog slot on disk for `ident` — BEFORE `graft.ref` indirection. */
  private def rawLocation(ident: Identifier): String =
    (ident.namespace().toSeq :+ ident.name()).mkString(s"$warehouse/", "/", "")

  /** Physical table location: the catalog slot itself, or — when the slot
    * holds a `graft.ref` pointer written by `CALL system.register_table` —
    * the existing table location it points at (Iceberg's register_table:
    * serve a table that lives elsewhere under a catalog name, no data or
    * metadata movement). */
  def tableLocation(ident: Identifier): String = {
    val raw = rawLocation(ident)
    registeredTarget(raw).getOrElse(raw)
  }

  private def registeredTarget(raw: String): Option[String] = {
    val ref = new Path(raw, GraftSparkCatalog.RefFileName)
    val fs = ref.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ref)) None
    else {
      val in = fs.open(ref)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** `register_table`: point the catalog slot at an existing graft table.
    * The slot holds ONLY the pointer — dropTable unregisters the name
    * without touching the table it points at. */
  private[catalog] def registerTable(ident: Identifier, location: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    require(SnapshotLog.exists(location, conf),
      s"register_table: no graft table at $location")
    val raw = rawLocation(ident)
    require(!SnapshotLog.exists(raw, conf) && registeredTarget(raw).isEmpty,
      s"register_table: $ident already exists")
    val ref = new Path(raw, GraftSparkCatalog.RefFileName)
    val fs = ref.getFileSystem(conf)
    fs.mkdirs(ref.getParent)
    val out = fs.create(ref, false)
    try out.write(location.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((Seq(warehouse) ++ namespace).mkString("/"))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter { n =>
        val raw = (Seq(warehouse) ++ namespace :+ n).mkString("/")
        SnapshotLog.exists(raw, spark.sparkContext.hadoopConfiguration) ||
          registeredTarget(raw).isDefined
      }
      .map(n => Identifier.of(namespace, n))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!GraftTable.exists(spark, tableLocation(ident))) {
      // `SELECT * FROM cat.ns.table.history` — the reference reads all its
      // metadata tables through SQL this way (IcebergLoadActivityTask
      // .scala:84-97): a trailing metadata-table name resolves against the
      // parent table when no real table shadows it
      metadataTable(ident).foreach(return _)
    }
    val meta = metaFor(ident)
    // WAP redirect parity with the DataFrame API (reference
    // WapIceberg.scala:13-15): a session with spark.graft.wap.branch set
    // reads the staged branch through plain SQL table names too
    val wap = Option(spark.conf.getOption("spark.graft.wap.branch").orNull)
      .filter(_ => meta.props.getOrElse("write.wap.enabled", "false") == "true")
      .filter(meta.refs.contains)
    val snap = wap.flatMap(meta.snapshotForRef).orElse(meta.currentSnapshot)
    sqlTable(ident, meta, snap, writable = true)
  }

  /** VERSION AS OF — branch name or snapshot id (reference
    * IcebergLoadActivityTask.scala:114 `VERSION AS OF 'day1'`). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val meta = metaFor(ident)
    val snap = meta.snapshotForRef(version).getOrElse(
      throw new NoSuchTableException(ident))
    sqlTable(ident, meta, Some(snap), writable = false)
  }

  /** TIMESTAMP AS OF — latest main-ancestry snapshot at or before ts. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val meta = metaFor(ident)
    val snap = GraftSqlTables.snapshotAsOf(meta, timestampMicros / 1000L)
      .getOrElse(throw new NoSuchTableException(ident))
    sqlTable(ident, meta, Some(snap), writable = false)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val loc = tableLocation(ident)
    if (GraftTable.exists(spark, loc)) throw new TableAlreadyExistsException(Seq(ident.toString))
    require(!viewExists(ident), s"createTable: a view already occupies $ident")
    val partCols = partitions.toSeq.map(GraftSqlTables.transformToEntry)
    GraftTable.create(spark, loc, ident.toString, schema, partCols,
      properties.asScala.toMap)
    loadTable(ident)
  }

  /** `ALTER TABLE … ADD COLUMNS / RENAME COLUMN / DROP COLUMN / ALTER
    * COLUMN TYPE / SET TBLPROPERTIES / UNSET TBLPROPERTIES`: each is one
    * metadata commit through the snapshot log (data files are untouched —
    * added columns read as NULL from existing files, renamed/promoted
    * columns resolve per file era; the same schema evolution contract as
    * the append-time mergeSchema widen). Type changes accept Iceberg's
    * safe promotions only — int→bigint, float→double, decimal precision
    * widen — anything lossy is rejected. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = GraftTable.load(spark, tableLocation(ident))
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "ALTER TABLE ADD COLUMNS: nested fields are not supported")
        t.addColumn(add.fieldNames().head, add.dataType(),
          Option(add.comment()),
          // ADD COLUMN … DEFAULT expr: the analyzer already validated and
          // folded it (capability-gated); the original text flows through
          // as both the initial and the current write-default
          Option(add.defaultValue()).map(_.getSql))
      case dflt: TableChange.UpdateColumnDefaultValue =>
        require(dflt.fieldNames().length == 1,
          "ALTER COLUMN DEFAULT: nested fields are not supported")
        // SET DEFAULT expr carries the text; DROP DEFAULT arrives as an
        // empty/absent default — map to removal
        val sql = Option(dflt.newCurrentDefault()).map(_.getSql)
          .orElse(Option(dflt.newDefaultValue())).map(_.trim).filter(_.nonEmpty)
        t.setColumnDefault(dflt.fieldNames().head, sql)
      case set: TableChange.SetProperty =>
        t.setProperties(Map(set.property() -> set.value()))
      case unset: TableChange.RemoveProperty =>
        t.unsetProperties(Seq(unset.property()))
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames().length == 1,
          "ALTER TABLE RENAME COLUMN: nested fields are not supported")
        t.renameColumn(rn.fieldNames().head, rn.newName())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "ALTER TABLE DROP COLUMN: nested fields are not supported")
        t.dropColumn(del.fieldNames().head)
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames().length == 1,
          "ALTER TABLE ALTER COLUMN TYPE: nested fields are not supported")
        t.updateColumnType(upd.fieldNames().head, upd.newDataType())
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE: unsupported change $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val raw = rawLocation(ident)
    if (registeredTarget(raw).isDefined) {
      // a registered name is a POINTER: dropping it unregisters the name
      // and must never touch the table it points at
      val p = new Path(raw)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    } else
      GraftTable.exists(spark, raw) && GraftTable.drop(spark, raw)
  }

  /** `ALTER TABLE … RENAME TO …` (round 17). Two shapes, mirroring how
    * the slot resolves:
    *
    *  - a REGISTERED name (the slot holds a `graft.ref` pointer) renames
    *    by re-pointing: write the pointer under the new slot, delete the
    *    old one — the table it points at is never touched;
    *  - a PHYSICAL table renames by moving its directory (this catalog is
    *    path-keyed — the name IS the location, so unlike Iceberg's
    *    catalog-row rename the data root must move). One FileSystem
    *    rename, atomic on HDFS/POSIX; on object stores it is a copy, so
    *    rename there with no concurrent writers (same caveat as any
    *    directory-keyed catalog). Snapshot-clones of this table hold
    *    absolute pointers into the OLD location and break — exactly like
    *    dropping a clone source; rename the clone's source reference
    *    first if one exists.
    *
    * The metadata display name follows the new identifier in one CAS'd
    * metadata commit after the move. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val oldRaw = rawLocation(oldIdent)
    val newRaw = rawLocation(newIdent)
    if (viewExists(oldIdent)) throw new UnsupportedOperationException(
      s"RENAME TABLE: $oldIdent is a view")
    require(!SnapshotLog.exists(newRaw, conf) &&
        registeredTarget(newRaw).isEmpty && !viewExists(newIdent),
      s"RENAME TABLE: $newIdent already exists")
    registeredTarget(oldRaw) match {
      case Some(target) =>
        registerTable(newIdent, target)
        val p = new Path(oldRaw)
        p.getFileSystem(conf).delete(p, true)
      case None =>
        if (!SnapshotLog.exists(oldRaw, conf))
          throw new NoSuchTableException(oldIdent)
        val src = new Path(oldRaw)
        val dst = new Path(newRaw)
        val fs = src.getFileSystem(conf)
        fs.mkdirs(dst.getParent)
        require(fs.rename(src, dst),
          s"RENAME TABLE: filesystem rename $oldRaw -> $newRaw failed")
        GraftTable.load(spark, newRaw).renameTo(newIdent.toString)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftTable.exists(spark, tableLocation(ident))

  // --- SQL views (Spark 4 ViewCatalog; Iceberg-REST-views parity) -------
  // CREATE/ALTER/DROP/SHOW VIEW against this catalog persist a VERSIONED
  // view log per slot (GraftViews); reads substitute the stored SQL into
  // the plan, so Catalyst optimizes straight through the view — filters
  // and column pruning reach the underlying graft scans untouched, and
  // VERSION AS OF on the underlying table composes with views normally.

  private def hconf = spark.sparkContext.hadoopConfiguration

  private final class GraftV2View(v: GraftViewMeta) extends View {
    private def c = v.current
    override def name(): String = v.name
    override def query(): String = c.sql
    override def currentCatalog(): String = c.currentCatalog
    override def currentNamespace(): Array[String] = c.currentNamespace.toArray
    override def schema(): StructType =
      org.apache.spark.sql.types.DataType.fromJson(c.schemaJson)
        .asInstanceOf[StructType]
    override def queryColumnNames(): Array[String] = c.queryColumnNames.toArray
    override def columnAliases(): Array[String] = c.columnAliases.toArray
    override def columnComments(): Array[String] =
      c.columnComments.map(x => if (x.isEmpty) null else x).toArray
    override def properties(): java.util.Map[String, String] = {
      val m = new java.util.HashMap[String, String]()
      c.properties.foreach { case (k, x) => m.put(k, x) }
      m
    }
  }

  override def viewExists(ident: Identifier): Boolean =
    GraftViews.exists(rawLocation(ident), hconf)

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    val dir = new Path((Seq(warehouse) ++ ns).mkString("/"))
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => GraftViews.exists(
        (Seq(warehouse) ++ ns :+ n).mkString("/"), hconf))
      .map(n => Identifier.of(ns, n))
  }

  override def loadView(ident: Identifier): View =
    GraftViews.load(rawLocation(ident), hconf)
      .map(new GraftV2View(_))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))

  private def versionFrom(info: org.apache.spark.sql.connector.catalog.ViewInfo,
      version: Int): GraftViewVersion =
    GraftViewVersion(
      version = version,
      timestampMs = System.currentTimeMillis(),
      sql = info.sql(),
      currentCatalog = info.currentCatalog(),
      currentNamespace = info.currentNamespace().toSeq,
      schemaJson = info.schema().json,
      queryColumnNames = info.queryColumnNames().toSeq,
      columnAliases = info.columnAliases().toSeq,
      columnComments = info.columnComments().map(c =>
        if (c == null) "" else c).toSeq,
      properties = info.properties().asScala.toMap)

  override def createView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo): View = {
    val slot = rawLocation(info.ident())
    if (viewExists(info.ident()))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(info.ident())
    require(!tableExists(info.ident()),
      s"createView: a table already occupies ${info.ident()}")
    val meta = GraftViewMeta(info.ident().toString,
      Seq(versionFrom(info, version = 1)))
    GraftViews.save(slot, meta, hconf)
    new GraftV2View(meta)
  }

  /** CREATE OR REPLACE VIEW: appends a new version to the existing log
    * (the Iceberg-view versioned-replace semantics — history retained)
    * or starts a fresh log under `orCreate`. */
  override def replaceView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo,
      orCreate: Boolean): View = {
    val slot = rawLocation(info.ident())
    GraftViews.load(slot, hconf) match {
      case Some(old) =>
        val meta = old.copy(versions =
          old.versions :+ versionFrom(info, old.current.version + 1))
        GraftViews.save(slot, meta, hconf)
        new GraftV2View(meta)
      case None if orCreate => createView(info)
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchViewException(info.ident())
    }
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val slot = rawLocation(ident)
    val old = GraftViews.load(slot, hconf).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))
    val props = changes.foldLeft(old.current.properties) { (p, ch) =>
      ch match {
        case s: ViewChange.SetProperty => p + (s.property() -> s.value())
        case r: ViewChange.RemoveProperty => p - r.property()
        case other => throw new IllegalArgumentException(
          s"Unsupported view change: $other")
      }
    }
    val meta = old.copy(versions = old.versions :+ old.current.copy(
      version = old.current.version + 1,
      timestampMs = System.currentTimeMillis(),
      properties = props))
    GraftViews.save(slot, meta, hconf)
    new GraftV2View(meta)
  }

  override def dropView(ident: Identifier): Boolean =
    GraftViews.drop(rawLocation(ident), hconf)

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val old = GraftViews.load(rawLocation(oldIdent), hconf).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent))
    if (viewExists(newIdent) || tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    GraftViews.save(rawLocation(newIdent),
      old.copy(name = newIdent.toString), hconf)
    GraftViews.drop(rawLocation(oldIdent), hconf)
  }

  // --- maintenance procedures: CALL graft.system.<proc>(…) --------------
  // (reference IcebergLoadActivityTask.scala:158-163, WapIceberg.scala:81)

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    val proc =
      if (ident.namespace().toSeq == Seq("system"))
        GraftProcedures.load(ident.name(), this)
      else None
    proc.getOrElse(throw new RuntimeException(
      s"Procedure $ident not found: known procedures are " +
        GraftProcedures.names.map(n => s"$catalogName.system.$n").mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  // --- functions: the SPJ `bucket` transform function -------------------
  // Spark's storage-partitioned-join machinery resolves a scan's reported
  // bucket(n, col) clustering through the relation's FunctionCatalog; the
  // canonicalName ties both join sides to the SAME hash.

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (GraftSparkCatalog.isBucketIdent(ident))
      org.apache.spark.sql.graft.GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  // -------------------------------------------------------------------

  private val metadataTableNames = Set(
    "history", "snapshots", "manifests", "manifest_files", "files",
    "all_files", "metadata_log_entries", "refs", "partitions",
    "delete_files", "entries", "all_manifests", "position_deletes")

  private def metadataTable(ident: Identifier): Option[Table] = {
    val ns = ident.namespace()
    val name = ident.name().toLowerCase
    if (ns.isEmpty || !metadataTableNames.contains(name)) return None
    val parent = Identifier.of(ns.init, ns.last)
    val loc = tableLocation(parent)
    if (!GraftTable.exists(spark, loc)) return None
    val t = GraftTable.load(spark, loc)
    val df = name match {
      case "history"              => t.history
      case "snapshots"            => t.snapshotsDF
      case "manifests"            => t.manifestsDF
      case "manifest_files"       => t.manifestFilesDF
      case "files"                => t.filesDF
      case "all_files"            => t.allFilesDF
      case "metadata_log_entries" => t.metadataLogEntries
      case "refs"                 => t.refsDF
      case "partitions"           => t.partitionsDF
      case "delete_files"         => t.deleteFilesDF
      case "entries"              => t.entriesDF
      case "all_manifests"        => t.allManifestsDF
      case "position_deletes"     => t.positionDeletesDF
    }
    Some(new GraftMetadataTable(s"$parent.$name", df))
  }

  private def metaFor(ident: Identifier): TableMetadata = {
    val loc = tableLocation(ident)
    if (!GraftTable.exists(spark, loc)) throw new NoSuchTableException(ident)
    SnapshotLog.read(loc, spark.sparkContext.hadoopConfiguration)
  }

  private def sqlTable(ident: Identifier, meta: TableMetadata,
      snap: Option[GraftSnapshot], writable: Boolean): Table =
    GraftSqlTables.forSnapshot(spark, ident.toString, tableLocation(ident),
      meta, snap, writable)
}

object GraftSparkCatalog {
  /** Marker file a `register_table` catalog slot holds: its UTF-8 body is
    * the registered table's physical location. */
  private[catalog] val RefFileName = "graft.ref"

  /** The SPJ `bucket` function is served only from the namespaces Spark
    * (and Iceberg) resolve transform functions in — the catalog root and
    * `system` — so a same-named function in a user namespace is never
    * shadowed and `functionExists` never lies about arbitrary namespaces. */
  private[catalog] def isBucketIdent(ident: Identifier): Boolean =
    ident.name().equalsIgnoreCase("bucket") &&
      (ident.namespace().isEmpty || ident.namespace().toSeq == Seq("system"))
}

/** Builds the DSv2 [[Table]] serving one graft snapshot — shared by the
  * catalogs and the path-based `graft` [[GraftDataSource]] format. */
private[catalog] object GraftSqlTables {

  import org.apache.spark.sql.connector.expressions.{
    Expressions, Literal => VLiteral, NamedReference}

  /** DSv2 partition [[Transform]] → snapshot-log spec entry
    * (`PARTITIONED BY (days(ts), bucket(8, id), truncate(4, name))` works
    * verbatim, like the reference's `USING iceberg` DDL). Matched through
    * the public Transform interface (name/arguments) — the concrete case
    * classes are private[sql]. */
  private[catalog] def transformToEntry(t: Transform): String = {
    def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference => Some(r.fieldNames.mkString("."))
        case _ => None
      }
    def litValue(e: org.apache.spark.sql.connector.expressions.Expression): Option[Any] =
      e match {
        case l: VLiteral[_] => Some(l.value)
        case _ => None
      }
    val args = t.arguments.toSeq
    t.name.toLowerCase match {
      case "identity" =>
        refName(args.head).getOrElse(
          throw new UnsupportedOperationException(s"identity needs a column: $t"))
      case n @ ("years" | "months" | "days" | "hours") =>
        s"$n(${refName(args.head).getOrElse(
          throw new UnsupportedOperationException(s"$n needs a column: $t"))})"
      case "bucket" =>
        val cols = args.flatMap(refName)
        val ns = args.flatMap(litValue)
        require(cols.size == 1 && ns.size == 1,
          s"bucket needs (n, one column), got $t")
        s"bucket(${ns.head},${cols.head})"
      case "truncate" =>
        val cols = args.flatMap(refName)
        val ws = args.flatMap(litValue)
        require(cols.size == 1 && ws.size == 1,
          s"truncate needs (width, one column), got $t")
        s"truncate(${ws.head},${cols.head})"
      case other => throw new UnsupportedOperationException(
        s"Unsupported partition transform $other — supported: identity, " +
          "years, months, days, hours, bucket(n, col), truncate(w, col)")
    }
  }

  /** Spec entry → DSv2 [[Transform]] for `Table.partitioning()` (DESCRIBE /
    * SHOW CREATE round-trip). */
  private[catalog] def entryToTransform(entry: String): Transform = {
    val f = graft.table.PartitionSpec.parseField(entry)
    import graft.table.PartitionSpec._
    f.transform match {
      case Identity => Expressions.identity(f.source)
      case Years => Expressions.years(f.source)
      case Months => Expressions.months(f.source)
      case Days => Expressions.days(f.source)
      case Hours => Expressions.hours(f.source)
      case Bucket(n) => Expressions.bucket(n, f.source)
      case Truncate(w) => Expressions.apply("truncate",
        Expressions.literal(w), Expressions.column(f.source))
    }
  }

  /** Latest main-ancestry snapshot at or before `tsMs` (TIMESTAMP AS OF /
    * the `timestampMs` read option). */
  def snapshotAsOf(meta: TableMetadata, tsMs: Long): Option[GraftSnapshot] = {
    val onMain = meta.currentSnapshotId.map(meta.ancestry).getOrElse(Seq.empty).toSet
    meta.snapshots
      .filter(s => onMain.contains(s.id) && s.timestampMs <= tsMs)
      .sortBy(_.timestampMs).lastOption
  }

  def forSnapshot(spark: SparkSession, name: String, loc: String,
      meta: TableMetadata, snap: Option[GraftSnapshot],
      writable: Boolean): Table = {
    val declared = org.apache.spark.sql.types.DataType.fromJson(meta.schemaJson)
      .asInstanceOf[StructType]
    // Hive convention: the SQL surface lists partition columns LAST. This
    // also makes the relation output identical to the physical scan order
    // (data columns ++ directory-derived partition columns), so the
    // optimizer never inserts a reordering Project between a command and
    // the scan relation — DELETE FROM planning requires the relation to BE
    // the scan relation. Writes align columns by NAME through
    // GraftTable.append, so the declared order in table metadata is
    // unaffected.
    val schema = StructType(
      declared.filterNot(f => meta.partitionCols.contains(f.name)) ++
        declared.filter(f => meta.partitionCols.contains(f.name)))
    val dataDir = s"$loc/data"
    val paths = snap.map(_.files.map(f =>
      s"${f.base.getOrElse(dataDir)}/${f.path}")).getOrElse(Seq.empty)
    val options = new CaseInsensitiveStringMap(
      Map("basePath" -> dataDir).asJava)
    val inner = ParquetTable(name, spark, options, paths,
      Some(schema), classOf[ParquetFileFormat])
    // two snapshot shapes can't be served by one plain file scan: pending
    // merge-on-read deletes (need the anti-join plan) and mixed partition
    // layouts after a spec evolution (one Spark file index cannot infer two
    // hive layouts). Record (location, snapshot) for GraftPlanReadRule to
    // substitute the GraftTable read plan during analysis.
    val mixedLayout = snap.exists(_.files
      .map(_.path.split("/").dropRight(1).toSeq.map(_.takeWhile(_ != '=')))
      .distinct.size > 1)
    // a third shape: live files written BEFORE a column rename store the
    // column under its old physical name — a plain name-resolved parquet
    // scan would read them as null; the graft read plan unwinds the eras
    val preRenameFiles = meta.renames.nonEmpty && {
      val lastRename = meta.renames.map(_.afterSeq).max
      snap.exists(_.files.exists(_.dataSeq.forall(_ <= lastRename)))
    }
    // a fourth shape: live files written BEFORE a type promotion store the
    // column under its narrower physical type — a plain scan with the
    // declared schema cannot read e.g. INT32 pages as longs; the graft
    // read plan scans each era under its written type and upcasts
    val preTypeChangeFiles = meta.typeChanges.nonEmpty && {
      val lastChange = meta.typeChanges.map(_.afterSeq).max
      snap.exists(_.files.exists(_.dataSeq.forall(_ <= lastChange)))
    }
    // a fifth shape: external (based) entries from a metadata-only
    // snapshot clone — one plain file index cannot recover hive partition
    // values against two different data roots; the graft read plan groups
    // scans per base
    val externalFiles = snap.exists(_.files.exists(_.base.isDefined))
    // a sixth shape: live files written BEFORE an ADD COLUMN … DEFAULT
    // must read the frozen initial default, not NULL — the graft read
    // plan projects it per era. (Spark's parquet reader would fill the
    // schema-metadata EXISTS_DEFAULT for missing columns on its own, but
    // correctness must not hang on that reader internal — route through
    // the era plan like renames/promotions.)
    val preDefaultFiles = meta.columnDefaults.nonEmpty && {
      val lastAdd = meta.columnDefaults.map(_.afterSeq).max
      snap.exists(_.files.exists(_.dataSeq.forall(_ <= lastAdd)))
    }
    val planRead = snap
      .filter(sn => sn.deleteFiles.nonEmpty || mixedLayout ||
        preRenameFiles || preTypeChangeFiles || externalFiles ||
        preDefaultFiles)
      .map(sn => GraftPlanRead(loc, sn.id))
    // metadata-only COUNT(*): exact when no merge-on-read delete can drop
    // rows at read time (the planRead guard already refuses those scans,
    // but stay explicit); empty tables count 0
    val metaCount: Option[Long] =
      if (snap.forall(_.deleteFiles.isEmpty))
        Some(snap.map(_.files.map(_.records).sum).getOrElse(0L))
      else None
    val prov = snap.map(sn => GraftPlanRead(loc, sn.id))
    // computed column stats are served ONLY for the exact snapshot they
    // were pinned to (compute_table_stats, or an incremental write-time
    // advance) — stale stats are silently not reported, never wrong
    val ndvStats = meta.columnStats
      .filter(cs => snap.exists(_.id == cs.snapshotId))
      .map(cs => org.apache.spark.sql.graft.GraftNdvStats(cs.rowCount,
        cs.cols.map { case (c, n) => c -> (n.ndv, n.nullCount) }))
    if (writable)
      new GraftWritableTable(name, loc, inner, schema, planRead, meta.props,
        meta.partitionCols, metaCount, prov, ndvStats)
    else new GraftReadOnlyTable(name, inner, schema, planRead, meta.props,
      meta.partitionCols, metaCount, prov, ndvStats)
  }
}

/** A metadata table (`history`, `snapshots`, `files`, …) as a SQL-readable
  * V2 table. Metadata is driver-resident by design (it comes off the
  * snapshot log, not the data), so the scan is a `LocalScan` — Spark plans a
  * local table scan with no executor work, same as Iceberg's small metadata
  * reads. */
class GraftMetadataTable(tableName: String,
    df: org.apache.spark.sql.DataFrame) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new org.apache.spark.sql.connector.read.LocalScan {
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        df.queryExecution.executedPlan.executeCollect()
      override def readSchema(): StructType = df.schema
    }
}

/** A snapshot that must be read through `GraftTable.asOfSnapshot` instead
  * of a plain file scan: it has pending merge-on-read deletes (the read
  * applies equality/position anti-joins), data files under more than one
  * partition layout (the read unions one scan per layout), pre-rename/
  * pre-promotion physical eras, and/or external absolute-base entries
  * from a metadata-only snapshot clone (partition recovery needs one
  * file index per data root). */
case class GraftPlanRead(location: String, snapshotId: Long)

/** One Iceberg-style reserved metadata column as the DSv2 catalog declares
  * it ([[org.apache.spark.sql.connector.catalog.MetadataColumn]]). */
case class GraftMetaColumn(colName: String,
    colType: org.apache.spark.sql.types.DataType,
    colComment: String,
    // lineage columns are nullable: files committed before row lineage
    // existed have no firstRowId to derive ids from
    nullable: Boolean = false) extends MetadataColumn {
  override def name(): String = colName
  override def dataType(): org.apache.spark.sql.types.DataType = colType
  override def isNullable: Boolean = nullable
  override def comment(): String = colComment
}

/** Read-only shell around Spark's ParquetTable: exposes BATCH_READ only.
  * Time-travel reads (`VERSION/TIMESTAMP AS OF`) resolve to this shape, so a
  * pinned historical snapshot can never be written through. */
class GraftReadOnlyTable(tableName: String, inner: ParquetTable,
    tableSchema: StructType,
    val planRead: Option[GraftPlanRead] = None,
    tableProps: Map[String, String] = Map.empty,
    partitionEntries: Seq[String] = Seq.empty,
    metadataCount: Option[Long] = None,
    // (location, snapshot) this relation reads — lets GraftMetadataColumnRule
    // rebuild the same read WITH provenance columns when `_file`/`_pos`/
    // `_partition` are referenced (always populated for non-empty tables,
    // unlike planRead which flags only plan-requiring snapshots)
    val provenance: Option[GraftPlanRead] = None,
    ndvStats: Option[org.apache.spark.sql.graft.GraftNdvStats] = None)
  extends Table with SupportsRead with SupportsMetadataColumns {

  /** Iceberg's reserved metadata columns. The analyzer resolves references
    * through this surface (`SELECT _file, … FROM t` / DataFrame attribute);
    * the scan itself is substituted by `GraftMetadataColumnRule` with the
    * provenance-bearing graft read plan (requires
    * spark.sql.extensions=graft.GraftSparkExtensions, same contract as
    * merge-on-read reads). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    GraftMetaColumn("_file", StringType, "absolute data file path"),
    GraftMetaColumn("_pos", LongType, "row position in the data file"),
    GraftMetaColumn("_partition", StringType, "partition tuple {k=v, ...}"),
    GraftMetaColumn("_row_id", LongType,
      "stable row id (v3 row lineage): firstRowId + position, preserved " +
        "across rewrites via materialization", nullable = true),
    GraftMetaColumn("_last_updated_sequence_number", LongType,
      "sequence number of the commit that last created or updated the row",
      nullable = true))
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  // hidden-partitioning spec surfaces through DESCRIBE EXTENDED /
  // SHOW CREATE TABLE exactly as declared
  override def partitioning(): Array[Transform] =
    partitionEntries.map(GraftSqlTables.entryToTransform).toArray
  // recorded table properties ride the DSv2 surface so SHOW TBLPROPERTIES
  // round-trips what the DDL declared (including formally-waived ones
  // like write.delete.format.default — see ActivityData.tableProps)
  override def properties(): util.Map[String, String] = tableProps.asJava
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // refusing beats silently dropping files or surfacing deleted rows
    planRead.foreach { _ => throw new UnsupportedOperationException(
      s"$tableName needs the graft read plan (pending merge-on-read deletes, " +
        "mixed partition layouts, rename/type-promotion/initial-default " +
        "eras, or external entries from a metadata-only snapshot clone): " +
        "SQL reads need spark.sql.extensions=graft.GraftSparkExtensions " +
        "(or read via the GraftTable API / run a compaction to rewrite " +
        "the snapshot)") }
    val base = inner.newScanBuilder(options)
    // every graft scan goes through the delegating wrapper: bucket specs
    // get the SPJ-keyed partitioning (one input partition per bucket, so
    // co-bucketed joins skip the shuffle — reaching here with planRead
    // empty implies a single layout, every live file carries the bucket
    // dir), and unfiltered COUNT(*) answers from snapshot-log record
    // counts (metadata-only, any table size)
    base match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =>
        val bucket = bucketField.map(f =>
          (f.transform.asInstanceOf[graft.table.PartitionSpec.Bucket].n,
            f.source, f.dirName))
        new org.apache.spark.sql.graft.GraftBucketedScanBuilder(p, bucket,
          metadataCount, ndvStats)
      case other => other
    }
  }

  /** The spec's bucket field, if the CURRENT spec has exactly one AND
    * every live file sits in a numeric bucket dir. A null-source file
    * (`..._bucket_n=__HIVE_DEFAULT_PARTITION__`) has no bucket id, so the
    * key-grouped SPJ layout cannot represent it — fall back to the plain
    * scan (correct, just not exchange-free) rather than mis-keying it. */
  private def bucketField: Option[graft.table.PartitionSpec.Field] = {
    val bucketFields = graft.table.PartitionSpec.parse(partitionEntries)
      .filter(_.transform.isInstanceOf[graft.table.PartitionSpec.Bucket])
    bucketFields match {
      case Seq(f) =>
        val marker = s"/${f.dirName}="
        val allNumeric = inner.paths.forall { p =>
          val at = p.indexOf(marker)
          at >= 0 && {
            val from = at + marker.length
            val to = p.indexOf('/', from)
            val v = p.substring(from, if (to < 0) p.length else to)
            v.nonEmpty && v.forall(_.isDigit)
          }
        }
        if (allNumeric) Some(f) else None
      case _ => None
    }
  }


}

/** Current-state SQL table: reads like [[GraftReadOnlyTable]], and accepts
  * `INSERT INTO` as a V1 append routed through `GraftTable.append` — the
  * executors write parquet through the normal distributed write path and the
  * driver commits one snapshot (WAP branch redirect applies, same as the
  * DataFrame API). Full truncating overwrites (`INSERT OVERWRITE` without a
  * partition spec, and the write step of `CREATE OR REPLACE TABLE … AS
  * SELECT` — the reference's staging idiom,
  * IcebergLoadActivityTask.scala:45-49) commit an `overwrite` snapshot:
  * nothing is destroyed, prior snapshots stay time-travelable, exactly
  * Iceberg's RTAS/OVERWRITE behavior. Partition-scoped (dynamic) overwrite
  * is NOT declared, so Spark's analyzer rejects it before any file is
  * touched. */
class GraftWritableTable(tableName: String, val location: String,
    inner: ParquetTable, tableSchema: StructType,
    planReadInfo: Option[GraftPlanRead] = None,
    tableProps: Map[String, String] = Map.empty,
    partitionEntries: Seq[String] = Seq.empty,
    metadataCount: Option[Long] = None,
    prov: Option[GraftPlanRead] = None,
    ndvStats: Option[org.apache.spark.sql.graft.GraftNdvStats] = None)
  extends GraftReadOnlyTable(tableName, inner, tableSchema, planReadInfo,
    tableProps, partitionEntries, metadataCount, prov, ndvStats)
  with SupportsWrite with SupportsDelete {

  override def capabilities(): util.Set[TableCapability] =
    // AUTOMATIC_SCHEMA_EVOLUTION (round 17) gates exactly one analyzer
    // behavior in Spark 4.1: `MERGE INTO … WITH SCHEMA EVOLUTION` routes
    // the source-vs-target schema delta through
    // ResolveMergeIntoSchemaEvolution -> alterTable (AddColumn / safe
    // UpdateColumnType) before resolving the clauses, so star-expansion
    // sees the evolved schema. Existing files read the added columns as
    // NULL / the pre-promotion era type through the standard read path.
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** `DELETE FROM … WHERE …`: the pushed filters become one Column
    * predicate. The table's `write.delete.mode` property picks the commit
    * shape, like Iceberg: `copy-on-write` (default) rewrites only the files
    * containing matches; `merge-on-read` commits a full-row equality-delete
    * file instead — O(matched rows) written, zero files rewritten.
    * NULL-evaluating rows are kept either way. Predicates that don't
    * translate make `canDeleteWhere` return false, so Spark raises a clear
    * analysis error instead of silently deleting the wrong rows. */
  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(f => GraftWritableTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    val cond = filters.flatMap(GraftWritableTable.filterToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val t = GraftTable.load(SparkSession.active, location)
    if (t.properties.get("write.delete.mode").contains("merge-on-read"))
      t.deleteWhereMoR(cond, t.schema.fieldNames.toSeq)
    else t.deleteWhere(cond)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      // full-table truncate only (INSERT OVERWRITE / RTAS write step);
      // Spark requests it via the builder, we commit an overwrite snapshot
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val t = GraftTable.load(SparkSession.active, location)
              if (overwrite || truncateFirst) t.overwrite(data)
              else t.append(data)
            }
          }
      }
    }
}

object GraftWritableTable {
  /** Translate Spark's pushed V1 filters to Column predicates. Returns None
    * for any shape without an exact Column equivalent — the caller then
    * declines the whole delete rather than approximating it. */
  private[graft] def filterToColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v)            => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v)        => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v)           => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case sources.In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a)                => Some(col(a).isNull)
    case sources.IsNotNull(a)             => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case sources.StringContains(a, v)     => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case sources.Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case sources.Not(c)                   => filterToColumn(c).map(not)
    case sources.AlwaysTrue()             => Some(lit(true))
    case sources.AlwaysFalse()            => Some(lit(false))
    case _                                => None
  }
}
