package graft.table.catalog

import java.util

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType

import graft.table.GraftTable

/**
 * Session-catalog (`spark_catalog`) override — the reference maps Spark's
 * DEFAULT catalog itself to the versioned table format
 * (IcebergSupport.scala:22-23 sets `spark_catalog` to
 * `SparkSessionCatalog`), so UNQUALIFIED names like `finance.activity`
 * resolve versioned tables while every non-graft table keeps resolving
 * through Spark's built-in session catalog. Same split here:
 *
 * {{{
 * spark.sql.catalog.spark_catalog           = graft.table.catalog.GraftSessionCatalog
 * spark.sql.catalog.spark_catalog.warehouse = /path/to/warehouse
 *
 * SELECT * FROM finance.activity                  -- graft table, versioned
 * SELECT * FROM finance.activity VERSION AS OF 'day1'
 * CREATE TABLE plain(i INT) USING parquet         -- falls through to the
 *                                                 -- built-in session catalog
 * }}}
 *
 * Routing: a name that exists in the graft warehouse (including the
 * trailing metadata-table forms `ns.tbl.history` etc.) is served by
 * [[GraftSparkCatalog]]'s DSv2 table; anything else — tables, namespaces,
 * functions — forwards to the delegate session catalog Spark injects via
 * [[CatalogExtension.setDelegateCatalog]]. `CREATE TABLE` routes on the
 * declared provider: `USING graft` creates a versioned table, any other
 * provider goes to the delegate. Extending [[GraftSparkCatalog]] (rather
 * than wrapping one) keeps the injected branch DDL / MERGE INTO / CALL
 * machinery working unchanged: `GraftCommands.resolveLocation` pattern
 * matches on the class, and `ProcedureCatalog` is inherited.
 */
class GraftSessionCatalog extends GraftSparkCatalog with CatalogExtension {

  private var delegate: CatalogPlugin = _

  override def setDelegateCatalog(d: CatalogPlugin): Unit = delegate = d

  private def delegateTables: TableCatalog = delegate.asInstanceOf[TableCatalog]
  private def delegateNamespaces: SupportsNamespaces =
    delegate.asInstanceOf[SupportsNamespaces]
  private def delegateFunctions: FunctionCatalog =
    delegate.asInstanceOf[FunctionCatalog]

  // --- tables: graft-first, delegate fallback ---------------------------

  override def loadTable(ident: Identifier): Table =
    try super.loadTable(ident)
    catch { case _: NoSuchTableException => delegateTables.loadTable(ident) }

  override def loadTable(ident: Identifier, version: String): Table =
    if (tableExistsInGraft(ident)) super.loadTable(ident, version)
    else delegateTables.loadTable(ident, version)

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    if (tableExistsInGraft(ident)) super.loadTable(ident, timestampMicros)
    else delegateTables.loadTable(ident, timestampMicros)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val provider = Option(properties.get(TableCatalog.PROP_PROVIDER))
    if (provider.exists(_.equalsIgnoreCase("graft")))
      super.createTable(ident, schema, partitions, properties)
    else
      delegateTables.createTable(ident, schema, partitions, properties): @annotation.nowarn("cat=deprecation")
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    if (tableExistsInGraft(ident)) super.alterTable(ident, changes: _*)
    else delegateTables.alterTable(ident, changes: _*)

  override def dropTable(ident: Identifier): Boolean =
    if (tableExistsInGraft(ident)) super.dropTable(ident)
    else delegateTables.dropTable(ident)

  override def purgeTable(ident: Identifier): Boolean =
    if (tableExistsInGraft(ident)) super.dropTable(ident)
    else delegateTables.purgeTable(ident)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    if (tableExistsInGraft(oldIdent)) super.renameTable(oldIdent, newIdent)
    else delegateTables.renameTable(oldIdent, newIdent)

  override def tableExists(ident: Identifier): Boolean =
    tableExistsInGraft(ident) || delegateTables.tableExists(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val graft = super.listTables(namespace)
    val others =
      try delegateTables.listTables(namespace)
      catch { case _: Exception => Array.empty[Identifier] }
    (graft ++ others).distinct
  }

  override def invalidateTable(ident: Identifier): Unit =
    if (!tableExistsInGraft(ident)) delegateTables.invalidateTable(ident)

  private def tableExistsInGraft(ident: Identifier): Boolean =
    super.tableExists(ident)

  // --- namespaces + functions: pure delegation --------------------------

  override def listNamespaces(): Array[Array[String]] =
    delegateNamespaces.listNamespaces()

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    delegateNamespaces.listNamespaces(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    delegateNamespaces.loadNamespaceMetadata(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    delegateNamespaces.namespaceExists(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    delegateNamespaces.createNamespace(namespace, metadata)

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    delegateNamespaces.alterNamespace(namespace, changes: _*)

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    delegateNamespaces.dropNamespace(namespace, cascade)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    delegateFunctions.listFunctions(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    // graft's SPJ bucket function — root/system namespaces only, so a
    // user's own `ns.bucket` function is never shadowed; everything else
    // is the session's
    if (GraftSparkCatalog.isBucketIdent(ident)) super.loadFunction(ident)
    else delegateFunctions.loadFunction(ident)

  override def functionExists(ident: Identifier): Boolean =
    GraftSparkCatalog.isBucketIdent(ident) || delegateFunctions.functionExists(ident)
}
