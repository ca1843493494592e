package graft.table.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.{GraftTable, SnapshotLog}

/**
 * The `graft` data-source short name — what makes `USING graft` a valid
 * provider in DDL (the session-catalog router,
 * [[GraftSessionCatalog]], dispatches on it exactly like the reference's
 * `USING iceberg` under its session catalog) and enables path-based
 * reads of a table directory:
 *
 * {{{
 * spark.read.format("graft").load("/warehouse/finance/activity")
 * }}}
 *
 * A path read serves the CURRENT snapshot by default, or a pinned one via
 * the Iceberg-shaped read options (mutually exclusive):
 *
 * {{{
 * .option("version", "day1")          // branch/tag ref or snapshot id
 * .option("timestampMs", "1700000…")  // latest main snapshot at/before ts
 * }}}
 *
 * through the same DSv2 table the catalogs build (vectorized parquet scan,
 * pushdown, pruning), read-only: versioned writes need a table identity
 * for the commit log, so they go through a catalog or the
 * [[graft.table.GraftTable]] API.
 */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = true

  // Spark calls inferSchema then getTable on the SAME provider instance
  // for one read; resolve the snapshot ONCE and serve both — re-reading
  // the log twice costs a metadata round trip and, worse, lets a commit
  // landing between the calls serve a snapshot whose schema differs from
  // the one already inferred
  @volatile private var resolved: (java.util.Map[String, String], Table) = _

  private def tableFor(options: CaseInsensitiveStringMap): Table = {
    val cached = resolved
    if (cached != null && cached._1 == options.asCaseSensitiveMap()) cached._2
    else {
      val t = table(options)
      resolved = (options.asCaseSensitiveMap(), t)
      t
    }
  }

  private def location(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft path read needs a table location: spark.read.format(\"graft\").load(dir)"))

  private def table(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val loc = location(options)
    require(GraftTable.exists(spark, loc), s"no graft table at $loc")
    val meta = SnapshotLog.read(loc, spark.sparkContext.hadoopConfiguration)
    val version = Option(options.get("version"))
    val tsMs = Option(options.get("timestampMs")).map(_.toLong)
    require(version.isEmpty || tsMs.isEmpty,
      "graft read options version and timestampMs are mutually exclusive")
    val snap = version match {
      case Some(v) => Some(meta.snapshotForRef(v).getOrElse(
        throw new IllegalArgumentException(s"no ref or snapshot '$v' on $loc")))
      case None => tsMs match {
        case Some(ts) => Some(GraftSqlTables.snapshotAsOf(meta, ts).getOrElse(
          throw new IllegalArgumentException(s"no snapshot at or before $ts on $loc")))
        case None => meta.currentSnapshot
      }
    }
    GraftSqlTables.forSnapshot(spark, loc, loc, meta, snap, writable = false)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableFor(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    tableFor(new CaseInsensitiveStringMap(properties))
}
