package graft.table.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.graft.GraftMicroBatchStream
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.{GraftTable, SnapshotLog}

/**
 * `spark.readStream.format("graft-stream").load(tableDir)` — Structured
 * Streaming over a graft table's append log (the Iceberg
 * `readStream.format("iceberg")` capability, re-expressed on the graft
 * snapshot log; see [[org.apache.spark.sql.graft.GraftMicroBatchStream]]
 * for offsets, exactly-once and append-only semantics, and the
 * `fromSnapshotId` / `skipOverwriteSnapshots` options).
 *
 * A separate short name from the batch `graft` format keeps the batch
 * table's scan builder (with its full parquet pushdown surface) entirely
 * untouched — this table declares MICRO_BATCH_READ only, so a batch
 * `spark.read.format("graft-stream")` fails at analysis instead of
 * silently scanning.
 */
class GraftStreamSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  override def supportsExternalMetadata(): Boolean = true

  private def location(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-stream needs a table location: spark.readStream.format(\"graft-stream\").load(dir)"))

  private def tableAt(loc: String, changelog: Boolean): GraftStreamTable = {
    val spark = SparkSession.active
    require(GraftTable.exists(spark, loc), s"no graft table at $loc")
    val meta = SnapshotLog.read(loc, spark.sparkContext.hadoopConfiguration)
    val declared = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    // partition columns LAST, matching every batch read surface
    val base = StructType(
      declared.filterNot(f => meta.partitionCols.contains(f.name)) ++
        declared.filter(f => meta.partitionCols.contains(f.name)))
    // CDC mode appends the change-image columns (Iceberg changelog shape);
    // _change_key carries a DELETE_KEY image's key-column list under the
    // CURRENT declared names (keys recorded before a later rename map
    // forward; comma-joined, null on other images) so a replayer retracts
    // on the delete file's actual keys instead of inferring them from
    // non-null values — an all-null recorded key column must still be a key
    val schema =
      if (changelog) StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_snapshot_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_change_key",
          org.apache.spark.sql.types.StringType, nullable = true)))
      else base
    new GraftStreamTable(loc, schema, meta.partitionCols)
  }

  private def changelogOpt(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("changelog")).exists(_.toBoolean)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableAt(location(options), changelogOpt(options)).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    tableAt(location(opts), changelogOpt(opts))
  }
}

class GraftStreamTable(loc: String, tableSchema: StructType,
    partitionCols: Seq[String]) extends Table with SupportsRead {

  override def name(): String = s"graft-stream `$loc`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def description(): String = name()
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftMicroBatchStream(SparkSession.active, loc, tableSchema,
          partitionCols, options)
    }
}
