package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr, GenericInternalRow, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.connector.expressions.{Expressions, Expression => VExpr}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Storage-partitioned join (SPJ) support for graft tables bucketed with the
 * hidden-partitioning `bucket(n, col)` transform: the scan groups the
 * snapshot's files by their bucket directory value, exposes one input
 * partition per bucket with its bucket id as the partition key, and reports
 * `KeyGroupedPartitioning(bucket(n, col))`. Two graft tables bucketed the
 * same way then join WITHOUT ANY SHUFFLE — Spark's `EnsureRequirements`
 * recognizes both sides as co-partitioned (via the catalog's `bucket`
 * function, [[GraftBucketFunction]]) and zips bucket i with bucket i. At
 * 100 TB that converts the dominant exchange of a fact-fact join into a
 * metadata no-op, exactly like Iceberg's SPJ.
 *
 * Lives under `org.apache.spark.sql` because filter pushdown on file scans
 * goes through the `private[sql]` `SupportsPushDownCatalystFilters` seam —
 * same access pattern as [[bridge]].
 *
 * Requires `spark.sql.sources.v2.bucketing.enabled=true` (Spark's SPJ
 * gate). Partition-value alignment for buckets EMPTY on one side rides
 * Spark's `v2.bucketing.pushPartValues.enabled` (default on in Spark 4).
 *
 * Delegation note: column pruning and catalyst filter pushdown forward to
 * the inner [[ParquetScanBuilder]]; aggregate/variant pushdown (rarely
 * applicable to a join input) is intentionally not forwarded — losing an
 * optional pushdown only costs performance, never correctness.
 */
class GraftBucketedScanBuilder(inner: ParquetScanBuilder,
    bucket: Option[(Int, String, String)],
    metadataCount: Option[Long] = None,
    ndvStats: Option[GraftNdvStats] = None)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var sawFilters = false
  private var countPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def pushFilters(filters: Seq[CExpr]): Seq[CExpr] = {
    // ANY filter — pushed into parquet or not — still removes rows, so a
    // metadata-only count would over-count; disable it outright
    if (filters.nonEmpty) sawFilters = true
    inner.pushFilters(filters)
  }

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  /** `SELECT COUNT(*) FROM t` answered from the snapshot log's per-file
    * record counts — a driver-side metadata lookup at ANY table size
    * (Iceberg answers the same query from manifest stats). Only when no
    * filter exists and the snapshot carries no merge-on-read deletes
    * (`metadataCount` is None otherwise). */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    metadataCount.isDefined && !sawFilters &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    countPushed = supportCompletePushDown(agg)
    countPushed
  }

  override def build(): Scan =
    if (countPushed) new GraftMetaCountScan(metadataCount.get)
    else bucket match {
      case Some((n, src, dir)) =>
        new GraftBucketedScan(inner.build().asInstanceOf[ParquetScan], n, src, dir,
          ndvStats)
      case None => ndvStats match {
        // computed column stats ride the scan's Statistics surface —
        // numRows + NDV/null counts for CBO, sizeInBytes still the file
        // scan's pruning-aware estimate. Pushed DATA filters stay in the
        // logical plan, where FilterEstimation shrinks the whole-table
        // numbers by NDV selectivity (the CBO join-flip this feature
        // exists for); pushed PARTITION filters are fully consumed by the
        // scan with no compensating Filter node, so a partition-pruned
        // scan suppresses the whole-table numbers instead of overstating.
        case Some(st) =>
          val built = inner.build().asInstanceOf[ParquetScan]
          new GraftStatsScan(built, st,
            filtered = built.partitionFilters.nonEmpty)
        case None => inner.build()
      }
    }
}

/** The pushed-down COUNT(*) as a driver-local one-row scan. */
class GraftMetaCountScan(total: Long)
  extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("count(*)",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def rows(): Array[InternalRow] =
    Array(new GenericInternalRow(Array[Any](total)))
  override def description(): String = s"GraftMetaCountScan($total)"
}

/** One bucket's files as a Spark [[FilePartition]] that also carries its
  * bucket id as the SPJ partition key. */
class KeyedFilePartition(idx: Int, fs: Array[PartitionedFile],
    key: InternalRow) extends FilePartition(idx, fs) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

class GraftBucketedScan(inner: ParquetScan,
    nBuckets: Int, sourceCol: String, dirName: String,
    ndvStats: Option[GraftNdvStats] = None)
  extends Scan with Batch with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    ndvStats match {
      case Some(st) => st.toV2(inner.estimateStatistics().sizeInBytes())
      case None => inner.estimateStatistics()
    }

  override def readSchema(): StructType = inner.readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftBucketedScan(bucket($nBuckets, $sourceCol)) ${inner.description()}"

  private lazy val innerBatch: Batch = inner.toBatch

  // --- runtime (DPP-style) bucket pruning --------------------------------
  // Spark's dynamic partition pruning treats `filterAttributes` as the
  // scan's partition columns: a selective broadcast side of a join on the
  // bucket SOURCE column delivers its key set at runtime, each key hashes
  // to its bucket, and whole buckets drop before any task launches — the
  // hidden-partitioning analogue of pruning hive partitions dynamically.
  private var runtimeBuckets: Option[Set[Int]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column(sourceCol))

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val srcType = readSchema().fields
      .find(_.name == sourceCol).map(_.dataType)
    filters.foreach {
      case org.apache.spark.sql.sources.In(attr, values)
          if attr == sourceCol && srcType.isDefined =>
        val ids = values.filter(_ != null).map { v =>
          val cv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .convertToCatalyst(v)
          Pmod(Murmur3Hash(Seq(Literal.create(cv, srcType.get)), 42),
            Literal(nBuckets)).eval().asInstanceOf[Int]
        }.toSet
        runtimeBuckets = Some(runtimeBuckets.fold(ids)(_ intersect ids))
      case _ => // other shapes: no partition-level pruning possible
    }
  }

  /** The inner parquet batch's size-packed [[FilePartition]]s, regrouped
    * into ONE partition per bucket directory value. The bucket id comes
    * from the file PATH's `dirName=<id>` segment — partition-values rows
    * are projection-pruned (a query that doesn't select the derived dir
    * column gets an empty readPartitionSchema), but the path always
    * carries the layout. Splits of one file share a path, so regrouping
    * keeps every split exactly once; empty buckets simply have no
    * partition (Spark's push-part-values alignment handles a bucket
    * present on only one join side). */
  private lazy val grouped: Array[InputPartition] = {
    val files = innerBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"unexpected parquet input partition ${other.getClass}")
    }
    val marker = s"/$dirName="
    def bucketIdOf(f: PartitionedFile): Int = {
      val p = f.filePath.toString
      val at = p.indexOf(marker)
      require(at >= 0, s"file outside the bucket layout: $p")
      val from = at + marker.length
      val to = p.indexOf('/', from)
      p.substring(from, if (to < 0) p.length else to).toInt
    }
    files.groupBy(bucketIdOf).toSeq
      .sortBy(_._1)
      .zipWithIndex
      .map { case ((bucket, fs), i) =>
        new KeyedFilePartition(i, fs.toArray,
          new GenericInternalRow(Array[Any](bucket))): InputPartition
      }
      .toArray
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val planned = runtimeBuckets match {
      case Some(keep) => grouped.filter {
        case k: KeyedFilePartition => keep.contains(k.partitionKey().getInt(0))
        case _ => true
      }
      case None => grouped
    }
    GraftBucketedScan.lastPlannedPartitions.set(planned.length)
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    innerBatch.createReaderFactory()

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array[VExpr](Expressions.bucket(nBuckets, sourceCol)), grouped.length)
}

object GraftStatsScan {
  /** Shared-JVM test probe (local mode): data-file count the last
    * planInputPartitions produced — how specs observe runtime pruning. */
  val lastPlannedFiles =
    new java.util.concurrent.atomic.AtomicInteger(-1)
}

object GraftBucketedScan {
  /** Shared-JVM test probe (local mode): bucket count the last
    * planInputPartitions produced — how specs observe runtime pruning. */
  val lastPlannedPartitions =
    new java.util.concurrent.atomic.AtomicInteger(-1)
}

/**
 * The catalog-served `bucket` function — how Spark's SPJ machinery checks
 * that two scans' `bucket(n, col)` transforms mean the SAME function
 * (`canonicalName` equality) and evaluates bucket ids when aligning
 * partition values. MUST agree exactly with the write path
 * (`PartitionSpec`: `pmod(murmur3(col, seed 42), n)` — `functions.hash`).
 */
object GraftBucketFunction
  extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, 42), n) — graft's hidden-partitioning bucket"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got $inputType")
    new Bound(inputType.fields(0).dataType, inputType.fields(1).dataType)
  }

  private final class Bound(numType: DataType, colType: DataType)
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(numType, colType)
    override def resultType(): DataType = org.apache.spark.sql.types.IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.get(1, colType)
      Pmod(Murmur3Hash(Seq(Literal.create(v, colType)), 42), Literal(n))
        .eval().asInstanceOf[Int]
    }
  }
}

/** NDV/null-count column statistics served through Spark's DSv2
  * `ColumnStatistics` surface. */
case class GraftColStats(ndvVal: Long, nullsVal: Long)
  extends org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
  override def distinctCount(): java.util.OptionalLong =
    java.util.OptionalLong.of(ndvVal)
  override def nullCount(): java.util.OptionalLong =
    java.util.OptionalLong.of(nullsVal)
}

/** The serveable slice of a stored [[graft.table.ColumnStatsRecord]]:
  * exact live row count plus per-column (ndv, nullCount). */
case class GraftNdvStats(rowCount: Long, cols: Map[String, (Long, Long)]) {
  def toV2(size: java.util.OptionalLong)
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rowCount)
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        cols.foreach { case (c, (ndv, nulls)) =>
          m.put(Expressions.column(c), GraftColStats(ndv, nulls))
        }
        m
      }
    }
}

/** Stats-reporting wrapper around the inner [[ParquetScan]] (the plain,
  * non-bucketed path): sizeInBytes stays the file scan's own estimate
  * (pruning-aware), while numRows and per-column NDV/null counts come
  * from the table's computed statistics — the CBO inputs a 100 TB join
  * planner needs (filter selectivity via NDV → broadcast-vs-shuffle
  * decisions on real cardinalities). Delegates Batch/metadata so EXPLAIN
  * and execution are unchanged.
  *
  * `filtered` scans (any pushed data/partition predicate) suppress the
  * whole-table numbers and fall back to the inner scan's pruning-aware
  * estimate — a whole-table numRows under a selective filter would
  * mislead CBO the other way.
  *
  * Implements runtime (DPP) filtering so computing table stats never
  * COSTS a table dynamic partition pruning: an `In` runtime filter on a
  * partition column re-plans the inner scan with the extra partition
  * predicate before tasks launch. */
class GraftStatsScan(inner: ParquetScan, stats: GraftNdvStats,
    filtered: Boolean = false)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
  with org.apache.spark.sql.internal.connector.SupportsMetadata {
  override def readSchema(): StructType = inner.readSchema
  override def toBatch: Batch = this

  // --- runtime (DPP) partition pruning ----------------------------------
  private var runtimeScan: ParquetScan = inner

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner.readPartitionSchema.fields.map(f => Expressions.column(f.name))

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val partCols = inner.readPartitionSchema
    val exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      filters.toSeq.flatMap {
        case org.apache.spark.sql.sources.In(attr, values)
            if partCols.fieldNames.contains(attr) =>
          val f = partCols(attr)
          // null join keys never match an equi-join; dropping them keeps
          // the pruning predicate three-valued-logic-safe
          val lits = values.filter(_ != null).map(v =>
            Literal.create(org.apache.spark.sql.catalyst.CatalystTypeConverters
              .convertToCatalyst(v), f.dataType)).toSeq
          Some(org.apache.spark.sql.catalyst.expressions.In(
            org.apache.spark.sql.catalyst.expressions.AttributeReference(
              f.name, f.dataType, f.nullable)(), lits))
        case _ => None
      }
    if (exprs.nonEmpty)
      runtimeScan = inner.copy(
        partitionFilters = inner.partitionFilters ++ exprs)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = runtimeScan.toBatch.planInputPartitions()
    GraftStatsScan.lastPlannedFiles.set(parts.collect {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.length
    }.sum)
    parts
  }
  override def createReaderFactory(): PartitionReaderFactory =
    runtimeScan.toBatch.createReaderFactory()
  override def description(): String = s"GraftStatsScan ${inner.description()}"
  override def getMetaData(): Map[String, String] = inner.getMetaData()
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    if (filtered) inner.estimateStatistics()
    else stats.toV2(inner.estimateStatistics().sizeInBytes())
}
