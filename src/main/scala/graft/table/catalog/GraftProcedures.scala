package graft.table.catalog

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.{asc_nulls_first, asc_nulls_last, desc_nulls_first, desc_nulls_last}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.GraftTable

/**
 * The reference's maintenance-procedure SQL surface, on Spark 4's native
 * `ProcedureCatalog` support (`CALL graft.system.<proc>(…)`):
 *
 *  - `fast_forward(table, branch, to)`            — reference WapIceberg.scala:81
 *  - `remove_orphan_files(table, dry_run, older_than)` — IcebergLoadActivityTask.scala:158,163
 *  - `rewrite_data_files(table, strategy, sort_order)` — IcebergLoadActivityTask.scala:159
 *  - `rewrite_manifests(table)`                   — IcebergLoadActivityTask.scala:160
 *  - `expire_snapshots(table, older_than, retain_last)` — IcebergLoadActivityTask.scala:162
 *
 * Each call is one driver-side commit-protocol operation on the resolved
 * `GraftTable` (any distributed work, e.g. the compaction rewrite, runs
 * through the normal DataFrame write path) and returns its observable result
 * as a one-shot `LocalScan`, so `spark.sql("CALL …")` yields a result table
 * exactly like the reference.
 */
private[catalog] object GraftProcedures {

  val names: Seq[String] = Seq("add_files", "ancestors_of", "fast_forward",
    "remove_orphan_files",
    "rewrite_data_files", "rewrite_manifests", "expire_snapshots",
    "rollback_to_snapshot", "set_partition_spec", "create_changelog_view",
    "cherrypick_snapshot", "rewrite_position_delete_files",
    "snapshot", "register_table", "compute_table_stats",
    "set_ref_retention")

  def load(name: String, catalog: GraftSparkCatalog): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "add_files"           => Some(new AddFiles(catalog))
      case "snapshot"            => Some(new SnapshotTable(catalog))
      case "register_table"      => Some(new RegisterTable(catalog))
      case "set_ref_retention"   => Some(new SetRefRetention(catalog))
      case "ancestors_of"        => Some(new AncestorsOf(catalog))
      case "fast_forward"        => Some(new FastForward(catalog))
      case "remove_orphan_files" => Some(new RemoveOrphanFiles(catalog))
      case "rewrite_data_files"  => Some(new RewriteDataFiles(catalog))
      case "rewrite_manifests"   => Some(new RewriteManifests(catalog))
      case "rewrite_position_delete_files" =>
        Some(new RewritePositionDeleteFiles(catalog))
      case "expire_snapshots"    => Some(new ExpireSnapshots(catalog))
      case "rollback_to_snapshot" => Some(new RollbackToSnapshot(catalog))
      case "rollback_to_timestamp" => Some(new RollbackToTimestamp(catalog))
      case "set_current_snapshot" => Some(new SetCurrentSnapshot(catalog))
      case "publish_changes"     => Some(new PublishChanges(catalog))
      case "cherrypick_snapshot" => Some(new CherrypickSnapshot(catalog))
      case "set_partition_spec"  => Some(new SetPartitionSpec(catalog))
      case "create_changelog_view" => Some(new CreateChangelogView(catalog))
      case "compute_table_stats" => Some(new ComputeTableStats(catalog))
      case _                     => None
    }

  /** Iceberg-style sort-order parsing — shared with the write path. */
  private[catalog] def parseSortOrder(s: String): Seq[org.apache.spark.sql.Column] =
    GraftTable.parseSortOrder(s)

  private def str(v: String): UTF8String = UTF8String.fromString(v)

  private abstract class GraftProcedure(catalog: GraftSparkCatalog,
      procName: String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    protected def table(qualified: String): GraftTable = {
      val parts = qualified.split("\\.")
      val ident = Identifier.of(parts.init, parts.last)
      GraftTable.load(SparkSession.active, catalog.tableLocation(ident))
    }

    protected def result(schema: StructType, resultRows: Seq[InternalRow]): java.util.Iterator[Scan] =
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = resultRows.toArray
        override def readSchema(): StructType = schema
      }).iterator()

    protected def param(n: String, dt: DataType): ProcedureParameter =
      ProcedureParameter.in(n, dt).build()
    protected def param(n: String, dt: DataType, default: String): ProcedureParameter =
      ProcedureParameter.in(n, dt).defaultValue(default).build()
  }

  /** `fast_forward(table, branch, to)`: move `branch` up to `to`'s head
    * (ancestor-checked). Returns the branch and its new snapshot id. */
  private class FastForward(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "fast_forward") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("branch", StringType), param("to", StringType))
    private val out = StructType(Seq(
      StructField("branch_updated", StringType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val branch = input.getUTF8String(1).toString
      val to = input.getUTF8String(2).toString
      t.fastForward(branch, to)
      val head = t.meta.refs(branch)
      result(out, Seq(new GenericInternalRow(Array[Any](str(branch), head))))
    }
  }

  /** `remove_orphan_files(table, dry_run => …, older_than => …)`: list (and
    * unless dry_run, delete) unreferenced data files older than the cutoff.
    * One row per orphan, like the reference procedure. */
  private class RemoveOrphanFiles(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "remove_orphan_files") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("dry_run", BooleanType, "false"),
      param("older_than", TimestampType, "NULL"))
    private val out = StructType(Seq(
      StructField("orphan_file_location", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val dryRun = !input.isNullAt(1) && input.getBoolean(1)
      val orphans =
        if (input.isNullAt(2)) t.removeOrphanFiles(dryRun)
        else t.removeOrphanFiles(dryRun, olderThanMs = input.getLong(2) / 1000L)
      result(out, orphans.map(p => new GenericInternalRow(Array[Any](str(p)))))
    }
  }

  /** `add_files(table, source_dir)` — Iceberg's data-lake onboarding
    * procedure: reference existing parquet files as one append snapshot
    * (hard-linked, zero byte copy; see [[GraftTable.addFiles]] for the
    * compatibility contract). Returns added file/record counts. */
  private class AddFiles(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "add_files") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("source_dir", StringType))
    private val out = StructType(Seq(
      StructField("added_files_count", IntegerType, nullable = false),
      StructField("added_records_count", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val snap = t.addFiles(input.getUTF8String(1).toString)
      result(out, Seq(new GenericInternalRow(Array[Any](
        snap.addedFiles.size,
        snap.summary.get("added-records").map(_.toLong).getOrElse(0L)))))
    }
  }

  /** `snapshot(source_table, table, link => false)` — zero-copy clone of
    * the source's current state as a NEW independently-evolving table
    * under the target catalog name. Default is METADATA-ONLY (one append
    * snapshot whose entries reference the source files by absolute base,
    * Iceberg parity — O(1) filesystem work however many files, with
    * Iceberg's source-dependence caveat); pass `link => true` for the
    * hard-link mode whose physical mutual maintenance immunity the spec
    * pins. Independence, caveat and scope contract in
    * [[GraftTable.snapshotTo]]. */
  private class SnapshotTable(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "snapshot") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("source_table", StringType),
      param("table", StringType),
      param("link", BooleanType, "false"))
    private val out = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("imported_files_count", IntegerType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false),
      // the caveat, in-band: a metadata-only clone depends on the source's
      // retention/DROP lifecycle (its entries point into the source's data
      // dir); `link => true` clones are physically independent
      StructField("storage", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val src = table(input.getUTF8String(0).toString)
      val targetName = input.getUTF8String(1).toString
      val link = !input.isNullAt(2) && input.getBoolean(2)
      val parts = targetName.split("\\.")
      val loc = catalog.tableLocation(Identifier.of(parts.init, parts.last))
      val t = src.snapshotTo(loc, targetName, link = link)
      val m = t.meta
      result(out, Seq(new GenericInternalRow(Array[Any](
        str(targetName),
        m.currentSnapshot.map(_.files.size).getOrElse(0),
        m.currentSnapshotId.getOrElse(0L),
        str(if (link) "linked (physically independent)"
            else "metadata-only (shares source data files; source "
              + "expire/GC/DROP can remove them)")))))
    }
  }

  /** `register_table(table, location)` — serve an EXISTING graft table
    * under a catalog name: the catalog slot holds only a pointer, nothing
    * moves, and dropping the name unregisters without touching the table. */
  private class RegisterTable(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "register_table") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("location", StringType))
    private val out = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false),
      StructField("location", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val name = input.getUTF8String(0).toString
      val loc = input.getUTF8String(1).toString
      val parts = name.split("\\.")
      catalog.registerTable(Identifier.of(parts.init, parts.last), loc)
      val m = GraftTable.load(SparkSession.active, loc).meta
      result(out, Seq(new GenericInternalRow(Array[Any](
        str(name), m.currentSnapshotId.getOrElse(0L), str(loc)))))
    }
  }

  /** `ancestors_of(table, snapshot_id => NULL)` — Iceberg's lineage
    * procedure: the ancestry chain of the given snapshot (default: the
    * current main head), newest first. */
  private class AncestorsOf(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "ancestors_of") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("snapshot_id", LongType, "NULL"))
    private val out = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("timestamp_ms", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val m = t.meta
      val head =
        if (input.isNullAt(1)) m.currentSnapshotId.getOrElse(
          throw new IllegalArgumentException(
            s"ancestors_of: ${m.name} has no current snapshot"))
        else input.getLong(1)
      require(m.snapshot(head).isDefined,
        s"ancestors_of: unknown snapshot $head on ${m.name}")
      result(out, m.ancestry(head).flatMap(m.snapshot).map(s =>
        new GenericInternalRow(Array[Any](s.id, s.timestampMs))))
    }
  }

  /** `rewrite_data_files(table, strategy => 'sort', sort_order => '…')`:
    * sort-compact the current snapshot. Returns files removed/added. */
  private class RewriteDataFiles(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "rewrite_data_files") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("strategy", StringType, "'sort'"),
      param("sort_order", StringType, "NULL"))
    private val out = StructType(Seq(
      StructField("rewritten_data_files_count", IntegerType, nullable = false),
      StructField("added_data_files_count", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val strategy =
        if (input.isNullAt(1)) "sort" else input.getUTF8String(1).toString
      require(strategy.equalsIgnoreCase("sort") ||
          strategy.equalsIgnoreCase("binpack"),
        s"rewrite_data_files: unsupported strategy '$strategy' " +
          "(supported: 'sort', 'binpack')")
      val order =
        if (input.isNullAt(2)) null else input.getUTF8String(2).toString.trim
      val before = t.meta.currentSnapshot.map(_.files.size).getOrElse(0)
      // Iceberg's zorder(...) sort-order form routes to the z-order rewrite
      val ZOrder = "(?i)^zorder\\s*\\(([^)]*)\\)$".r
      val snap =
        if (strategy.equalsIgnoreCase("binpack")) t.rewriteDataFilesBinpack()
        else order match {
          case null => t.rewriteDataFilesSorted(
            Seq(asc_nulls_last(t.schema.fieldNames.head)))
          case ZOrder(cols) => t.rewriteDataFilesZOrder(
            cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          case s => t.rewriteDataFilesSorted(parseSortOrder(s))
        }
      result(out, Seq(new GenericInternalRow(Array[Any](before, snap.files.size))))
    }
  }

  /** `rewrite_manifests(table)`: rebuild the manifest grouping. */
  private class RewriteManifests(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "rewrite_manifests") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("rewritten_manifests_count", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      t.rewriteManifests()
      result(out, Seq(new GenericInternalRow(Array[Any](t.manifestsDF.count()))))
    }
  }

  /** `rewrite_position_delete_files(table)`: compact the head snapshot's
    * position-delete files and drop dangling entries (Iceberg's
    * rewrite_position_delete_files procedure). */
  private class RewritePositionDeleteFiles(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "rewrite_position_delete_files") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("rewritten_delete_files_count", LongType, nullable = false),
      StructField("added_delete_files_count", LongType, nullable = false),
      StructField("removed_delete_records", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val snap = t.rewritePositionDeleteFiles()
      // a no-op (no position deletes) returns the unchanged head, whose
      // summary carries none of the rewrite keys — report zeros
      val rewritten =
        snap.summary.get("rewritten-delete-files").map(_.toLong).getOrElse(0L)
      val added = if (rewritten == 0L) 0L
        else snap.summary.get("added-delete-files").map(_.toLong).getOrElse(0L)
      result(out, Seq(new GenericInternalRow(Array[Any](
        rewritten, added,
        snap.summary.get("removed-delete-records").map(_.toLong).getOrElse(0L)))))
    }
  }

  /** `compute_table_stats(table)` — Iceberg's procedure of the same name:
    * one pass over the current snapshot computing per-column HLL-sketch
    * NDV + exact null counts, persisted in table metadata pinned to the
    * snapshot id and served through the DSv2 scan's `Statistics` for CBO
    * join/filter estimation. */
  private class ComputeTableStats(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "compute_table_stats") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("columns_analyzed", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val rec = table(input.getUTF8String(0).toString).computeTableStats()
      result(out, Seq(new GenericInternalRow(Array[Any](
        rec.snapshotId, rec.rowCount, rec.cols.size))))
    }
  }

  /** `rollback_to_snapshot(table, snapshot_id)`: rewind `main` to an
    * ancestor snapshot (Iceberg's rollback procedure). */
  private class RollbackToSnapshot(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "rollback_to_snapshot") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("snapshot_id", LongType))
    private val out = StructType(Seq(
      StructField("previous_snapshot_id", LongType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val target = input.getLong(1)
      val previous = t.meta.refs("main")
      t.rollbackToSnapshot(target)
      result(out, Seq(new GenericInternalRow(Array[Any](previous, target))))
    }
  }

  /** `cherrypick_snapshot(table, snapshot_id)`: re-apply an append
    * snapshot's added files onto the current main head as a new commit
    * (Iceberg's WAP publish when fast-forward's ancestry requirement
    * doesn't hold — main moved after staging). */
  private class CherrypickSnapshot(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "cherrypick_snapshot") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("snapshot_id", LongType))
    private val out = StructType(Seq(
      StructField("source_snapshot_id", LongType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val source = input.getLong(1)
      val snap = t.cherryPick(source)
      result(out, Seq(new GenericInternalRow(Array[Any](source, snap.id))))
    }
  }

  /** `set_partition_spec(table, partition_by => 'a, b')`: partition-spec
    * evolution — future writes use the new spec, existing files keep their
    * layout, compaction migrates (Iceberg ALTER PARTITION FIELD
    * semantics). Empty string makes the table unpartitioned. */
  private class SetPartitionSpec(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "set_partition_spec") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("partition_by", StringType))
    private val out = StructType(Seq(
      StructField("previous_spec", StringType, nullable = false),
      StructField("new_spec", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val cols =
        if (input.isNullAt(1)) Seq.empty
        else input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val previous = t.meta.partitionCols.mkString(", ")
      t.updatePartitionSpec(cols)
      result(out, Seq(new GenericInternalRow(
        Array[Any](str(previous), str(cols.mkString(", "))))))
    }
  }

  /** `create_changelog_view(table, from, to, view)`: register the
    * row-level changelog of `(from, to]` as a temp view (Iceberg's
    * create_changelog_view procedure). Returns the view name and change
    * count. */
  private class CreateChangelogView(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "create_changelog_view") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("from", StringType),
      param("to", StringType), param("view", StringType, "'changelog'"))
    private val out = StructType(Seq(
      StructField("view_name", StringType, nullable = false),
      StructField("change_count", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val view =
        if (input.isNullAt(3)) "changelog" else input.getUTF8String(3).toString
      val df = t.changelogBetween(
        input.getUTF8String(1).toString, input.getUTF8String(2).toString)
      df.createOrReplaceTempView(view)
      result(out, Seq(new GenericInternalRow(Array[Any](str(view), df.count()))))
    }
  }

  /** `expire_snapshots(table, older_than => …, retain_last => …)`: drop
    * history older than the cutoff, keeping branch pins + the last N.
    * One row per expired snapshot id. */
  /** `set_ref_retention(table, ref, min_snapshots_to_keep,
    * max_snapshot_age_ms, max_ref_age_ms)` — attach an Iceberg-style
    * retention policy to a branch or tag (round 15); all-NULL knobs clear
    * the policy back to table defaults. */
  private class SetRefRetention(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "set_ref_retention") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("ref", StringType),
      param("min_snapshots_to_keep", IntegerType, "NULL"),
      param("max_snapshot_age_ms", LongType, "NULL"),
      param("max_ref_age_ms", LongType, "NULL"))
    private val out = StructType(Seq(
      StructField("ref", StringType, nullable = false),
      StructField("policy", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val ref = input.getUTF8String(1).toString
      val minKeep = if (input.isNullAt(2)) None else Some(input.getInt(2))
      val maxAge = if (input.isNullAt(3)) None else Some(input.getLong(3))
      val maxRefAge = if (input.isNullAt(4)) None else Some(input.getLong(4))
      t.setRefRetention(ref, minKeep, maxAge, maxRefAge)
      val policy = t.meta.refRetention.get(ref)
        .map(_.toString).getOrElse("cleared")
      result(out, Seq(new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(ref),
        org.apache.spark.unsafe.types.UTF8String.fromString(policy)))))
    }
  }

  private class ExpireSnapshots(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "expire_snapshots") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("older_than", TimestampType, "NULL"),
      param("retain_last", IntegerType, "1"))
    private val out = StructType(Seq(
      StructField("expired_snapshot_id", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val olderThanMs =
        if (input.isNullAt(1)) System.currentTimeMillis()
        else input.getLong(1) / 1000L
      val retainLast = if (input.isNullAt(2)) 1 else input.getInt(2)
      val expired = t.expireSnapshots(olderThanMs, retainLast)
      result(out, expired.map(id => new GenericInternalRow(Array[Any](id))))
    }
  }

  /** `rollback_to_timestamp(table, timestamp)`: rewind main to the
    * latest main-ancestry snapshot current at `timestamp` — the
    * time-keyed twin of rollback_to_snapshot (Iceberg's procedure for
    * "undo everything since last night"). */
  private class RollbackToTimestamp(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "rollback_to_timestamp") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("timestamp", TimestampType))
    private val out = StructType(Seq(
      StructField("previous_snapshot_id", LongType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val tsMs = input.getLong(1) / 1000L
      val m = t.meta
      val snap = GraftSqlTables.snapshotAsOf(m, tsMs).getOrElse(
        throw new IllegalArgumentException(
          s"rollback_to_timestamp: no snapshot of ${m.name} is current at " +
            s"$tsMs ms — the timestamp predates the table"))
      val previous = m.refs("main")
      t.rollbackToSnapshot(snap.id)
      result(out, Seq(new GenericInternalRow(Array[Any](previous, snap.id))))
    }
  }

  /** `set_current_snapshot(table, snapshot_id)`: point main at ANY
    * retained snapshot — unlike rollback there is no ancestry
    * requirement (Iceberg's escape hatch for jumping sideways onto a
    * staged or branch-only snapshot). */
  private class SetCurrentSnapshot(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "set_current_snapshot") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("snapshot_id", LongType))
    private val out = StructType(Seq(
      StructField("previous_snapshot_id", LongType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val target = input.getLong(1)
      val previous = t.meta.refs("main")
      t.setCurrentSnapshot(target)
      result(out, Seq(new GenericInternalRow(Array[Any](previous, target))))
    }
  }

  /** `publish_changes(table, wap_id)`: find the snapshot staged under
    * `wap.id = <id>` and publish it onto main — cherry-pick when main
    * moved past its base, ref fast-forward when it is still parented on
    * the head; refuses an unknown or already-published wap id. */
  private class PublishChanges(catalog: GraftSparkCatalog)
    extends GraftProcedure(catalog, "publish_changes") {
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType), param("wap_id", StringType))
    private val out = StructType(Seq(
      StructField("source_snapshot_id", LongType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = table(input.getUTF8String(0).toString)
      val wapId = input.getUTF8String(1).toString
      val staged = t.snapshotForWapId(wapId).getOrElse(
        throw new IllegalArgumentException(
          s"publish_changes: no snapshot staged under wap.id '$wapId'"))
      val published = t.cherryPick(staged.id)
      result(out, Seq(new GenericInternalRow(
        Array[Any](staged.id, published.id))))
    }
  }
}
