package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Per-column min/max/null-count captured from the parquet footer at commit
  * time — the manifest-entry stats that let the driver skip whole files for
  * point/range predicates without opening them (Iceberg's manifest pruning,
  * reference SURVEY.md §4 "file skipping via column stats"). Values are
  * stored as strings; comparison semantics come from the table schema. */
case class ColumnStats(min: String, max: String, nullCount: Long)

/**
 * A single immutable data file tracked by the snapshot log.
 *
 * Stats (records/sizeBytes) are captured at commit time from the parquet
 * footer so that metadata queries and driver-side file skipping never have
 * to re-open data files. At 100 TB these stats would be produced by the
 * write tasks themselves and carried through the commit, exactly like
 * Iceberg manifest entries (see reference IcebergLoadActivityTask.scala:94
 * `t.files`).
 *
 * @param path            path relative to the table's data directory
 * @param partitionValues identity-partition values parsed/assigned at write
 * @param records         row count (parquet footer)
 * @param sizeBytes       file length
 * @param dataSeq         id of the snapshot that ADDED this file, stamped at
 *                        commit time and carried forward unchanged — the
 *                        data-sequence number merge-on-read delete files
 *                        compare against (a delete applies iff its seq is
 *                        greater). Persisted on the file itself, like
 *                        Iceberg's data_sequence_number, so applicability
 *                        survives the adding snapshot being expired from the
 *                        log. `None` only in metadata written before this
 *                        field existed; readers then fall back to deriving
 *                        it from the retained snapshot list.
 */
case class DataFile(
    path: String,
    partitionValues: Map[String, String],
    records: Long,
    sizeBytes: Long,
    stats: Option[Map[String, ColumnStats]] = None,
    dataSeq: Option[Long] = None,
    // Row lineage (Iceberg v3): the id assigned to this file's first row
    // at commit time — a row's `_row_id` is firstRowId + its file
    // position unless the file MATERIALIZES row ids (see `lineage`).
    // None only on files committed before this field existed; their rows
    // read a NULL `_row_id` until a compaction re-stamps them.
    firstRowId: Option[Long] = None,
    // True when the file physically stores `__row_id`/`__last_seq`
    // columns — rewrites (compaction, CoW delete/update/merge) write them
    // to PRESERVE row identity across the rewrite; a NULL cell in a
    // materialized column means "assign fresh": firstRowId + position for
    // ids, the file's own dataSeq for the last-updated sequence — exactly
    // the v3 inheritance rule.
    lineage: Boolean = false,
    // per-column Bloom filters over the file's values (base64 of Spark's
    // sketch format), written when `write.metadata.bloom-filter.column.X`
    // is set — the POINT-LOOKUP complement of min/max stats: on a
    // high-cardinality unsorted column every file's [min,max] straddles
    // every probe value and range stats prune nothing, while a ~2-20 KB
    // bloom per file lets the driver skip files for equality predicates
    // without opening them (Iceberg reaches the same shape with Puffin
    // blob stats). Keys are column names; values hash the column rendered
    // to its stat-string domain (see GraftTable.bloomProbeRendering).
    blooms: Option[Map[String, String]] = None,
    // Absolute data-root URI when the file lives OUTSIDE this table's own
    // data/ directory (Iceberg manifests reference absolute paths for
    // exactly this): the physical location is `$base/$path`, and `path`
    // keeps carrying the hive partition layout. Set by the metadata-only
    // `CALL system.snapshot` clone; None (the default, and what every
    // pre-existing metadata file deserializes to) means the file is owned
    // by this table under its data/ dir. Files with a base are NEVER
    // physically deleted by this table's maintenance — the owner (or its
    // remove_orphan_files) is the only legitimate deleter.
    base: Option[String] = None)

/**
 * One committed table version. Mirrors the reference's Iceberg snapshot
 * model (reference IcebergLoadActivityTask.scala:90 `t.snapshots`):
 * every append / merge / replace produces a new snapshot whose `files`
 * list fully describes the live data at that version.
 *
 * The file lists are externalized at commit into manifest files
 * (`manifest-<id>-<uuid>.json` under `_graft/`) referenced by name from
 * the root metadata and loaded lazily on first access — reading the log
 * is O(snapshots). Each snapshot carries a manifest LIST: an append's new
 * manifest holds only the files that commit ADDED, and the parent's
 * manifests are referenced untouched (Iceberg's manifest reuse, surfaced
 * by the reference's `t.manifests` table,
 * IcebergLoadActivityTask.scala:92), so commit metadata cost is
 * O(added files); removal/rewrite commits collapse the chain back to a
 * single full manifest.
 */
/**
 * A merge-on-read delete file: a parquet file under `data/_deletes/` whose
 * rows mark logical deletions. `seq` is the id of the committing snapshot:
 * the delete applies only to data files ADDED BEFORE it, so rows inserted
 * later are live again — the sequence-number semantics Iceberg row-level
 * deletes follow. Two kinds, mirroring Iceberg's delete-file formats:
 *
 *  - `equality` (default): rows are key tuples over `keyCols`; readers
 *    anti-join null-safely on those columns;
 *  - `position`: rows are `(__file, __pos)` pairs naming exact rows by
 *    data-file-relative path and parquet row index — deletes a single
 *    physical row even among full duplicates;
 *  - `dv`: DELETION VECTORS (Iceberg v3's position-delete format): one
 *    row PER DATA FILE holding the file's deleted row indexes as a
 *    sorted run-length encoding `__runs` = [start0, len0, start1,
 *    len1, …] — readers merge the vector into a per-row membership
 *    probe (O(log runs) binary search) instead of a row-list anti-join,
 *    and the delete payload is O(runs), not O(deleted rows). `records`
 *    counts the DELETED POSITIONS the vector covers (Σ len), matching
 *    the position-list accounting.
 *
 * Compaction materializes and drops delete files of all kinds.
 *
 * `targetPaths` (round 17, position/dv kinds only): the data-dir-relative
 * paths of the data files this delete file's rows target, recorded at
 * write time — planners (the changelog stream's masked-CoW check and DV
 * partition planning) consult it as O(1) metadata instead of reading the
 * delete file's rows on the driver. Empty means NOT RECORDED (legacy
 * files, equality deletes, or a commit wider than
 * `write.delete.max-recorded-targets`) — readers must fall back to the
 * content read, never treat empty as "targets nothing".
 */
case class DeleteFile(
    path: String,
    keyCols: Seq[String],
    records: Long,
    sizeBytes: Long,
    seq: Long,
    kind: String = "equality",
    targetPaths: Seq[String] = Seq.empty) {
  def isPositional: Boolean = kind == "position"
  def isDv: Boolean = kind == "dv"
}

/** One externalized file-list fragment — the manifest step: the root
  * metadata stores only manifest file NAMES, and the lists load lazily
  * on first access, so reading the log is O(snapshots), not O(files). */
case class ManifestData(
    files: Seq[DataFile] = Seq.empty,
    deleteFiles: Seq[DeleteFile] = Seq.empty)

case class GraftSnapshot(
    id: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | merge | replace | delete | overwrite
    inlineFiles: Seq[DataFile],
    addedFiles: Seq[String],
    removedFiles: Seq[String],
    summary: Map[String, String],
    inlineDeleteFiles: Seq[DeleteFile] = Seq.empty,
    // legacy (pre-r8) single full manifest under _graft/; kept so metadata
    // written by earlier builds still reads — treated as the head of the
    // manifest list
    manifest: Option[String] = None,
    // manifest LIST (Iceberg-style): the snapshot's live file set is the
    // UNION of these manifests' lists plus any inline entries. An append
    // writes ONE manifest holding only its added files and references the
    // parent's manifests untouched, so commit metadata cost is O(added),
    // not O(live files); removal/rewrite commits collapse back to a single
    // full manifest. Manifests are therefore SHARED across snapshots and
    // garbage-collected by reference counting (expire_snapshots).
    manifests: Seq[String] = Seq.empty) {

  /** All manifest names this snapshot's live lists resolve through. */
  def manifestRefs: Seq[String] = manifest.toSeq ++ manifests

  /** Injected by SnapshotLog after read/commit (not a constructor param, so
    * it never serializes and does not affect case-class equality). */
  @transient private[table] var manifestLoader: String => ManifestData = _

  private lazy val loaded: ManifestData = {
    val refs = manifestRefs
    if (refs.isEmpty) ManifestData(inlineFiles, inlineDeleteFiles)
    else {
      require(manifestLoader != null,
        s"Snapshot $id references manifests $refs but no loader is attached")
      val parts = refs.map(manifestLoader)
      // manifest order is parent-first, so files line up with commit order;
      // inline entries (only present pre-externalization) come last
      ManifestData(parts.flatMap(_.files) ++ inlineFiles,
        parts.flatMap(_.deleteFiles) ++ inlineDeleteFiles)
    }
  }

  /** Live data files at this version (lazily manifest-loaded). */
  def files: Seq[DataFile] = loaded.files

  /** Live merge-on-read delete files at this version. */
  def deleteFiles: Seq[DeleteFile] = loaded.deleteFiles

  def totalRecords: Long = files.map(_.records).sum
  def totalBytes: Long = files.map(_.sizeBytes).sum
}

/**
 * Root metadata for a Graft table: schema, partitioning, properties,
 * snapshot log and named refs (branches). The `main` branch is the
 * current table state; additional refs pin historical snapshots for
 * time travel exactly like Iceberg branch refs (reference
 * IcebergLoadActivityTask.scala:78-80 CREATE OR REPLACE BRANCH).
 */
/** One column rename, applied as metadata only: data files whose commit
  * sequence is <= `afterSeq` still store the column under `from`; the read
  * path unwinds the history per file era (name-based stand-in for Iceberg's
  * field-id resolution). */
case class RenameRecord(from: String, to: String, afterSeq: Long)

/** One column type promotion (Iceberg `ALTER COLUMN … TYPE` — int→long,
  * float→double, decimal precision widen), applied as metadata only: data
  * files whose commit sequence is <= `afterSeq` still store the column
  * under the narrower physical type (`fromJson`); the read path scans each
  * era under its physical type and upcasts to the declared one. */
case class TypeChangeRecord(column: String, fromJson: String, toJson: String,
    afterSeq: Long)

/** One column added with a DEFAULT (Iceberg v3's initial-default /
  * write-default split): rows in data files committed at sequence <=
  * `afterSeq` — files written BEFORE the column existed — read
  * `defaultSql`'s literal instead of NULL. The value is the FOLDED
  * constant captured at ADD COLUMN time (so `current_timestamp` freezes,
  * exactly Spark's EXISTS_DEFAULT / Iceberg's initial-default contract)
  * and is immutable for the life of the column; the CURRENT write-default
  * — what an INSERT that omits the column stores — lives in the schema
  * field metadata (Spark's CURRENT_DEFAULT key) and may be changed or
  * dropped later without touching this record. Keyed by the column's
  * CURRENT declared name; [[GraftTable.renameColumn]] rewrites the key on
  * rename, like [[TypeChangeRecord]]. */
case class ColumnDefaultRecord(column: String, defaultSql: String,
    afterSeq: Long)

/** Table-level column statistics for one column: the HLL-sketch NDV
  * estimate, the exact null count, and the base64 datasketches HLL
  * payload itself — kept because HLL sketches are MERGEABLE (hll_union),
  * which is what makes incremental maintenance O(columns) per append
  * instead of a table rescan. */
case class ColumnNdv(ndv: Long, nullCount: Long, sketchB64: String)

/** One `compute_table_stats` result pinned to the snapshot it was
  * computed at (Iceberg's statistics-file model: stats reference a
  * snapshot id; readers serve them only for that snapshot unless
  * incrementally advanced). Metadata-sized: O(columns) sketches. */
case class ColumnStatsRecord(
    snapshotId: Long,
    computedAtMs: Long,
    rowCount: Long,
    cols: Map[String, ColumnNdv])

/** Per-ref snapshot-retention policy (Iceberg's SnapshotRef retention
  * fields): `minSnapshotsToKeep` / `maxSnapshotAgeMs` govern how much of
  * a BRANCH's ancestry `expire_snapshots` preserves (branch-only, like
  * Iceberg); `maxRefAgeMs` ages the ref itself out — branch or tag —
  * relative to its pointed snapshot's commit time. Unset fields fall back
  * to the table-wide defaults (`history.expire.max-ref-age-ms` property;
  * min-snapshots-to-keep default 1). Without these knobs every branch pin
  * is immortal, which at 100x means unbounded metadata growth on
  * long-lived WAP/tag refs. */
case class RefRetention(
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

case class TableMetadata(
    name: String,
    schemaJson: String,
    partitionCols: Seq[String],
    props: Map[String, String],
    refs: Map[String, Long],
    snapshots: Seq[GraftSnapshot],
    version: Int,
    lastUpdatedMs: Long,
    metadataLog: Seq[MetadataLogEntry],
    tags: Map[String, Long] = Map.empty,
    // per-ref retention policies keyed by ref name (empty on pre-r15
    // metadata: json4s defaults the field on deserialization)
    refRetention: Map[String, RefRetention] = Map.empty,
    renames: Seq[RenameRecord] = Seq.empty,
    // past physical names (renamed-from / dropped): never reusable, since
    // live files may still store data under them and resolution is by name
    tombstones: Seq[String] = Seq.empty,
    typeChanges: Seq[TypeChangeRecord] = Seq.empty,
    // column-level NDV/null statistics (CALL system.compute_table_stats);
    // None on pre-stats metadata and whenever stats were never computed
    columnStats: Option[ColumnStatsRecord] = None,
    // immutable initial defaults for columns added with DEFAULT (empty on
    // pre-default metadata: json4s defaults the field on deserialization)
    columnDefaults: Seq[ColumnDefaultRecord] = Seq.empty,
    // row lineage (Iceberg v3): the next unassigned row id. Commits stamp
    // `firstRowId` on each added data file from here and advance it by
    // the file's record count — monotonic for the table's life (rollback
    // moves refs, never this counter, so ids are never reused even when
    // histories diverge). 0 on pre-lineage metadata.
    nextRowId: Long = 0L) {

  def currentSnapshotId: Option[Long] = refs.get(SnapshotLog.MainBranch)

  def snapshot(id: Long): Option[GraftSnapshot] = snapshots.find(_.id == id)

  /** Branches first, then immutable tags, then a raw numeric snapshot id. */
  def snapshotForRef(ref: String): Option[GraftSnapshot] =
    refs.get(ref).orElse(tags.get(ref)).flatMap(snapshot).orElse {
      // allow addressing a snapshot directly by its numeric id
      scala.util.Try(ref.toLong).toOption.flatMap(snapshot)
    }

  def currentSnapshot: Option[GraftSnapshot] =
    currentSnapshotId.flatMap(snapshot)

  /** Snapshot ids on the ancestry chain of the given ref head. */
  /** Retained ancestor chain of `headId`, newest first. Emits only ids
    * that still RESOLVE in this metadata: the oldest retained snapshot's
    * parentId may point past the expiry boundary, and emitting that
    * dangling id made every `ancestry`-then-act consumer (rollback,
    * changelog planning) trip over a snapshot that no longer exists —
    * round-16 fuzz finding. */
  def ancestry(headId: Long): Seq[Long] = {
    val byId = snapshots.map(s => s.id -> s).toMap
    Iterator
      .iterate(Option(headId))(cur => cur.flatMap(byId.get).flatMap(_.parentId))
      .takeWhile(_.exists(byId.contains))
      .flatten
      .toSeq
  }

  def isAncestorOf(maybeAncestor: Long, headId: Long): Boolean =
    ancestry(headId).contains(maybeAncestor)
}

case class MetadataLogEntry(timestampMs: Long, file: String, latestSnapshotId: Option[Long])

/**
 * Persistence + optimistic-concurrency commit protocol for TableMetadata.
 *
 * Layout under `<tableDir>/_graft/`:
 *   v<N>.metadata.json   -- immutable metadata versions
 *   version-hint.text    -- advisory pointer to latest N (readers fall back
 *                           to directory listing if stale/missing)
 *
 * Commit = write a temp file, then rename to `v<N+1>.metadata.json` with
 * overwrite=false. The rename acts as the compare-and-swap: on HDFS it is
 * atomic; concurrent committers race on the same target name and exactly
 * one wins (the same protocol as Iceberg's HadoopTableOperations). On a
 * real deployment the CAS would live in a catalog service (REST/JDBC, as in
 * reference IcebergSupport.scala:26-35); the storage-level protocol here
 * keeps the library self-contained.
 */
/**
 * The pluggable atomic-publish step of the commit protocol: install a
 * fully-written temp metadata file as the immutable `v<N>.metadata.json`
 * slot such that of all concurrent committers EXACTLY ONE wins and every
 * loser throws (an `IllegalStateException` mentioning "Concurrent
 * commit", which the append retry loop recognizes).
 *
 * The two storage-level implementations below cover local FS (hard-link
 * CAS) and rename-atomic stores like HDFS (no-overwrite rename CAS). On
 * object stores without atomic rename, THIS is the seam where a catalog
 * service slots in — a REST/JDBC catalog (the reference delegates its
 * whole commit protocol to one, IcebergSupport.scala:26-35) implements
 * `publish` as a conditional-update call against the service and the rest
 * of the table stack is unchanged. Install via [[SnapshotLog.commitGuardFor]].
 */
trait CommitGuard {
  /** Atomically claim `target` with the bytes at `tmp` (already fully
    * written, length = `payload`). Must delete `tmp` on the loss path and
    * throw; on success `target` holds exactly `payload`. */
  def publish(fs: FileSystem, tmp: Path, target: Path, payload: Array[Byte]): Unit

  protected def lost(target: Path): Nothing =
    throw new CommitLostException(
      s"Concurrent commit detected for $target; retry on fresh metadata")

  /** Slot-owner install for service-adjudicated guards (REST/JDBC): the
    * already-fully-written `tmp` is MOVED onto `target` so a concurrent
    * reader only ever sees the file absent or complete — never the empty
    * window a `create(target)`+write install exposes (which crashed a
    * racing reader JVM with "No content to map" mid-commit). Ownership of
    * the slot was already decided by the service, so an overwrite is safe:
    * any pre-existing content is a loser's heal copy of these SAME winning
    * bytes. A store that refuses the rename (target exists) therefore
    * already holds the payload — just drop `tmp`. */
  protected def installOwned(fs: FileSystem, tmp: Path, target: Path): Unit = {
    if (!fs.rename(tmp, target)) {
      // Hadoop rename returns false (not throws) for several precondition
      // failures. Target present => a loser's heal already materialized
      // these same winning bytes; target ABSENT => the install must not be
      // lost (the service recorded this committer as the slot owner), so
      // fall back to copying the bytes in place — the brief
      // visible-but-incomplete window is strictly better than a committed
      // version whose metadata file never appears.
      if (!fs.exists(target)) {
        val in = fs.open(tmp)
        val bytes = try {
          val b = new Array[Byte](fs.getFileStatus(tmp).getLen.toInt)
          in.readFully(b); b
        } finally in.close()
        val out = fs.create(target, true)
        try out.write(bytes) finally out.close()
      }
      fs.delete(tmp, false)
    }
  }

  /** Heal-path install: materialize the service's copy of the winning
    * `bytes` at `target` atomically (fresh sibling tmp + move), for the
    * same no-partial-read guarantee as [[installOwned]]. */
  protected def installBytes(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(target.getParent, s".heal-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    if (!fs.rename(tmp, target)) fs.delete(tmp, false)
  }

  /** Commit-state-unknown resolution for service-adjudicated guards
    * (REST/JDBC): a transport failure during the claim is AMBIGUOUS — the
    * service may have durably recorded this committer's claim before the
    * ack was lost. Treating it as a plain failure would let the caller
    * (or the user's job retry) re-stage and re-commit the same rows
    * against fresh metadata: duplicate data. Instead the guard re-queries
    * the service for the slot's recorded payload and adjudicates:
    *
    *  - recorded == ours   → the claim LANDED: this committer won;
    *    install and return success.
    *  - recorded == theirs → a clean loss; heal storage if the winner
    *    died pre-install, then raise the normal "Concurrent commit"
    *    (callers' retry loops recognize it — retrying on fresh metadata
    *    is safe because OUR claim provably never landed).
    *  - slot absent        → the claim provably never landed; rethrow the
    *    transport failure (a retry is safe).
    *
    * Only if the RE-QUERY also fails does the guard give up and raise
    * [[CommitStateUnknownException]] — the one outcome a caller must NOT
    * blindly retry (mirroring Iceberg's CommitStateUnknownException
    * contract, public Iceberg API).
    */
  protected def adjudicateAmbiguousClaim(fs: FileSystem, tmp: Path,
      target: Path, payload: Array[Byte], transportFailure: Throwable,
      queryRecorded: () => Option[Array[Byte]]): Unit = {
    val recorded =
      try queryRecorded()
      catch {
        case scala.util.control.NonFatal(q) =>
          fs.delete(tmp, false)
          val e = new CommitStateUnknownException(
            s"Commit state UNKNOWN for $target: the claim transport failed " +
              s"(${transportFailure.getMessage}) and the state re-query also " +
              s"failed (${q.getMessage}). The service may or may not have " +
              "recorded this commit — do NOT blindly retry; inspect the " +
              "catalog service before re-committing.", transportFailure)
          e.addSuppressed(q)
          throw e
      }
    recorded match {
      case Some(winner) if java.util.Arrays.equals(winner, payload) =>
        installOwned(fs, tmp, target) // our claim landed before the ack was lost
      case Some(winner) =>
        fs.delete(tmp, false)
        if (!fs.exists(target)) installBytes(fs, target, winner)
        lost(target)
      case None =>
        fs.delete(tmp, false)
        throw transportFailure // claim provably never landed: retry is safe
    }
  }
}

/** A PROVEN clean loss of the commit race: this committer's claim
  * verifiably never landed (straight CAS loss, or service adjudication
  * found another writer's payload in the slot). Retrying on fresh
  * metadata is always safe. Typed so dispatch sites match on the class
  * rather than the "Concurrent commit" message substring — a guard that
  * wraps/translates messages can no longer misroute a clean loss into
  * the keep-manifests branch, and an unrelated IllegalStateException
  * that happens to contain the phrase can no longer trigger manifest
  * deletion. Extends IllegalStateException with the same message shape
  * for source compatibility with existing catch sites. */
final class CommitLostException(msg: String)
  extends IllegalStateException(msg)

/** The claim transport failed AND the follow-up state query failed: the
  * service may or may not hold this committer's claim. Callers must not
  * treat this as a clean failure and re-commit — that is exactly the
  * duplicate-data path the service guards exist to prevent. */
final class CommitStateUnknownException(msg: String, cause: Throwable)
  extends IllegalStateException(msg, cause)

object CommitGuard {
  /** Crash-injection point for the service guards' claim→install window —
    * the exact gap the heal path exists for. Test-only (never set in
    * production): when system property `graft.test.crashAfterClaim` is a
    * probability > 0, a claim-WINNING committer dies before installing —
    * `graft.test.crashAfterClaim.mode=halt` kills the whole JVM
    * (multi-process campaigns), `=throw` aborts just this commit
    * (thread-level campaigns against embedded databases). */
  private[table] def maybeCrashAfterClaim(): Unit = {
    val p = sys.props.get("graft.test.crashAfterClaim")
      .flatMap(_.toDoubleOption).getOrElse(0.0)
    if (p > 0.0 && scala.util.Random.nextDouble() < p) {
      sys.props.getOrElse("graft.test.crashAfterClaim.mode", "halt") match {
        case "throw" => throw new InjectedCommitCrash
        case _ => Runtime.getRuntime.halt(137)
      }
    }
  }
}

/** Thrown by the `throw`-mode crash injection: the commit was CLAIMED but
  * never installed — storage heals on the next contender. */
final class InjectedCommitCrash
  extends RuntimeException("injected crash between claim and install")

/** Local filesystem: rename OVERWRITES an existing target, so it cannot
  * carry the CAS. POSIX link(2) can — creating a hard link fails atomically
  * with EEXIST when the version slot is taken, which makes cross-PROCESS
  * concurrent commits exactly-one-winner (the multi-writer protocol
  * CrossProcessCommitSpec exercises with real competing JVMs). The payload
  * is fully written to tmp first, so the claimed target is never
  * observable half-written. */
object HardLinkCommitGuard extends CommitGuard {
  def publish(fs: FileSystem, tmp: Path, target: Path, payload: Array[Byte]): Unit = {
    val tmpLocal = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
    val targetLocal = java.nio.file.Paths.get(fs.makeQualified(target).toUri.getPath)
    try java.nio.file.Files.createLink(targetLocal, tmpLocal)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(tmp, false)
        lost(target)
    }
    fs.delete(tmp, false)
  }
}

/** HDFS (and rename-atomic stores): rename with an existing-target refusal
  * IS the CAS — this guard is correct ONLY on filesystems whose rename
  * REFUSES an existing target (the HDFS contract). The pre-check and the
  * read-back verification narrow, but cannot close, the race on stores
  * whose rename OVERWRITES (POSIX-style object-store adapters): there,
  * two committers can interleave rename/read-back and BOTH pass, silently
  * losing one commit. Such stores must be routed to a catalog guard
  * (link / JDBC / REST via [[SnapshotLog.commitGuardFor]]) — a
  * filesystem without an atomic no-overwrite primitive cannot host a
  * correct multi-writer file CAS, which is exactly why Iceberg requires a
  * catalog for S3. */
object RenameCommitGuard extends CommitGuard {
  def publish(fs: FileSystem, tmp: Path, target: Path, payload: Array[Byte]): Unit = {
    if (fs.exists(target)) {
      fs.delete(tmp, false)
      lost(target)
    }
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      lost(target)
    }
    // read back and verify our bytes are the ones that landed
    val landed = {
      val in = fs.open(target)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(target).getLen.toInt)
        in.readFully(bytes)
        bytes
      } finally in.close()
    }
    if (!java.util.Arrays.equals(landed, payload))
      lost(target)
  }
}

object SnapshotLog {
  val MainBranch = "main"
  implicit val formats: Formats = DefaultFormats

  /** Guard selection by storage scheme — replace to route commits through
    * a catalog service (see [[CommitGuard]]); the default covers local FS
    * and rename-atomic distributed stores. */
  @volatile var commitGuardFor: (FileSystem, Path) => CommitGuard =
    (fs, target) =>
      if (target.toUri.getScheme == "file" ||
          (target.toUri.getScheme == null && fs.getScheme == "file"))
        HardLinkCommitGuard
      else RenameCommitGuard

  def metadataDir(tableDir: String): String = s"$tableDir/_graft"

  private def metadataFile(tableDir: String, v: Int): Path =
    new Path(metadataDir(tableDir), f"v$v%05d.metadata.json")

  private def hintFile(tableDir: String): Path =
    new Path(metadataDir(tableDir), "version-hint.text")

  def exists(tableDir: String, conf: Configuration): Boolean = {
    val dir = new Path(metadataDir(tableDir))
    val fs = dir.getFileSystem(conf)
    fs.exists(dir) && latestVersion(tableDir, conf).isDefined
  }

  /** Latest committed metadata version, by hint then by listing. */
  def latestVersion(tableDir: String, conf: Configuration): Option[Int] = {
    val dir = new Path(metadataDir(tableDir))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return None
    // fast path (Iceberg's version-hint.text): read the hint, verify its
    // version file exists, then probe FORWARD until a version is missing —
    // O(commits since the hint, usually 0-1) stat calls instead of a full
    // directory listing, the op object stores price by entry count. A
    // missing/corrupt/stale hint (lost hint race, retention-deleted file)
    // falls back to the listing, which stays the source of truth.
    val hinted =
      try {
        val hp = hintFile(tableDir)
        if (!fs.exists(hp)) None
        else {
          val in = fs.open(hp)
          val s = try new String(in.readAllBytes(), "UTF-8").trim
            finally in.close()
          s.toIntOption.filter(v => fs.exists(metadataFile(tableDir, v)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    hinted match {
      case Some(v0) =>
        var v = v0
        while (fs.exists(metadataFile(tableDir, v + 1))) v += 1
        Some(v)
      case None =>
        val listed = fs
          .listStatus(dir)
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("v") && n.endsWith(".metadata.json") =>
            n.stripPrefix("v").stripSuffix(".metadata.json").toInt
          }
        if (listed.isEmpty) None else Some(listed.max)
    }
  }

  def read(tableDir: String, conf: Configuration): TableMetadata = {
    val v = latestVersion(tableDir, conf).getOrElse(
      throw new IllegalStateException(s"No graft table at $tableDir"))
    readVersion(tableDir, v, conf)
  }

  // Committed root-metadata files are immutable (v%05d is written exactly
  // once, behind the commit guard), so the parsed tree is memoized per
  // (tableDir, version) — every table op calls `meta`, and without this a
  // metadata-heavy workload re-reads and re-JSON-parses the (snapshot-
  // count-proportional) root file per call. At 100x snapshot counts that
  // per-call reload is a real driver-side metadata bottleneck. A hit is
  // still validated against the file's (modTime, len) with ONE stat call,
  // because DROP + recreate reuses version numbers in the same directory.
  // Access-order LRU, so a fixture population larger than the cap evicts
  // cold tables instead of clearing everything (the r9 manifest-cache
  // lesson). Sharing the parsed instance also shares each snapshot's
  // lazily-resolved manifest contents — resolution happens once per
  // cached version, not once per read.
  private case class MetaEntry(modTime: Long, len: Long, meta: TableMetadata)
  private val MetaCacheMax = 128
  private val metaCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Int), MetaEntry](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), MetaEntry]): Boolean =
        size > MetaCacheMax
    })

  /** Drop all cached metadata/manifest state under `tableDir` — called by
    * table DROP so a recreate in the same directory can never observe the
    * old table through the cache (the stat validation would catch it too;
    * this makes it structural). */
  private[table] def invalidate(tableDir: String): Unit = {
    metaCache.synchronized {
      metaCache.keySet.removeIf(_._1 == tableDir)
    }
    manifestCache.synchronized {
      manifestCache.keySet.removeIf(_._1 == tableDir)
    }
  }

  def readVersion(tableDir: String, v: Int, conf: Configuration): TableMetadata = {
    val p = metadataFile(tableDir, v)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val key = (tableDir, v)
    val hit = metaCache.get(key)
    if (hit != null && hit.modTime == st.getModificationTime && hit.len == st.getLen)
      return attachLoaders(hit.meta, tableDir, conf)
    val in = fs.open(p)
    val m = try {
      val bytes = new Array[Byte](st.getLen.toInt)
      in.readFully(bytes)
      parseMetadata(new String(bytes, "UTF-8"))
    } finally in.close()
    metaCache.put(key, MetaEntry(st.getModificationTime, st.getLen, m))
    attachLoaders(m, tableDir, conf)
  }

  /** Parse root metadata, accepting the legacy snapshot field names
    * (`files`/`deleteFiles`, pre-manifest-list builds) alongside the
    * current `inlineFiles`/`inlineDeleteFiles`: json4s silently defaults a
    * missing Seq field to empty, which would make old tables read back as
    * EMPTY rather than fail — so the legacy keys are renamed in the JSON
    * tree before extraction. */
  private[table] def parseMetadata(json: String): TableMetadata = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val migrated = JsonMethods.parse(json).transformField {
      case JField("snapshots", JArray(snaps)) =>
        JField("snapshots", JArray(snaps.map {
          case JObject(fields) => JObject(fields.map {
            case JField("files", v) => JField("inlineFiles", v)
            case JField("deleteFiles", v) => JField("inlineDeleteFiles", v)
            case f => f
          })
          case other => other
        }))
    }
    migrated.extract[TableMetadata]
  }

  // Manifest files are IMMUTABLE (uuid-named, never rewritten in place,
  // names never reused), so their parsed contents are safely memoized
  // across the repeated metadata re-reads every table op performs —
  // without this, resolving a head whose chain has k manifests would
  // re-open k files per access. Access-order LRU: the pre-r10 wholesale
  // clear() past the cap meant a fixture population larger than the cap
  // thrashed EVERY table's manifests on every metadata query.
  private val ManifestCacheMax = 256
  private val manifestCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), ManifestData](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), ManifestData]): Boolean =
        size > ManifestCacheMax
    })

  /** Read one snapshot's externalized file lists (the lazy half of the
    * manifest-list step; called on first `.files` access, never at log
    * read). */
  def readManifest(tableDir: String, name: String, conf: Configuration): ManifestData = {
    val key = (tableDir, name)
    val hit = manifestCache.get(key)
    if (hit != null) return hit
    val p = new Path(metadataDir(tableDir), name)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val data = try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      Serialization.read[ManifestData](new String(bytes, "UTF-8"))
    } finally in.close()
    manifestCache.put(key, data)
    data
  }

  private def attachLoaders(m: TableMetadata, tableDir: String,
      conf: Configuration): TableMetadata = {
    m.snapshots.foreach(_.manifestLoader = name => readManifest(tableDir, name, conf))
    m
  }

  /**
   * Commit `meta` as the next metadata version. `meta.version` must be the
   * version the writer read; the committed file is version+1. Throws if a
   * concurrent commit won the race.
   */
  def commit(tableDir: String, meta: TableMetadata, conf: Configuration): TableMetadata = {
    val nextV = meta.version + 1
    val dir = new Path(metadataDir(tableDir))
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // Manifest-list step: externalize any snapshot still carrying inline
    // entries into an immutable manifest file APPENDED to its manifest
    // list. An amortized append arrives here with inline = only its ADDED
    // files plus references to the parent's manifests, so the manifest
    // written is O(added) and prior manifests are reused untouched; the
    // root metadata stays O(snapshots) regardless of data file count.
    val newManifests = scala.collection.mutable.ArrayBuffer.empty[Path]
    val externalized = meta.snapshots.map { s =>
      if (s.inlineFiles.isEmpty && s.inlineDeleteFiles.isEmpty) s
      else {
        val name =
          f"manifest-${s.id}%05d-${java.util.UUID.randomUUID().toString.take(8)}.json"
        val p = new Path(dir, name)
        val mOut = fs.create(p, false)
        try mOut.write(Serialization.write(
          ManifestData(s.inlineFiles, s.inlineDeleteFiles)).getBytes("UTF-8"))
        finally mOut.close()
        newManifests += p
        s.copy(inlineFiles = Seq.empty, inlineDeleteFiles = Seq.empty,
          manifests = s.manifests :+ name)
      }
    }
    val stamped = meta.copy(
      version = nextV,
      lastUpdatedMs = System.currentTimeMillis(),
      snapshots = externalized,
      metadataLog = meta.metadataLog :+ MetadataLogEntry(
        System.currentTimeMillis(),
        f"v$nextV%05d.metadata.json",
        meta.currentSnapshotId)
    )
    val payload = Serialization.write(stamped).getBytes("UTF-8")
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(payload)
    finally out.close()
    val target = metadataFile(tableDir, nextV)
    try {
      commitGuardFor(fs, target).publish(fs, tmp, target, payload)
    } catch {
      case e: CommitLostException =>
        // PROVEN clean loss: the guard only raises CommitLostException when
        // this committer's claim verifiably never landed (a straight CAS
        // loss, or adjudication found another writer's payload in the
        // slot). Nothing references the freshly written manifests, so
        // remove them — conflicts must not leak files into _graft/.
        newManifests.foreach(p => scala.util.Try(fs.delete(p, false)))
        throw e
      case e: Throwable =>
        // Ambiguous/unknown/crash outcome (CommitStateUnknownException,
        // an injected post-claim crash, any transport failure): the
        // service may have durably recorded this claim, and the committed
        // metadata references these manifests BY NAME — deleting them
        // would permanently corrupt a landed commit (the next contender's
        // heal path installs the winning metadata, whose manifest file is
        // gone). Leave them on disk; a genuinely lost commit's manifests
        // live under _graft/ and are collected by rewriteManifests'
        // unreferenced-manifest sweep (remove_orphan_files only walks the
        // data/ dir).
        throw e
    }
    // advisory hint consumed by latestVersion's probe-forward fast path;
    // losing a race here is harmless (a stale hint only means a few extra
    // forward probes, and readers fall back to listing the dir)
    val hintTmp = new Path(dir, s".hint-${java.util.UUID.randomUUID()}")
    val h = fs.create(hintTmp, true)
    try h.write(nextV.toString.getBytes("UTF-8"))
    finally h.close()
    fs.delete(hintFile(tableDir), false)
    if (!fs.rename(hintTmp, hintFile(tableDir)))
      fs.delete(hintTmp, false) // lost the hint race: don't leak the tmp
    // Iceberg's metadata-version retention (opt-in, identical property
    // names): after a successful commit, drop root-metadata files older
    // than the last `previous-versions-max` versions. Snapshots/time
    // travel are unaffected — history lives in the CURRENT metadata; only
    // superseded v*.metadata.json roots go. metadata_log_entries keeps
    // listing them (Iceberg does the same after deletion). Opt-in because
    // a reader pinned to a deleted old root would fail — the same caveat
    // Iceberg documents.
    if (stamped.props.get("write.metadata.delete-after-commit.enabled")
        .exists(_.equalsIgnoreCase("true"))) {
      val keep = math.max(1,
        stamped.props.get("write.metadata.previous-versions-max")
          .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(100))
      val pattern = """v(\d+)\.metadata\.json""".r
      fs.listStatus(dir).foreach { st =>
        st.getPath.getName match {
          case pattern(v) if v.toInt < nextV - keep =>
            fs.delete(st.getPath, false)
          case _ => ()
        }
      }
    }
    attachLoaders(stamped, tableDir, conf)
  }

  def initial(name: String, schemaJson: String, partitionCols: Seq[String],
      props: Map[String, String]): TableMetadata =
    TableMetadata(
      name = name,
      schemaJson = schemaJson,
      partitionCols = partitionCols,
      props = props,
      refs = Map.empty,
      snapshots = Seq.empty,
      version = 0,
      lastUpdatedMs = System.currentTimeMillis(),
      metadataLog = Seq.empty)
}
