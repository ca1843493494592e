package graft.table.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/**
 * Versioned SQL-view metadata persisted in the graft catalog — the
 * Iceberg-REST-views capability (Iceberg view spec: a view is a log of
 * immutable versions, each recording the SQL, the name-resolution
 * context it was authored in, and the expected schema; the current
 * version is the log's tail). A view slot is a warehouse directory
 * holding ONE `graft.view.json`; every CREATE OR REPLACE / ALTER
 * appends a [[GraftViewVersion]] and rewrites the file via tmp + atomic
 * rename, so readers only ever see a complete version log and the full
 * history stays inspectable.
 *
 * Views are metadata-sized by definition (SQL text + schema), so the
 * whole log rides in one file however many versions accumulate — the
 * 100 TB concern is the referenced TABLES, which resolve through the
 * normal catalog path at query time (a view adds zero scan overhead:
 * Spark substitutes the parsed SQL into the plan and Catalyst optimizes
 * straight through it, pushdown and pruning included).
 */
final case class GraftViewVersion(
    version: Int,
    timestampMs: Long,
    sql: String,
    currentCatalog: String,
    currentNamespace: Seq[String],
    schemaJson: String,
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    columnComments: Seq[String], // empty string = no comment (JSON-safe)
    properties: Map[String, String])

final case class GraftViewMeta(
    name: String,
    versions: Seq[GraftViewVersion]) {
  def current: GraftViewVersion = versions.last
}

object GraftViews {
  private implicit val formats: Formats = DefaultFormats
  val FileName = "graft.view.json"

  def exists(slot: String, conf: Configuration): Boolean = {
    val p = new Path(slot, FileName)
    val fs = p.getFileSystem(conf)
    fs.exists(p) || recoverAside(slot, fs)
  }

  /** Crash recovery: a [[save]] interrupted between its aside and install
    * renames leaves the newest complete log under an `.view-old-*` name —
    * promote it back to the live slot. Returns whether a live file exists
    * after the attempt. */
  private def recoverAside(slot: String,
      fs: org.apache.hadoop.fs.FileSystem): Boolean = {
    val dir = new Path(slot)
    val target = new Path(dir, FileName)
    if (!fs.exists(dir)) return false
    val asides = fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith(AsidePrefix))
      .sortBy(_.getPath.getName)
    if (asides.isEmpty) return false
    // newest aside becomes live; older ones are superseded debris
    if (!fs.rename(asides.last.getPath, target)) return fs.exists(target)
    asides.init.foreach(a => fs.delete(a.getPath, false))
    true
  }

  def load(slot: String, conf: Configuration): Option[GraftViewMeta] = {
    val p = new Path(slot, FileName)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p) && !recoverAside(slot, fs)) None
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      Some(Serialization.read[GraftViewMeta](
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    }
  }

  private val AsidePrefix = ".view-old-"

  /** Install: full version log to a fresh tmp, then swap into the slot
    * WITHOUT a delete-first window — rename-over where the FS supports
    * it; otherwise the live file renames ASIDE, the tmp renames in, the
    * aside deletes. Every intermediate state keeps a complete log on
    * disk (live, aside, or tmp), and [[load]] recovers an aside file
    * left by a crash mid-swap, so no step can permanently lose the view.
    * Concurrent WRITERS remain last-write-wins: view DDL is rare
    * metadata work and carries no data, so it does not ride the table
    * commit CAS; a REST/JDBC catalog deployment would CAS view metadata
    * server-side exactly like Iceberg REST views. */
  def save(slot: String, meta: GraftViewMeta, conf: Configuration): Unit = {
    val dir = new Path(slot)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".view-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(Serialization.write(meta)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(dir, FileName)
    if (!fs.rename(tmp, target)) {
      // the FS refuses rename-over (the same semantics the table commit
      // CAS relies on): stage the live file aside, install, clean up
      val aside = new Path(dir,
        s"$AsidePrefix${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}.json")
      val hadOld = fs.exists(target)
      if (hadOld && !fs.rename(target, aside))
        throw new IllegalStateException(
          s"Failed to stage current view metadata aside at $target")
      if (!fs.rename(tmp, target)) {
        if (hadOld) fs.rename(aside, target) // restore; install failed
        throw new IllegalStateException(
          s"Failed to install view metadata at $target")
      }
      if (hadOld) fs.delete(aside, false)
    }
  }

  def drop(slot: String, conf: Configuration): Boolean = {
    val p = new Path(slot, FileName)
    val fs = p.getFileSystem(conf)
    // a crashed save may have left the newest complete log under an aside
    // name with no live file — that still counts as "the view exists"
    // (exists()/load() would recover it), so DROP must report true and,
    // critically, remove EVERY aside: leftover aside debris would let a
    // later recoverAside() resurrect the dropped view from a stale log
    val asides =
      if (fs.exists(new Path(slot))) fs.listStatus(new Path(slot))
        .filter(_.getPath.getName.startsWith(AsidePrefix)).toSeq
      else Seq.empty
    val existed = fs.exists(p) || asides.nonEmpty
    if (existed) {
      if (fs.exists(p)) fs.delete(p, false)
      asides.foreach(a => fs.delete(a.getPath, false))
      // remove the slot dir if the view file was its only content
      val dir = new Path(slot)
      if (fs.exists(dir) && fs.listStatus(dir).isEmpty) fs.delete(dir, false)
    }
    existed
  }
}
