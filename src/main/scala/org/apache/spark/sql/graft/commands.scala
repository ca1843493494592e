package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.table.GraftTable
import graft.table.catalog.GraftSparkCatalog

/**
 * V1 runnable commands backing graft's SQL write extensions (registered by
 * [[graft.GraftSparkExtensions]]). Each `run` is one commit-protocol
 * operation on the resolved [[GraftTable]]; the distributed work (the CoW
 * rewrite inside MERGE) goes through the normal DataFrame write path. Lives
 * under the spark.sql namespace for the same `private[sql]` access the
 * [[bridge]] uses (`LeafRunnableCommand`, `Dataset.ofRows`,
 * `sessionState.catalogManager`).
 */
object GraftCommands {

  /** Resolve a SQL multipart name (`cat.ns….table` or `ns….table` under the
    * current catalog) to its graft table location — the same minimal
    * catalog-and-identifier split Spark's own `LookupCatalog` applies. */
  def resolveLocation(session: SparkSession, nameParts: Seq[String]): String = {
    val cm = session.asInstanceOf[ClassicSession].sessionState.catalogManager
    val (catalog, parts) =
      if (nameParts.length > 1 && cm.isCatalogRegistered(nameParts.head))
        (cm.catalog(nameParts.head), nameParts.tail)
      else (cm.currentCatalog, nameParts)
    catalog match {
      case g: GraftSparkCatalog =>
        g.tableLocation(Identifier.of(parts.init.toArray, parts.last))
      case other => throw new UnsupportedOperationException(
        s"${other.name()} is not a graft catalog: branch DDL and MERGE INTO " +
          "extensions apply to graft tables only")
    }
  }
}

/** `MERGE INTO` rewritten by [[graft.sql.GraftMergeRule]]: `source` is the
  * source plan already projected to the target's column names (key columns
  * from the ON clause, updated columns from the SET clause, insert columns
  * from the INSERT clause). Runs the file-level copy-on-write
  * [[GraftTable.merge]] — only files holding matched keys are rewritten. */
case class GraftMergeCommand(location: String, source: LogicalPlan,
    keys: Seq[String], updateCols: Seq[String],
    insertNotMatched: Boolean,
    deleteMatched: Boolean = false) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val df = Dataset.ofRows(session.asInstanceOf[ClassicSession], source)
    val t = GraftTable.load(session, location)
    // write.merge.mode picks the commit shape, like Iceberg (the reference
    // sets merge-on-read, IcebergLoadActivityTask.scala:31)
    val mor = t.properties.get("write.merge.mode").contains("merge-on-read")
    if (deleteMatched) {
      if (mor) throw new UnsupportedOperationException(
        "MERGE … WHEN MATCHED THEN DELETE is copy-on-write only; unset " +
          "write.merge.mode=merge-on-read (or run the CoW merge via the API)")
      t.merge(df, keys, updateCols, insertNotMatched, deleteMatched = true)
    } else if (mor)
      t.mergeMoR(df, keys, updateCols, insertNotMatched)
    else t.merge(df, keys, updateCols, insertNotMatched)
    Seq.empty
  }
}

/** `UPDATE t SET … [WHERE …]` rewritten by [[graft.sql.GraftUpdateRule]]:
  * runs the file-level copy-on-write [[GraftTable.updateWhere]] — only files
  * containing rows where the condition is TRUE are rewritten. */
case class GraftUpdateCommand(location: String,
    sets: Seq[(String, org.apache.spark.sql.Column)],
    cond: org.apache.spark.sql.Column) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, location)
    // write.update.mode=merge-on-read → delete-and-insert with full-row
    // equality keys (duplicate identical rows all update, count preserved)
    if (t.properties.get("write.update.mode").contains("merge-on-read"))
      t.updateWhereMoR(cond, sets, t.schema.fieldNames.toSeq)
    else t.updateWhere(cond, sets)
    Seq.empty
  }
}

/** `ALTER TABLE t CREATE [OR REPLACE] BRANCH [IF NOT EXISTS] b`
  * (reference IcebergLoadActivityTask.scala:78-80). */
case class GraftCreateBranchCommand(nameParts: Seq[String], branch: String,
    replace: Boolean, ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, GraftCommands.resolveLocation(session, nameParts))
    val exists = t.meta.refs.contains(branch)
    if (exists && !replace) {
      if (!ifNotExists) throw new IllegalArgumentException(
        s"Branch $branch already exists on ${nameParts.mkString(".")} " +
          "(use CREATE OR REPLACE BRANCH to move it)")
    } else t.createOrReplaceBranch(branch)
    Seq.empty
  }
}

/** `ALTER TABLE t CREATE [OR REPLACE] TAG [IF NOT EXISTS] name`: pin the
  * current head as an immutable ref (Iceberg tag). */
case class GraftCreateTagCommand(nameParts: Seq[String], tag: String,
    replace: Boolean, ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, GraftCommands.resolveLocation(session, nameParts))
    if (t.meta.tags.contains(tag) && !replace) {
      if (!ifNotExists) throw new IllegalArgumentException(
        s"Tag $tag already exists on ${nameParts.mkString(".")} " +
          "(use CREATE OR REPLACE TAG to move it)")
    } else t.createTag(tag, replace)
    Seq.empty
  }
}

/** `ALTER TABLE t DROP TAG [IF EXISTS] name`. */
case class GraftDropTagCommand(nameParts: Seq[String], tag: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, GraftCommands.resolveLocation(session, nameParts))
    if (t.meta.tags.contains(tag)) t.dropTag(tag)
    else if (!ifExists) throw new IllegalArgumentException(
      s"Tag $tag does not exist on ${nameParts.mkString(".")}")
    Seq.empty
  }
}

/** `ALTER TABLE t DROP BRANCH [IF EXISTS] b`. */
case class GraftDropBranchCommand(nameParts: Seq[String], branch: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, GraftCommands.resolveLocation(session, nameParts))
    if (t.meta.refs.contains(branch)) t.dropBranch(branch)
    else if (!ifExists) throw new IllegalArgumentException(
      s"Branch $branch does not exist on ${nameParts.mkString(".")}")
    Seq.empty
  }
}
