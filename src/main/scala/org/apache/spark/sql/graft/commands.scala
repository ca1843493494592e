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
      if (mor) {
        // the unconditional WHEN MATCHED THEN DELETE shape under
        // merge-on-read routes through the general clause-cascade MoR
        // rewrite (it previously errored here, while the semantically
        // identical `WHEN MATCHED AND true THEN DELETE` already took
        // the general path and succeeded — behavior must not depend on
        // that syntactic detail)
        // clause namespace contract (GraftMergeRule.toCol): ON keys are
        // bare source names, clause values reference the __s_ prefix
        val srcCols = df.columns.toSet
        t.mergeIntoMoR(df,
          keys.map(k => k -> org.apache.spark.sql.functions.col(k)),
          matched = Seq(graft.table.MergeClause.Delete(None)),
          notMatched = if (insertNotMatched)
            Seq(graft.table.MergeClause.Insert(None,
              t.schema.fieldNames.toSeq.filter(srcCols.contains)
                .map(c => c -> org.apache.spark.sql.functions.col(s"__s_$c"))))
          else Seq.empty)
      } else t.merge(df, keys, updateCols, insertNotMatched, deleteMatched = true)
    } else if (mor)
      t.mergeMoR(df, keys, updateCols, insertNotMatched)
    else t.merge(df, keys, updateCols, insertNotMatched)
    Seq.empty
  }
}

/** General-shape `MERGE INTO` rewritten by [[graft.sql.GraftMergeRule]]
  * (conditional clauses, several clauses in order, NOT MATCHED BY SOURCE):
  * runs the conditional-cascade rewrite in the commit shape
  * `write.merge.mode` selects — the file-level copy-on-write
  * [[GraftTable.mergeInto]] by default, the O(changed-rows)
  * equality-delete-plus-append [[GraftTable.mergeIntoMoR]] under
  * merge-on-read (the reference's own setting). */
case class GraftMergeIntoCommand(location: String, source: LogicalPlan,
    keys: Seq[(String, org.apache.spark.sql.Column)],
    matched: Seq[graft.sql.MergeClauseSpec],
    notMatched: Seq[graft.sql.MergeClauseSpec],
    notMatchedBySource: Seq[graft.sql.MergeClauseSpec])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val df = Dataset.ofRows(session.asInstanceOf[ClassicSession], source)
    val t = GraftTable.load(session, location)
    // clauses bind LATE against the merge's joined frame (round 17):
    // correlated clause conditions/values re-bind by exprId there
    def thunks(specs: Seq[graft.sql.MergeClauseSpec]) =
      specs.map(spec => (j: org.apache.spark.sql.DataFrame) => spec.bind(j))
    if (t.properties.get("write.merge.mode").contains("merge-on-read"))
      t.mergeIntoMoRBound(df, keys, thunks(matched), thunks(notMatched),
        thunks(notMatchedBySource))
    else t.mergeIntoBound(df, keys, thunks(matched), thunks(notMatched),
      thunks(notMatchedBySource))
    Seq.empty
  }
}

/** `DELETE FROM t WHERE <cond with an uncorrelated subquery>` rewritten by
  * [[graft.sql.GraftDeleteRule]] (pushable conditions go through the
  * `SupportsDelete` pushdown path instead): the commit shape follows
  * `write.delete.mode`, like the pushdown path does. */
case class GraftDeleteCommand(location: String,
    cond: org.apache.spark.sql.Column) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, location)
    if (t.properties.get("write.delete.mode").contains("merge-on-read"))
      t.deleteWhereMoR(cond, t.schema.fieldNames.toSeq)
    else t.deleteWhere(cond)
    Seq.empty
  }
}

/** `DELETE FROM t WHERE <correlated subquery>` (round 16) rewritten by
  * [[graft.sql.GraftDeleteRule]]: the condition references the outer row
  * inside its subquery (`EXISTS (SELECT … WHERE k.id = t.id)`, correlated
  * IN / NOT IN / scalar comparisons — the standard retention-pipeline
  * shapes). One Filter evaluation over a position-bearing scan (Catalyst
  * decorrelates it into a stock semi/anti join), then the commit keys off
  * the matched (file, row-index) identities: a CoW rewrite anti-joined on
  * them, or — under `write.delete.mode=merge-on-read` — a position-delete
  * commit (deletion vectors when enabled), which deletes exactly the
  * matched rows even among full duplicates. */
case class GraftDeleteCorrelatedCommand(location: String,
    cond: graft.sql.CorrelatedCondition) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, location)
    t.deleteWhereCorrelated(cond.bindTo,
      mor = t.properties.get("write.delete.mode").contains("merge-on-read"))
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE …` where the WHERE and/or a SET value carries a
  * CORRELATED subquery (rounds 16–17), rewritten by
  * [[graft.sql.GraftUpdateRule]]: same position-keyed shape as
  * [[GraftDeleteCorrelatedCommand]] — the WHERE evaluates once as a
  * decorrelated Filter, SET values (including correlated SCALAR
  * subqueries, `SET x = (SELECT max(v) FROM k WHERE k.id = t.id)`)
  * evaluate once per matched row in the same Project, and the rewrite
  * applies the pre-computed values on the matched row identities
  * (`write.update.mode=merge-on-read` commits position deletes plus the
  * updated rows instead of a file rewrite). Each captured expression
  * re-binds by exprId ([[graft.sql.CorrelatedCondition.bindTo]]), never
  * by name. */
case class GraftUpdateCorrelatedCommand(location: String,
    sets: Seq[(String, graft.sql.CorrelatedCondition)],
    cond: graft.sql.CorrelatedCondition) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session, location)
    t.updateWhereCorrelated(cond.bindTo,
      sets.map { case (n, v) => n -> (v.bindTo _) },
      mor = t.properties.get("write.update.mode").contains("merge-on-read"))
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

// --- SQL views on graft catalogs (round 14) ---------------------------
// Spark 4.1 ships the DSv2 ViewCatalog INTERFACE but its analyzer does
// not yet route view DDL/resolution to plugins (`CREATE VIEW cat.ns.v`
// raises MISSING_CATALOG_ABILITY.VIEWS) — so the graft extensions wire
// the SQL surface themselves: the parser intercepts view DDL whose
// target is a graft catalog (everything else delegates untouched), and
// GraftViewRule expands stored view SQL at analysis time. The catalog
// methods themselves implement the standard ViewCatalog contract, so
// when Spark's analyzer learns to consume it these commands retire.

object GraftViewCommands {
  /** Resolve a SQL multipart name to (graft catalog plugin, identifier);
    * None when the target catalog is not a [[GraftSparkCatalog]]. */
  def resolve(session: SparkSession, nameParts: Seq[String])
      : Option[(GraftSparkCatalog, Identifier)] = {
    val cm = session.asInstanceOf[ClassicSession].sessionState.catalogManager
    val (catalog, parts) =
      if (nameParts.length > 1 && cm.isCatalogRegistered(nameParts.head))
        (cm.catalog(nameParts.head), nameParts.tail)
      else (cm.currentCatalog, nameParts)
    catalog match {
      case g: GraftSparkCatalog if parts.nonEmpty =>
        Some((g, Identifier.of(parts.init.toArray, parts.last)))
      case _ => None
    }
  }

  /** Parse-time gate for the parser's view-DDL intercepts. */
  def targetsGraftCatalog(nameParts: Seq[String]): Boolean =
    try resolve(SparkSession.active, nameParts).isDefined
    catch { case _: Throwable => false }

  /** Stored current-version SQL when `nameParts` names a graft view. */
  def lookupSql(session: SparkSession, nameParts: Seq[String]): Option[String] =
    lookupView(session, nameParts).map(_._1)

  /** Stored (SQL, authoring catalog, authoring namespace) when `nameParts`
    * names a graft view — the name-resolution context the Iceberg view
    * spec says the body must expand under. */
  def lookupView(session: SparkSession, nameParts: Seq[String])
      : Option[(String, String, Seq[String])] =
    try resolve(session, nameParts).flatMap { case (cat, ident) =>
      if (cat.viewExists(ident)) {
        val v = cat.loadView(ident)
        Some((v.query(), v.currentCatalog(), v.currentNamespace().toSeq))
      } else None
    } catch { case _: Throwable => None }
}

/** `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] cat.ns.v AS <query>` on a
  * graft catalog: persists a new version in the slot's view log. */
case class GraftCreateViewCommand(nameParts: Seq[String], viewSql: String,
    replace: Boolean, ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViewCommands.resolve(session, nameParts).getOrElse(
      throw new UnsupportedOperationException(
        s"${nameParts.mkString(".")} is not in a graft catalog"))
    if (!replace && ifNotExists && cat.viewExists(ident)) return Seq.empty
    val classic = session.asInstanceOf[ClassicSession]
    // analyze the view body NOW: a CREATE must fail on a broken query,
    // and the stored schema is the authored-time contract
    val parsed = classic.sessionState.sqlParser.parsePlan(viewSql)
    // direct self-reference guard: `CREATE OR REPLACE VIEW v AS … FROM v`
    // analyzes fine against the OLD stored version but the stored SQL
    // would then expand into itself forever on read (indirect cycles are
    // bounded by the analyzer's max-iterations failure; the direct case
    // deserves a clear error at DDL time, like Spark's own views)
    parsed.foreach {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if GraftViewCommands.resolve(session, u.multipartIdentifier)
            .exists(r => (r._1 eq cat) && r._2 == ident) =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "RECURSIVE_VIEW",
          messageParameters = Map(
            "viewIdent" -> ident.toString,
            "newPath" -> ident.toString))
      // a persisted view outlives the session; a body referencing a
      // session-local temp view would analyze here but break (or resolve
      // to the WRONG relation after the stored-context rewrite) on read —
      // reject at DDL time like Spark's own persisted views
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if classic.sessionState.catalog.isTempView(u.multipartIdentifier) =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INVALID_TEMP_OBJ_REFERENCE",
          messageParameters = Map(
            "obj" -> "VIEW", "objName" -> ident.toString,
            "tempObj" -> "VIEW",
            "tempObjName" -> u.multipartIdentifier.mkString(".")))
      case _ =>
    }
    val schema = Dataset.ofRows(classic, parsed).schema
    val cm = classic.sessionState.catalogManager
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, viewSql, cm.currentCatalog.name(), cm.currentNamespace,
      schema, schema.fieldNames, Array.empty[String], Array.empty[String],
      java.util.Collections.emptyMap[String, String]())
    if (replace) cat.replaceView(info, orCreate = true)
    else cat.createView(info)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] cat.ns.v` on a graft catalog. */
case class GraftDropViewCommand(nameParts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViewCommands.resolve(session, nameParts).getOrElse(
      throw new UnsupportedOperationException(
        s"${nameParts.mkString(".")} is not in a graft catalog"))
    if (!cat.dropView(ident) && !ifExists)
      throw new IllegalArgumentException(
        s"View ${nameParts.mkString(".")} does not exist")
    Seq.empty
  }
}

/** `SHOW VIEWS IN cat.ns` — Spark's native output shape
  * (namespace, viewName, isTemporary). */
case class GraftShowViewsCommand(nsParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference("namespace",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference("viewName",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference("isTemporary",
      org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val cm = session.asInstanceOf[ClassicSession].sessionState.catalogManager
    val (catalog, ns) =
      if (nsParts.nonEmpty && cm.isCatalogRegistered(nsParts.head))
        (cm.catalog(nsParts.head), nsParts.tail)
      else (cm.currentCatalog, nsParts)
    catalog match {
      case g: GraftSparkCatalog =>
        g.listViews(ns: _*).toSeq.map(id =>
          Row(id.namespace().mkString("."), id.name(), false))
      case other => throw new UnsupportedOperationException(
        s"SHOW VIEWS extension applies to graft catalogs only, got ${other.name()}")
    }
  }
}

/** `ALTER VIEW cat.ns.v SET/UNSET TBLPROPERTIES (…)` — appends a version
  * with the updated property map. */
case class GraftAlterViewPropsCommand(nameParts: Seq[String],
    sets: Seq[(String, String)], unsets: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val (cat, ident) = GraftViewCommands.resolve(session, nameParts).getOrElse(
      throw new UnsupportedOperationException(
        s"${nameParts.mkString(".")} is not in a graft catalog"))
    val changes: Seq[ViewChange] =
      sets.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unsets.map(ViewChange.removeProperty)
    cat.alterView(ident, changes: _*)
    Seq.empty
  }
}

/** Analysis-time view expansion: an [[UnresolvedRelation]] naming a graft
  * view is substituted with its stored current-version SQL (parsed by the
  * session parser and wrapped in a SubqueryAlias), exactly how Spark
  * expands session-catalog views — Catalyst then optimizes straight
  * through, so filters/pruning reach the underlying graft scans and a
  * VERSION AS OF inside the view body time-travels normally.
  *
  * Name-resolution context (Iceberg view spec): the body expands under
  * the AUTHORING session's catalog + namespace, which every
  * [[GraftViewVersion]] records — un-catalog-qualified relations in the
  * stored SQL are rewritten against that context before substitution, so
  * a reader in a different current catalog/namespace resolves the same
  * tables the author did. Names bound by the body's own CTEs are left
  * untouched (they shadow table resolution). */
case class GraftViewRule(session: ClassicSession)
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.{SubqueryAlias, UnresolvedWith}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        GraftViewCommands.lookupView(session, u.multipartIdentifier) match {
          case Some((sql, cat, ns)) =>
            val parsed = session.sessionState.sqlParser.parsePlan(sql)
            SubqueryAlias(u.multipartIdentifier.last,
              qualifyRelations(parsed, cat, ns))
          case None => u
        }
    }

  /** Rewrite relations that carry no catalog qualifier against the view's
    * stored (catalog, namespace): single-part names gain both, multi-part
    * names whose head is not a registered catalog gain the catalog.
    *
    * CTE names shadow table resolution LEXICALLY, not plan-globally: a
    * WITH inside one subquery must not hide a real table of the same name
    * referenced in a sibling scope (a global collect would skip the outer
    * reference and leave it to resolve in the READER's context — the
    * exact wrong-table bug this rule exists to prevent). The walk carries
    * the in-scope name set: each CTE definition sees the names defined
    * before it in the same WITH plus the outer scope; the WITH's main
    * query sees all of them. Matching uses the session resolver (CTE
    * names are case-insensitive under the default conf). */
  private def qualifyRelations(parsed: LogicalPlan, cat: String,
      ns: Seq[String]): LogicalPlan = {
    val cm = session.sessionState.catalogManager
    val resolver = session.sessionState.conf.resolver
    def fix(u: UnresolvedRelation, scope: Seq[String]): UnresolvedRelation =
      u.multipartIdentifier match {
        case Seq(single) if scope.exists(resolver(_, single)) => u
        case Seq(single) =>
          u.copy(multipartIdentifier = (cat +: ns) :+ single)
        case parts if !cm.isCatalogRegistered(parts.head) =>
          u.copy(multipartIdentifier = cat +: parts)
        case _ => u
      }
    def walk(plan: LogicalPlan, scope: Seq[String]): LogicalPlan = {
      val walked = plan match {
        case w: UnresolvedWith =>
          var seen = scope
          val rels = w.cteRelations.map { case (name, rel, maxRec) =>
            // the definition may reference itself under allowRecursion;
            // including its own name unconditionally is safe either way
            // (a self-name can only mean the CTE, never an outer table)
            val r = walk(rel, name +: seen)
              .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias]
            seen = name +: seen
            (name, r, maxRec)
          }
          w.copy(child = walk(w.child, seen), cteRelations = rels)
        case u: UnresolvedRelation => fix(u, scope)
        case other =>
          other.withNewChildren(other.children.map(walk(_, scope)))
      }
      walked.transformExpressions {
        case se: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          se.withNewPlan(walk(se.plan, scope))
      }
    }
    walk(parsed, Seq.empty)
  }
}

/** `ANALYZE TABLE cat.ns.t COMPUTE STATISTICS [FOR ALL COLUMNS]` on a
  * graft table: runs [[GraftTable.computeTableStats]] — per-column
  * HLL-sketch NDV + null counts pinned to the current snapshot, served
  * through the scan's Statistics surface for CBO. */
case class GraftAnalyzeTableCommand(nameParts: Seq[String])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.load(session,
      GraftCommands.resolveLocation(session, nameParts))
    t.computeTableStats()
    Seq.empty
  }
}
