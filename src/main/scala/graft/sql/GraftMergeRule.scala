package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, ExprId, Expression, Literal, NamedExpression, OuterReference, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.{bridge, GraftDeleteCommand, GraftDeleteCorrelatedCommand, GraftMergeCommand, GraftMergeIntoCommand, GraftUpdateCommand, GraftUpdateCorrelatedCommand}

import graft.table.catalog.{GraftReadOnlyTable, GraftWritableTable}

/**
 * Post-hoc resolution rule translating a resolved `MERGE INTO` over a graft
 * catalog table (reference IcebergLoadActivityTask.scala:68-76) into
 * [[GraftMergeCommand]] — Spark's own `RewriteMergeIntoTable` skips tables
 * without `SupportsRowLevelOperations`, so the resolved `MergeIntoTable`
 * survives to post-hoc resolution where this rule picks it up before
 * CheckAnalysis would reject it.
 *
 * Supported shape (the upsert MERGE the reference runs, and the common case):
 *
 *  - `ON` is a conjunction of `target.key = <expr over source>` equalities;
 *  - at most one unconditional `WHEN MATCHED THEN UPDATE SET c = <expr over
 *    source>` (or `UPDATE SET *`) — or one unconditional `WHEN MATCHED THEN
 *    DELETE`; no `WHEN MATCHED` clause means matched rows keep their target
 *    values;
 *  - at most one unconditional `WHEN NOT MATCHED THEN INSERT` (star or
 *    explicit columns; unlisted columns insert NULL);
 *  - where a column has both an update and an insert value (or is a key with
 *    an insert value), the two must be the same source expression, because
 *    the CoW merge reads one projected source column per target column.
 *
 * MERGE shapes beyond the simple one — conditional `WHEN MATCHED AND …`,
 * several MATCHED / NOT MATCHED clauses evaluated in order, `WHEN NOT
 * MATCHED BY SOURCE THEN UPDATE/DELETE`, clause values referencing target
 * columns, per-column update/insert expressions that differ — route to the
 * general [[GraftMergeIntoCommand]] ([[graft.table.GraftTable.mergeInto]]'s
 * conditional-cascade CoW rewrite, Iceberg's `RewriteMergeIntoTable`
 * shape; [[graft.table.GraftTable.mergeIntoMoR]] under
 * `write.merge.mode=merge-on-read`). Clause CONDITIONS may carry any
 * subquery — uncorrelated ones re-analyze as self-contained plans, and
 * CORRELATED ones (round 17: `WHEN MATCHED AND EXISTS (SELECT 1 FROM k
 * WHERE k.id = t.id)`) re-bind by exprId onto the merge's joined frame
 * through [[MergeClauseSpec]]/[[CorrelatedCondition]]; clause VALUES may
 * carry SCALAR subqueries, correlated or not (`THEN UPDATE SET x =
 * (SELECT max(v) FROM k WHERE k.id = t.id)`). The correlated row-level
 * surface is therefore uniform across DELETE/UPDATE WHERE, UPDATE SET
 * values, and MERGE clause conditions/values. `WITH SCHEMA EVOLUTION`
 * (round 17) is applied upstream by the analyzer — graft tables declare
 * `AUTOMATIC_SCHEMA_EVOLUTION`, so new source columns / safe type widens
 * alter the table and the clause rewrite here runs against the evolved
 * schema (see [[checkSchemaEvolutionApplied]]).
 *
 * What still raises a clear analysis-time error (each deliberately, never
 * a silent approximation):
 *
 *  - a non-equality `ON` conjunct, an `ON` without at least one key, or
 *    one equating the same target column twice;
 *  - `WITH SCHEMA EVOLUTION` on a path-based target (no catalog to alter);
 *  - subqueries in `ON` keys, and non-scalar subqueries in
 *    clause/assignment VALUES (predicate subqueries are not values);
 *  - clause values referencing columns outside the merge's two relations,
 *    assignments to non-columns, and NOT-MATCHED(-BY-SOURCE) clauses
 *    referencing the wrong side.
 */
object GraftMergeRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Control-flow marker: the merge is well-formed but outside the simple
    * single-unconditional-clause shape — re-plan via the general rewrite. */
  private object NeedsGeneralPath
    extends Exception with scala.util.control.NoStackTrace

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m0: MergeIntoTable if m0.resolved && isGraftTarget(m0) =>
      val m = repairEvolutionRemap(m0)
      try rewrite(m) catch { case NeedsGeneralPath => rewriteGeneral(m) }
    case p => p
  }

  private def isGraftTarget(m: MergeIntoTable): Boolean =
    EliminateSubqueryAliases(m.targetTable) match {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftWritableTable]
      case _ => false
    }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"MERGE INTO graft table: $msg")

  /** `WITH SCHEMA EVOLUTION` (round 17) is applied by the ANALYZER:
    * graft tables declare `AUTOMATIC_SCHEMA_EVOLUTION`, so Spark's
    * ResolveMergeIntoSchemaEvolution routes the source-vs-target schema
    * delta through the catalog's alterTable (AddColumn / safe type widen)
    * and reloads the relation before this post-hoc rule ever sees the
    * plan — here the clause rewrite just runs against the evolved schema.
    * A plan that still NEEDS evolution at this point means the analyzer
    * could not apply it (a path-based relation has no catalog to alter);
    * refuse loudly rather than silently dropping the new columns. */
  private def checkSchemaEvolutionApplied(m: MergeIntoTable): Unit =
    if (m.withSchemaEvolution && m.needSchemaEvolution)
      fail("WITH SCHEMA EVOLUTION needs a catalog table target " +
        "(a path-based relation has no catalog to evolve the schema through)")

  /**
   * Undo the analyzer's POSITIONAL attribute remap after schema evolution
   * (round 17). When ResolveMergeIntoSchemaEvolution swaps the evolved
   * relation in, target references that resolved BEFORE the swap are
   * re-pointed old-output-index -> new-output-index, keeping their old
   * NAME — sound only when the new output is the old output plus appended
   * columns. Graft relations list identity partition columns LAST (the
   * scan-order convention), so an added column lands BEFORE them and the
   * remap mis-binds: an assignment key can surface as name `part` wearing
   * the exprId AND type of the column now at part's old position, and the
   * assignment aligner then casts the value to that wrong type (the
   * silent-corruption case is two same-typed columns swapping values —
   * caught by the evolution fuzz).
   *
   * The damage signature is unambiguous: a target AttributeReference
   * whose NAME disagrees with the name of the output attribute owning its
   * exprId. Names survive the remap, so repair re-binds by name and
   * unwraps the aligner's wrong-type Cast (the rewrite re-casts every
   * value to the true column type anyway). No-op on merges without
   * evolution mangling.
   */
  private def repairEvolutionRemap(m: MergeIntoTable): MergeIntoTable = {
    if (!m.withSchemaEvolution) return m
    val out = EliminateSubqueryAliases(m.targetTable) match {
      case r: DataSourceV2Relation => r.output
      case _ => return m
    }
    val byId = out.map(a => a.exprId -> a).toMap
    val byName = out.map(a => a.name -> a).toMap
    def realOf(a: AttributeReference): Option[Attribute] =
      byId.get(a.exprId).filter(_.name != a.name).flatMap(_ => byName.get(a.name))
    def fixExpr(e: Expression): Expression = e.transform {
      case a: AttributeReference => realOf(a).getOrElse(a)
    }
    def fixAssignment(asn: Assignment): Assignment = asn.key match {
      case k: AttributeReference =>
        realOf(k) match {
          case Some(real) =>
            // the aligner cast the value to the MANGLED key's type; strip
            // exactly that wrapper (a user cast to the TRUE type survives)
            val v = asn.value match {
              case c: org.apache.spark.sql.catalyst.expressions.Cast
                  if c.dataType == k.dataType && c.dataType != real.dataType =>
                c.child
              case other => other
            }
            Assignment(real, fixExpr(v))
          case None => asn.copy(value = fixExpr(asn.value))
        }
      case _ => asn.copy(value = fixExpr(asn.value))
    }
    def fixAction(a: MergeAction): MergeAction = a match {
      case u: UpdateAction => u.copy(condition = u.condition.map(fixExpr),
        assignments = u.assignments.map(fixAssignment))
      case d: DeleteAction => d.copy(condition = d.condition.map(fixExpr))
      case i: InsertAction => i.copy(condition = i.condition.map(fixExpr),
        assignments = i.assignments.map(fixAssignment))
      case other => other
    }
    m.copy(
      mergeCondition = fixExpr(m.mergeCondition),
      matchedActions = m.matchedActions.map(fixAction),
      notMatchedActions = m.notMatchedActions.map(fixAction),
      notMatchedBySourceActions = m.notMatchedBySourceActions.map(fixAction))
  }

  private def rewrite(m: MergeIntoTable): LogicalPlan = {
    val target = EliminateSubqueryAliases(m.targetTable)
      .asInstanceOf[DataSourceV2Relation]
    val location = target.table.asInstanceOf[GraftWritableTable].location
    val targetAttrs = target.outputSet
    val sourceAttrs = m.sourceTable.outputSet

    if (m.notMatchedBySourceActions.nonEmpty) throw NeedsGeneralPath
    checkSchemaEvolutionApplied(m)
    // correlated subqueries anywhere in clauses need the general rewrite's
    // joined-frame exprId binding (round 17)
    val clauseExprs = (m.matchedActions ++ m.notMatchedActions).flatMap {
      case u: UpdateAction => u.condition.toSeq ++ u.assignments.map(_.value)
      case d: DeleteAction => d.condition.toSeq
      case i: InsertAction => i.condition.toSeq ++ i.assignments.map(_.value)
      case _ => Seq.empty
    }
    if (clauseExprs.exists(GraftRowLevelSql.hasCorrelated)) throw NeedsGeneralPath

    // ON: each conjunct pairs one bare target column with one source-only
    // expression — the merge keys
    val keyPairs: Seq[(Attribute, Expression)] =
      splitConjunctivePredicates(m.mergeCondition).map {
        case EqualTo(l: AttributeReference, r) if targetAttrs.contains(l) &&
            r.references.subsetOf(sourceAttrs) => l -> r
        case EqualTo(l, r: AttributeReference) if targetAttrs.contains(r) &&
            l.references.subsetOf(sourceAttrs) => r -> l
        case other => fail(s"ON condition must be a conjunction of " +
          s"target-column = source-expression equalities; got: ${other.sql}")
      }
    if (keyPairs.isEmpty) fail("ON condition must reference at least one key")
    keyPairs.groupBy(_._1.name).collect { case (n, ps) if ps.size > 1 =>
      fail(s"ON condition equates target column $n more than once") }

    // WHEN MATCHED: nothing, one unconditional UPDATE SET, or one
    // unconditional DELETE
    val (updateAssignments: Seq[Assignment], deleteMatched: Boolean) =
      m.matchedActions match {
        case Seq() => (Seq.empty, false)
        case Seq(u: UpdateAction) =>
          if (u.condition.nonEmpty) throw NeedsGeneralPath
          (u.assignments, false)
        case Seq(d: DeleteAction) =>
          if (d.condition.nonEmpty) throw NeedsGeneralPath
          (Seq.empty, true)
        case _ => throw NeedsGeneralPath
      }
    // WHEN NOT MATCHED: nothing, or one unconditional INSERT
    val insertAssignments: Option[Seq[Assignment]] = m.notMatchedActions match {
      case Seq() => None
      case Seq(i: InsertAction) =>
        if (i.condition.nonEmpty) throw NeedsGeneralPath
        Some(i.assignments)
      case _ => throw NeedsGeneralPath
    }

    def toMap(as: Seq[Assignment], clause: String): Map[String, Expression] =
      as.map { a =>
        val name = a.key match {
          case ar: AttributeReference if targetAttrs.contains(ar) => ar.name
          case other => fail(s"$clause assigns to non-column ${other.sql}")
        }
        // a value referencing target columns is fine — in the general
        // rewrite's joined namespace, not in the simple projected source
        if (!a.value.references.subsetOf(sourceAttrs)) throw NeedsGeneralPath
        name -> a.value
      }.toMap

    val keyMap = keyPairs.map { case (a, e) => a.name -> e }.toMap
    val updateMap = toMap(updateAssignments, "UPDATE SET")
    val insertMap = insertAssignments.map(toMap(_, "INSERT")).getOrElse(Map.empty)

    updateMap.keys.foreach { k =>
      if (keyMap.contains(k)) throw NeedsGeneralPath }

    // one projected source column per target column: the merge applies it on
    // insert for every column and on match for the update columns, so where
    // two clauses bind the same column the expressions must agree — where
    // they don't, the general rewrite evaluates each clause's own expression
    def agree(name: String, a: Expression, b: Expression, what: String): Unit =
      if (!a.semanticEquals(b)) throw NeedsGeneralPath
    val projection: Seq[NamedExpression] = target.output.map { attr =>
      val expr = keyMap.get(attr.name) match {
        case Some(k) =>
          insertMap.get(attr.name).foreach(agree(attr.name, k, _, "ON key and INSERT value"))
          k
        case None => (updateMap.get(attr.name), insertMap.get(attr.name)) match {
          case (Some(u), Some(i)) => agree(attr.name, u, i, "UPDATE and INSERT values"); u
          case (Some(u), None)    => u
          case (None, Some(i))    => i
          // column unlisted everywhere: inserts store its CURRENT
          // write-default when declared (analyzed + folded from the
          // relation metadata), NULL otherwise — standard SQL defaults.
          // Only reachable without a MATCHED UPDATE on the column, so the
          // projected value is only ever applied to inserted rows.
          case (None, None) =>
            org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
              .getDefaultValueExprOrNullLit(attr)
        }
      }
      Alias(expr, attr.name)()
    }

    // no WHEN MATCHED clause: updateCols = keys makes the merge keep every
    // matched row unchanged (keys are equal by definition on a match), since
    // GraftTable.merge treats an EMPTY updateCols as update-all-non-keys.
    // A DELETE clause passes no update columns at all.
    val updateCols =
      if (deleteMatched) Seq.empty
      else if (updateAssignments.isEmpty) keyPairs.map(_._1.name)
      else updateMap.keys.toSeq.sorted

    GraftMergeCommand(location, Project(projection, m.sourceTable),
      keys = keyPairs.map(_._1.name), updateCols = updateCols,
      insertNotMatched = insertAssignments.nonEmpty,
      deleteMatched = deleteMatched)
  }

  /** General-shape rewrite: conditional clauses, several clauses in order,
    * NOT MATCHED BY SOURCE, clause values over both sides — translated to
    * [[graft.table.MergeClause]]s under the mergeInto namespace (target
    * columns bare, source columns `__s_`-prefixed) and executed by
    * [[GraftMergeIntoCommand]] as one conditional-cascade CoW rewrite. */
  private def rewriteGeneral(m: MergeIntoTable): LogicalPlan = {
    import graft.table.MergeClause

    val target = EliminateSubqueryAliases(m.targetTable)
      .asInstanceOf[DataSourceV2Relation]
    val location = target.table.asInstanceOf[GraftWritableTable].location
    val targetAttrs = target.outputSet
    val sourceAttrs = m.sourceTable.outputSet

    checkSchemaEvolutionApplied(m)

    // same ON contract as the simple path: a conjunction of
    // target-column = source-expression equalities
    val keyPairs: Seq[(Attribute, Expression)] =
      splitConjunctivePredicates(m.mergeCondition).map {
        case EqualTo(l: AttributeReference, r) if targetAttrs.contains(l) &&
            r.references.subsetOf(sourceAttrs) => l -> r
        case EqualTo(l, r: AttributeReference) if targetAttrs.contains(r) &&
            l.references.subsetOf(sourceAttrs) => r -> l
        case other => fail(s"ON condition must be a conjunction of " +
          s"target-column = source-expression equalities; got: ${other.sql}")
      }
    if (keyPairs.isEmpty) fail("ON condition must reference at least one key")
    keyPairs.groupBy(_._1.name).collect { case (n, ps) if ps.size > 1 =>
      fail(s"ON condition equates target column $n more than once") }

    /** Rebind a clause expression into the mergeInto namespace: target
      * attrs -> bare names, source attrs -> `__s_` names (or bare when the
      * expression is evaluated against the RAW source, i.e. ON keys).
      * Clause CONDITIONS may carry any uncorrelated subquery; assignment
      * VALUES uncorrelated SCALAR subqueries (both re-analyze as
      * self-contained plans inside the rewrite's join/value projections —
      * Spark 4 plans predicate and scalar subqueries under Project); ON
      * keys may carry none. CORRELATED subqueries never reach here — the
      * caller routes them through [[CorrelatedCondition]]. */
    def toCol(e: Expression, what: String, srcPrefix: Boolean = true): Column = {
      GraftRowLevelSql.checkSubqueries(e, what,
        allowUncorrelated =
          what.endsWith("condition") || what.endsWith("value"),
        fail,
        scalarOnly = what.endsWith("value"))
      if (!e.references.subsetOf(targetAttrs ++ sourceAttrs))
        fail(s"$what references columns outside the merge: ${e.sql}")
      bridge.column(e.transform {
        case a: AttributeReference if sourceAttrs.contains(a) =>
          UnresolvedAttribute.quoted(if (srcPrefix) s"__s_${a.name}" else a.name)
        case a: AttributeReference if targetAttrs.contains(a) =>
          UnresolvedAttribute.quoted(a.name)
      })
    }

    /** A clause condition/value as the command's late-bound form: the
      * correlated case (round 17) keeps the analyzer's resolution and
      * re-binds by exprId onto the merge's joined frame at run time;
      * values additionally require SCALAR subqueries (a predicate
      * subquery is not a value). */
    def toBound(e: Expression, what: String,
        value: Boolean): Either[Column, CorrelatedCondition] =
      if (GraftRowLevelSql.hasCorrelated(e)) {
        if (value) GraftRowLevelSql.checkScalarOnly(e, what, fail)
        if (!e.references.subsetOf(targetAttrs ++ sourceAttrs))
          fail(s"$what references columns outside the merge: ${e.sql}")
        Right(CorrelatedCondition(e, target.output,
          srcOutput = m.sourceTable.output))
      } else Left(toCol(e, what))

    def assignName(a: Assignment, clause: String): String = a.key match {
      case ar: AttributeReference if targetAttrs.contains(ar) => ar.name
      case other => fail(s"$clause assigns to non-column ${other.sql}")
    }

    def convert(a: MergeAction, clause: String,
        allowed: Set[String]): MergeClauseSpec = {
      def checkRefs(e: Expression, what: String): Unit = {
        if (allowed == Set("target") && !e.references.subsetOf(targetAttrs))
          fail(s"$clause $what may only reference target columns: ${e.sql}")
        if (allowed == Set("source") && !e.references.subsetOf(sourceAttrs))
          fail(s"$clause $what may only reference source columns: ${e.sql}")
      }
      a match {
        case u: UpdateAction =>
          u.condition.foreach(checkRefs(_, "condition"))
          MergeClauseSpec("update",
            u.condition.map(toBound(_, s"$clause condition", value = false)),
            u.assignments.map { asn =>
              checkRefs(asn.value, "value")
              assignName(asn, clause) ->
                toBound(asn.value, s"$clause value", value = true)
            })
        case d: DeleteAction =>
          d.condition.foreach(checkRefs(_, "condition"))
          MergeClauseSpec("delete",
            d.condition.map(toBound(_, s"$clause condition", value = false)),
            Seq.empty)
        case i: InsertAction =>
          i.condition.foreach(checkRefs(_, "condition"))
          MergeClauseSpec("insert",
            i.condition.map(toBound(_, s"$clause condition", value = false)),
            i.assignments.map { asn =>
              checkRefs(asn.value, "value")
              assignName(asn, clause) ->
                toBound(asn.value, s"$clause value", value = true)
            })
        case other => fail(s"unsupported $clause action: $other")
      }
    }

    val matched = m.matchedActions.map(convert(_, "WHEN MATCHED", Set("both")))
    val notMatched =
      m.notMatchedActions.map(convert(_, "WHEN NOT MATCHED", Set("source")))
    val nmbs = m.notMatchedBySourceActions
      .map(convert(_, "WHEN NOT MATCHED BY SOURCE", Set("target")))

    GraftMergeIntoCommand(location, m.sourceTable,
      keys = keyPairs.map { case (a, e) =>
        a.name -> toCol(e, "ON key", srcPrefix = false) },
      matched = matched, notMatched = notMatched, notMatchedBySource = nmbs)
  }
}

/**
 * Substitutes SQL reads of graft snapshots that carry pending merge-on-read
 * delete files with the delete-applying read (`GraftTable.asOfSnapshot`,
 * which anti-joins the equality-delete files) — a plain file scan would
 * surface logically-deleted rows. Registered AFTER the merge/update rules,
 * so row-level commands are already rewritten to leaf commands and only
 * genuine read relations remain; `DELETE FROM` targets and V2 write
 * targets are explicitly left untouched (their relation identity routes
 * the write), while a write's SOURCE query is still substituted.
 */
object GraftPlanReadRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftReadSubstitution.rewrite(plan) { r =>
      r.table match {
        case g: GraftReadOnlyTable if g.planRead.isDefined =>
          val mr = g.planRead.get
          val df = graft.table.GraftTable
            .load(org.apache.spark.sql.SparkSession.active, mr.location)
            .asOfSnapshot(mr.snapshotId)
          Some(GraftReadSubstitution.bindByName(r, df))
        case _ => None
      }
    }
}

/**
 * Shared scaffolding for the read-substitution rules
 * ([[GraftPlanReadRule]], [[GraftMetadataColumnRule]]): one dispatch that
 * leaves `DELETE FROM` targets and V2 write TARGETS untouched (their
 * relation identity routes the write) while rewriting read relations
 * everywhere else — INCLUDING inside subquery expressions (IN / EXISTS /
 * scalar subqueries), which a plain `transformUp` never descends into. A
 * merge-on-read-deleted row must not resurrect through a subquery, and a
 * metadata-column reference inside one must not survive to physical
 * planning unserved.
 */
private[sql] object GraftReadSubstitution {

  /** Apply `sub` to every read relation of `plan` (subqueries included);
    * `None` leaves a relation untouched. */
  def rewrite(plan: LogicalPlan)(
      sub: DataSourceV2Relation => Option[LogicalPlan]): LogicalPlan = plan match {
    case d: DeleteFromTable => d
    case w: V2WriteCommand  => w.withNewQuery(rewriteReads(w.query)(sub))
    case other              => rewriteReads(other)(sub)
  }

  private def rewriteReads(plan: LogicalPlan)(
      sub: DataSourceV2Relation => Option[LogicalPlan]): LogicalPlan =
    plan.transformUpWithSubqueries {
      case r: DataSourceV2Relation => sub(r).getOrElse(r)
    }

  /** Substitute relation `r` with the analyzed plan of `df`, re-binding
    * `r`'s output attributes by name (exprIds preserved so every
    * downstream reference stays resolved). */
  def bindByName(r: DataSourceV2Relation,
      df: org.apache.spark.sql.DataFrame): LogicalPlan = {
    val inner = org.apache.spark.sql.graft.bridge.analyzedPlan(df)
    val byName = inner.output.map(a => a.name -> a).toMap
    Project(r.output.map(o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)), inner)
  }
}

/**
 * Serves the Iceberg reserved metadata columns (`_file`, `_pos`,
 * `_partition`) in SQL / catalog reads: the DSv2 tables DECLARE them
 * (`SupportsMetadataColumns`, so the analyzer's own `AddMetadataColumns`
 * resolves the references), and this rule substitutes any graft relation
 * whose output actually carries one with the provenance-bearing graft read
 * plan (`GraftTable.metadataAsOf` pinned to the relation's snapshot — MoR
 * deletes applied, on-file row positions preserved). Relations that never
 * reference a metadata column are left for the plain (or plan-read) scan —
 * `SELECT *` stays a pure parquet scan. Runs BEFORE [[GraftPlanReadRule]]
 * so a MoR snapshot with metadata refs resolves here (the metadata read is
 * delete-correct) instead of through the positionless plan-read
 * substitution.
 */
object GraftMetadataColumnRule extends Rule[LogicalPlan] {

  private val MetaNames = Set("_file", "_pos", "_partition",
    "_row_id", "_last_updated_sequence_number")

  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftReadSubstitution.rewrite(plan) { r =>
      // a DATA column that happens to be named _file/_pos/_partition keeps
      // plain-column semantics (Spark itself hides conflicting metadata
      // columns from metadataOutput) — only a genuine metadata attribute,
      // i.e. one NOT in the table's data schema, triggers the substitution
      val dataNames = r.table.schema().fieldNames.toSet
      val wantsMeta = r.output.exists(a => MetaNames(a.name) && !dataNames(a.name))
      if (!wantsMeta) None
      else r.table match {
        case g: GraftReadOnlyTable =>
          g.provenance match {
            case Some(pr) =>
              val df = graft.table.GraftTable
                .load(org.apache.spark.sql.SparkSession.active, pr.location)
                .metadataAsOf(pr.snapshotId.toString)
              Some(GraftReadSubstitution.bindByName(r, df))
            case None => // empty table: no snapshot, no rows, any schema
              Some(LocalRelation(r.output))
          }
        case _ => None
      }
    }
}

/**
 * `UPDATE t SET c = <expr> [WHERE cond]` over a graft catalog table →
 * the file-level copy-on-write [[graft.table.GraftTable.updateWhere]].
 * Assignment values and the condition may reference any column of the
 * updated row; resolved attribute references are rewritten back to by-name
 * lookups so the expressions re-resolve against the CoW rewrite's scan of
 * the affected files.
 */
object GraftUpdateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved && isGraftTarget(u.table) => rewrite(u)
    case p => p
  }

  private def isGraftTarget(table: LogicalPlan): Boolean =
    EliminateSubqueryAliases(table) match {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftWritableTable]
      case _ => false
    }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"UPDATE graft table: $msg")

  private def rewrite(u: UpdateTable): LogicalPlan = {
    val target = EliminateSubqueryAliases(u.table).asInstanceOf[DataSourceV2Relation]
    val targetAttrs = target.outputSet

    def checkRefs(e: Expression, what: String): Unit =
      if (!e.references.subsetOf(targetAttrs))
        fail(s"$what references columns outside the target table: ${e.sql}")

    def toCol(e: Expression, what: String): Column = {
      GraftRowLevelSql.checkSubqueries(e, what,
        // the WHERE condition may carry any uncorrelated subquery; a SET
        // value may carry an uncorrelated SCALAR subquery (SET x =
        // (SELECT max(…))) — it evaluates once per rewritten row in the
        // CoW projection, where scalar subqueries are well-defined
        allowUncorrelated = true,
        fail,
        scalarOnly = what.startsWith("SET value"))
      checkRefs(e, what)
      bridge.column(e.transform {
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      })
    }

    val rawSets: Seq[(String, Expression)] = u.assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference if targetAttrs.contains(ar) => ar.name
        case other => fail(s"SET assigns to non-column ${other.sql}")
      }
      name -> a.value
    }
    rawSets.groupBy(_._1).collect { case (n, as) if as.size > 1 =>
      fail(s"SET assigns $n more than once") }
    val location = target.table.asInstanceOf[GraftWritableTable].location

    val condCorrelated = u.condition.exists(GraftRowLevelSql.hasCorrelated)
    val setsCorrelated = rawSets.exists { case (_, v) =>
      GraftRowLevelSql.hasCorrelated(v) }
    if (condCorrelated || setsCorrelated) {
      // correlated path (rounds 16–17): exprId-preserving re-bind + the
      // position-keyed commit. SET values may carry SCALAR subqueries
      // only — they evaluate in a Project, which cannot host predicate
      // subqueries (IN/EXISTS are Filter-only in Spark's decorrelation)
      rawSets.foreach { case (n, v) =>
        checkRefs(v, s"SET value for $n")
        GraftRowLevelSql.checkScalarOnly(v, s"SET value for $n", fail)
      }
      u.condition.foreach(c => checkRefs(c, "WHERE condition"))
      val cond = u.condition.getOrElse(Literal.TrueLiteral)
      GraftUpdateCorrelatedCommand(location,
        rawSets.map { case (n, v) => n -> CorrelatedCondition(v, target.output) },
        CorrelatedCondition(cond, target.output))
    } else {
      val sets = rawSets.map { case (n, v) => n -> toCol(v, s"SET value for $n") }
      val cond = u.condition.map(toCol(_, "WHERE condition")).getOrElse(lit(true))
      GraftUpdateCommand(location, sets, cond)
    }
  }
}

/** Shared row-level SQL helpers for the UPDATE/DELETE rewrites. */
private[sql] object GraftRowLevelSql {

  /** Enforce the subquery policy on a rewritten expression: uncorrelated
    * subqueries (`IN (SELECT …)`, `EXISTS (SELECT …)` with no outer
    * references) re-analyze cleanly inside the command's own table scan —
    * their plans are self-contained; CORRELATED subqueries reference the
    * outer row through OuterReference attributes that cannot re-resolve
    * against the rewrite's scan, so in the positions that still lack a
    * resolved re-binding path (MERGE clauses, UPDATE SET values) they are
    * refused with a clear error instead of mis-resolving — DELETE/UPDATE
    * WHERE conditions route through [[CorrelatedCondition]] before this
    * check and never see the refusal. */
  def checkSubqueries(e: Expression, what: String, allowUncorrelated: Boolean,
      fail: String => Nothing, scalarOnly: Boolean = false): Unit = {
    val subs = e.collect { case s: SubqueryExpression => s }
    if (subs.isEmpty) return
    if (!allowUncorrelated) fail(s"subquery in $what is not supported")
    subs.foreach { s =>
      if (s.children.nonEmpty || s.isCorrelated)
        fail(s"correlated subquery in $what is not supported " +
          "(it references the outer row); rewrite as MERGE INTO, or move " +
          "the correlation into a DELETE/UPDATE WHERE condition or an " +
          "UPDATE SET scalar value")
      if (scalarOnly &&
          !s.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalarSubquery])
        fail(s"only scalar subqueries are supported in $what " +
          "(IN/EXISTS predicates are Filter-only in Spark and this " +
          "expression is also evaluated in the rewrite's projections); " +
          "pre-compute the set into the source instead")
    }
  }

  /** The correlated-UPDATE value policy (round 17): a SET value evaluates
    * in a Project over the position-bearing scan, and Spark's
    * decorrelation plans predicate subqueries (IN/EXISTS) only under
    * Filter — so every subquery in a SET value, correlated or not, must
    * be a SCALAR subquery. */
  def checkScalarOnly(e: Expression, what: String,
      fail: String => Nothing): Unit =
    e.collect { case s: SubqueryExpression => s }.foreach { s =>
      if (!s.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalarSubquery])
        fail(s"only scalar subqueries are supported in $what " +
          "(IN/EXISTS predicates are Filter-only in Spark); " +
          "pre-compute the set into the source instead")
    }

  /** True when the condition carries a subquery that references the outer
    * row (nested correlation surfaces on the outermost subquery's
    * outer-attribute list during analysis, so a top-level walk suffices). */
  def hasCorrelated(e: Expression): Boolean =
    e.collect { case s: SubqueryExpression
      if s.isCorrelated || s.children.nonEmpty => s }.nonEmpty

  /** A resolved condition re-targeted at a fresh scan: outer attribute
    * references become by-name lookups; self-contained subquery plans
    * ride along untouched. */
  def retarget(e: Expression): Column =
    bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

/**
 * A row-level WHERE condition carrying a CORRELATED subquery (round 16:
 * `DELETE FROM t WHERE EXISTS (SELECT 1 FROM k WHERE k.id = t.id)`, the
 * standard retention-pipeline shape, plus correlated IN / NOT IN / scalar
 * comparisons), captured with the analyzer's resolution intact:
 * `targetOutput` are the DELETE/UPDATE target relation's attributes the
 * condition — and the subquery plans' [[OuterReference]] nodes — are bound
 * to.
 *
 * [[bindTo]] re-binds everything onto a fresh scan of the same table by
 * EXPRESSION-ID substitution, never by name: an inner-plan column that
 * happens to share a name with an outer reference (`EXISTS (SELECT 1 FROM
 * t t2 WHERE t2.parent = t.id)`) can therefore never capture it, which is
 * exactly the mis-resolution the old name-based `retarget` path had to
 * refuse. The re-bound condition sits in a Filter over the scan — the plan
 * position Catalyst's own RewritePredicateSubquery / DecorrelateInnerQuery
 * machinery fully decorrelates into a semi/anti/existence join, so the
 * engine executes a stock join plan, not a per-row subquery.
 */
case class CorrelatedCondition(cond: Expression, targetOutput: Seq[Attribute],
    srcOutput: Seq[Attribute] = Seq.empty) {

  /** The condition as a Column resolved against `df`'s own attributes
    * (matched to `targetOutput` by name; `srcOutput` attributes — a
    * MERGE's source relation (round 17) — match under the mergeInto
    * joined-frame namespace `__s_<name>`). */
  def bindTo(df: DataFrame): Column = {
    val out = bridge.analyzedPlan(df).output
    val byName = out.map(a => a.name -> a).toMap
    val subst: Map[ExprId, Attribute] = (targetOutput.flatMap(a =>
      byName.get(a.name).map(a.exprId -> _)) ++
      srcOutput.flatMap(a =>
        byName.get(s"__s_${a.name}").map(a.exprId -> _))).toMap
    require((targetOutput ++ srcOutput).forall(a => subst.contains(a.exprId)),
      s"correlated rebind: scan is missing column(s) " +
        (targetOutput ++ srcOutput).filterNot(a => subst.contains(a.exprId))
          .map(_.name).mkString(", "))
    def remapPlan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      p.transformDownWithSubqueries {
        case node => node.transformExpressions {
          case OuterReference(a: AttributeReference) if subst.contains(a.exprId) =>
            OuterReference(subst(a.exprId))
        }
      }
    bridge.column(cond.transformDown {
      case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
      case s: SubqueryExpression => s.withNewPlan(remapPlan(s.plan))
    })
  }
}

/**
 * A general-path MERGE clause as captured at analysis time (round 17):
 * the kind and assignment names are static; each condition/value is
 * either an already-retargeted Column (`Left` — the uncorrelated case,
 * by-name rebinding) or a [[CorrelatedCondition]] (`Right`) whose
 * exprId-preserving re-bind resolves against the merge's JOINED frame at
 * run time (target columns bare, source columns `__s_`-prefixed). Spark 4
 * plans correlated predicate AND scalar subqueries under Project, so the
 * bound Columns ride the existing conditional cascade unchanged.
 */
case class MergeClauseSpec(
    kind: String, // update | delete | insert
    cond: Option[Either[Column, CorrelatedCondition]],
    sets: Seq[(String, Either[Column, CorrelatedCondition])]) {

  def bind(joined: DataFrame): graft.table.MergeClause = {
    def c(e: Either[Column, CorrelatedCondition]): Column =
      e.fold(identity, _.bindTo(joined))
    kind match {
      case "update" => graft.table.MergeClause.Update(cond.map(c),
        sets.map { case (n, v) => n -> c(v) })
      case "delete" => graft.table.MergeClause.Delete(cond.map(c))
      case "insert" => graft.table.MergeClause.Insert(cond.map(c),
        sets.map { case (n, v) => n -> c(v) })
    }
  }
}

/**
 * `DELETE FROM t WHERE <cond with subquery>` over a graft catalog table:
 * the pushdown path ([[graft.table.catalog.GraftSparkCatalog]]'s
 * `SupportsDelete`) serves every source-filter-translatable condition; a
 * condition carrying a subquery (`WHERE id IN (SELECT …)` — the standard
 * anti-set delete) can never push, so this rule routes it to the
 * file-level [[graft.table.GraftTable.deleteWhere]] /
 * [[graft.table.GraftTable.deleteWhereMoR]] instead of letting physical
 * planning fail. Uncorrelated subqueries only (see
 * [[GraftRowLevelSql.checkSubqueries]]).
 */
object GraftDeleteRule extends Rule[LogicalPlan] with PredicateHelper {

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"DELETE FROM graft table: $msg")

  /** True when every conjunct survives the SAME translation chain the
    * pushdown path runs (Expression → sources.Filter → Column): those
    * conditions stay on the well-trodden `SupportsDelete` route; anything
    * else — subqueries, non-translatable functions like length(x) > 3 —
    * routes here instead of failing physical planning. */
  private def pushable(cond: Expression): Boolean =
    !SubqueryExpression.hasSubquery(cond) &&
      splitConjunctivePredicates(cond).forall { c =>
        bridge.translateFilter(c)
          .exists(f => GraftWritableTable.filterToColumn(f).isDefined)
      }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable if d.resolved && isGraftTarget(d.table) &&
        !pushable(d.condition) =>
      val target = EliminateSubqueryAliases(d.table)
        .asInstanceOf[DataSourceV2Relation]
      val cond = d.condition
      if (!cond.references.subsetOf(target.outputSet))
        fail(s"WHERE condition references columns outside the target " +
          s"table: ${cond.sql}")
      val location = target.table.asInstanceOf[GraftWritableTable].location
      if (GraftRowLevelSql.hasCorrelated(cond))
        // correlated subquery (EXISTS / IN / scalar over the outer row):
        // keep the analyzer's resolution and re-bind by exprId at run
        // time — the position-keyed commit path (round 16)
        GraftDeleteCorrelatedCommand(location,
          CorrelatedCondition(cond, target.output))
      else {
        GraftRowLevelSql.checkSubqueries(cond, "WHERE condition",
          allowUncorrelated = true, fail)
        GraftDeleteCommand(location, GraftRowLevelSql.retarget(cond))
      }
    case p => p
  }

  private def isGraftTarget(table: LogicalPlan): Boolean =
    EliminateSubqueryAliases(table) match {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftWritableTable]
      case _ => false
    }
}
