package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graft.{GraftAlterViewPropsCommand, GraftAnalyzeTableCommand, GraftCreateBranchCommand, GraftCreateTagCommand, GraftCreateViewCommand, GraftDropBranchCommand, GraftDropTagCommand, GraftDropViewCommand, GraftShowViewsCommand}
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Delegating SQL parser adding the reference's branch DDL
 * (`ALTER TABLE t CREATE OR REPLACE BRANCH b`,
 * reference IcebergLoadActivityTask.scala:78-80) on top of Spark's grammar —
 * the same injection shape Iceberg's SQL extensions use. The two branch
 * statements are matched by a strict regex (table name re-parsed through the
 * delegate's multipart-identifier grammar, so quoting rules stay Spark's);
 * everything else passes through untouched.
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseBranchDdl(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    parseBranchDdl(sqlText).getOrElse(
      delegate.parsePlanWithParameters(sqlText, ctx))

  private def parseBranchDdl(sqlText: String): Option[LogicalPlan] =
    sqlText.trim match {
      case CreateBranch(table, orReplace, ifNotExists, branch) =>
        Some(GraftCreateBranchCommand(
          delegate.parseMultipartIdentifier(table), unquote(branch),
          replace = orReplace != null, ifNotExists = ifNotExists != null))
      case DropBranch(table, ifExists, branch) =>
        Some(GraftDropBranchCommand(
          delegate.parseMultipartIdentifier(table), unquote(branch),
          ifExists = ifExists != null))
      case CreateTag(table, orReplace, ifNotExists, tag) =>
        Some(GraftCreateTagCommand(
          delegate.parseMultipartIdentifier(table), unquote(tag),
          replace = orReplace != null, ifNotExists = ifNotExists != null))
      case DropTag(table, ifExists, tag) =>
        Some(GraftDropTagCommand(
          delegate.parseMultipartIdentifier(table), unquote(tag),
          ifExists = ifExists != null))
      // view DDL routes to the graft ViewCatalog ONLY when the target
      // catalog is a graft catalog (Spark 4.1's own analyzer has no v2
      // view routing yet); everything else — temp views, session-catalog
      // views — delegates untouched
      case CreateView(orReplace, ifNotExists, name, query)
          if graftTarget(name) =>
        Some(GraftCreateViewCommand(
          delegate.parseMultipartIdentifier(name), query.trim,
          replace = orReplace != null, ifNotExists = ifNotExists != null))
      case DropView(ifExists, name) if graftTarget(name) =>
        Some(GraftDropViewCommand(
          delegate.parseMultipartIdentifier(name),
          ifExists = ifExists != null))
      case ShowViews(ns) if graftTarget(ns) =>
        Some(GraftShowViewsCommand(delegate.parseMultipartIdentifier(ns)))
      case AlterViewSet(name, props) if graftTarget(name) =>
        Some(GraftAlterViewPropsCommand(
          delegate.parseMultipartIdentifier(name),
          sets = PropPair.findAllMatchIn(props)
            .map(m => m.group(1) -> m.group(2)).toSeq,
          unsets = Seq.empty))
      case AlterViewUnset(name, props) if graftTarget(name) =>
        Some(GraftAlterViewPropsCommand(
          delegate.parseMultipartIdentifier(name),
          sets = Seq.empty,
          unsets = PropKey.findAllMatchIn(props).map(_.group(1)).toSeq))
      // ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS] — Spark's
      // stats DDL routed to compute_table_stats on graft tables (the
      // session catalog's ANALYZE cannot see v2 tables)
      case AnalyzeTable(name, _) if graftTarget(name) =>
        Some(GraftAnalyzeTableCommand(delegate.parseMultipartIdentifier(name)))
      case _ => None
    }

  private def graftTarget(name: String): Boolean =
    scala.util.Try(delegate.parseMultipartIdentifier(name)).toOption
      .exists(org.apache.spark.sql.graft.GraftViewCommands.targetsGraftCatalog)

  private def unquote(ident: String): String =
    if (ident.startsWith("`")) ident.stripPrefix("`").stripSuffix("`").replace("``", "`")
    else ident

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private val Ident = "((?:[\\w$]+|`(?:[^`]|``)+`)(?:\\.(?:[\\w$]+|`(?:[^`]|``)+`))*)"
  private val Branch = "([\\w$]+|`(?:[^`]|``)+`)"

  private val CreateBranch =
    ("(?is)^ALTER\\s+TABLE\\s+" + Ident +
      "\\s+CREATE\\s+(OR\\s+REPLACE\\s+)?BRANCH\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      Branch + "\\s*;?$").r
  private val DropBranch =
    ("(?is)^ALTER\\s+TABLE\\s+" + Ident +
      "\\s+DROP\\s+BRANCH\\s+(IF\\s+EXISTS\\s+)?" + Branch + "\\s*;?$").r
  private val CreateTag =
    ("(?is)^ALTER\\s+TABLE\\s+" + Ident +
      "\\s+CREATE\\s+(OR\\s+REPLACE\\s+)?TAG\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      Branch + "\\s*;?$").r
  private val DropTag =
    ("(?is)^ALTER\\s+TABLE\\s+" + Ident +
      "\\s+DROP\\s+TAG\\s+(IF\\s+EXISTS\\s+)?" + Branch + "\\s*;?$").r

  // view DDL (round 14): intercepted only for graft-catalog targets.
  // The AS body is captured raw and re-parsed by the delegate at run
  // time, so any SELECT the engine supports is a valid view body.
  private val CreateView =
    ("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      Ident + "\\s+AS\\s+(.+?)\\s*;?$").r
  private val DropView =
    ("(?is)^DROP\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?" + Ident + "\\s*;?$").r
  private val ShowViews =
    ("(?is)^SHOW\\s+VIEWS\\s+(?:IN|FROM)\\s+" + Ident + "\\s*;?$").r
  private val AlterViewSet =
    ("(?is)^ALTER\\s+VIEW\\s+" + Ident +
      "\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?$").r
  private val AlterViewUnset =
    ("(?is)^ALTER\\s+VIEW\\s+" + Ident +
      "\\s+UNSET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?$").r
  private val PropPair = "'([^']*)'\\s*=\\s*'([^']*)'".r
  private val PropKey = "'([^']*)'".r
  private val AnalyzeTable =
    ("(?is)^ANALYZE\\s+TABLE\\s+" + Ident +
      "\\s+COMPUTE\\s+STATISTICS(\\s+FOR\\s+ALL\\s+COLUMNS)?\\s*;?$").r
}
