package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graft.{GraftCreateBranchCommand, GraftDropBranchCommand, GraftCreateTagCommand, GraftDropTagCommand}
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
      case _ => None
    }

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
}
