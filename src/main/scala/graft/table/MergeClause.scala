package graft.table

import org.apache.spark.sql.Column

/**
 * One `WHEN` clause of a general `MERGE INTO` (the full Iceberg /
 * Spark-4 `MergeIntoTable` clause surface: conditional clauses, several
 * clauses evaluated in order, `WHEN NOT MATCHED BY SOURCE`).
 *
 * Column-reference contract for `condition` / assignment values, mirroring
 * the namespace [[GraftTable.mergeInto]] evaluates them in:
 *
 *  - target columns by their bare name (`col("amount")`);
 *  - source columns through [[MergeClause.src]] (`src("amount")`), which
 *    resolves to the source side of the merge join regardless of name
 *    collisions with the target.
 *
 * `WHEN MATCHED` clauses may reference both sides; `WHEN NOT MATCHED`
 * (insert) clauses only the source; `WHEN NOT MATCHED BY SOURCE` only the
 * target — the same scoping rules SQL MERGE imposes, enforced by the SQL
 * rule at analysis time and left to the caller on the direct API.
 */
sealed trait MergeClause { def condition: Option[Column] }

object MergeClause {

  /** `WHEN [NOT] MATCHED [BY SOURCE] [AND condition] THEN UPDATE SET …`.
    * Unassigned columns keep their target values. */
  case class Update(condition: Option[Column],
      set: Seq[(String, Column)]) extends MergeClause

  /** `WHEN MATCHED [BY SOURCE] [AND condition] THEN DELETE`. */
  case class Delete(condition: Option[Column]) extends MergeClause

  /** `WHEN NOT MATCHED [AND condition] THEN INSERT (…) VALUES (…)`.
    * Unassigned columns insert NULL. */
  case class Insert(condition: Option[Column],
      values: Seq[(String, Column)]) extends MergeClause

  /** Reference a SOURCE column inside a clause condition or value. */
  def src(name: String): Column =
    org.apache.spark.sql.functions.col(s"__s_$name")
}
