package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.sql.{GraftMergeRule, GraftMetadataColumnRule, GraftPlanReadRule, GraftSqlParser, GraftUpdateRule}

/**
 * Session extensions completing the reference's SQL surface on graft
 * catalogs (reference IcebergSupport.scala:20 configures Iceberg's
 * equivalent):
 *
 * {{{
 * spark.sql.extensions = graft.GraftSparkExtensions
 * }}}
 *
 *  - parser: `ALTER TABLE t CREATE [OR REPLACE] BRANCH b` / `DROP BRANCH`
 *    (reference IcebergLoadActivityTask.scala:78-80);
 *  - post-hoc resolution: `MERGE INTO` upserts rewritten to the file-level
 *    copy-on-write [[graft.table.GraftTable.merge]]
 *    (reference IcebergLoadActivityTask.scala:68-76).
 *
 * `INSERT INTO` / `DELETE FROM` / time travel / `CALL` procedures need no
 * extension — the DSv2 catalog handles them natively.
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // graft-catalog SQL views: relations naming a stored view expand to
    // its current-version SQL during resolution (Spark 4.1 defines the
    // DSv2 ViewCatalog interface but does not consume it yet)
    ext.injectResolutionRule(session =>
      org.apache.spark.sql.graft.GraftViewRule(
        session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
    ext.injectPostHocResolutionRule(_ => GraftMergeRule)
    ext.injectPostHocResolutionRule(_ => GraftUpdateRule)
    ext.injectPostHocResolutionRule(_ => graft.sql.GraftDeleteRule)
    // metadata-column refs first (their read plan is also delete-correct),
    // then the MoR/mixed-layout substitution for the remaining relations
    ext.injectPostHocResolutionRule(_ => GraftMetadataColumnRule)
    ext.injectPostHocResolutionRule(_ => GraftPlanReadRule)
  }
}
