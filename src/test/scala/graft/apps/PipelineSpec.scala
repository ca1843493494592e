package graft.apps

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.GraftTable

/** Golden tests from the reference's README outputs (SURVEY.md §5.1):
  * per-branch counts, category history, WAP accept/reject arithmetic. */
class PipelineSpec extends SparkTestBase {

  test("ActivityPipeline end state matches reference arithmetic") {
    val loc = tmpDir("app-activity")
    ActivityPipeline.run(spark, loc)
    val t = GraftTable.load(spark, loc)
    assert(t.toDF.count() === 50)
    // day1 was dropped; day2..day5 still pinned
    assert(t.meta.refs.keySet === Set("main", "day2", "day3", "day4", "day5"))
    assert(t.asOf("day2").count() === 30)
    assert(t.asOf("day5").count() === 50)
    // txn10 latest category is the day-4 update
    assert(t.toDF.filter(col("txn_id") === "txn10").collect()
      .head.getAs[String]("category") === "Fashion")
    // maintenance left no orphans and data compacted-sorted
    assert(t.removeOrphanFiles(dryRun = true).isEmpty)
  }

  test("ActivitySqlPipeline (pure SQL) reaches the same end state as the API pipeline") {
    val wh = java.nio.file.Files.createTempDirectory("app-activity-sql").toString
    spark.conf.set("spark.sql.catalog.app_sql",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.app_sql.warehouse", wh)
    val tn = ActivitySqlPipeline.run(spark, "app_sql")
    assert(spark.sql(s"SELECT * FROM $tn").count() === 50)
    assert(spark.sql(s"SELECT * FROM $tn VERSION AS OF 'day2'").count() === 30)
    assert(spark.sql(s"SELECT * FROM $tn VERSION AS OF 'day5'").count() === 50)
    assert(spark.sql(s"SELECT category FROM $tn WHERE txn_id = 'txn10'")
      .collect().head.getString(0) === "Fashion")
    // day1 dropped by the pipeline's ALTER TABLE ... DROP BRANCH
    val refs = spark.sql(s"SELECT name FROM $tn.refs").collect().map(_.getString(0)).toSet
    assert(refs === Set("main", "day2", "day3", "day4", "day5"))
    // identical final table contents as the API pipeline run
    val apiLoc = tmpDir("app-activity-api")
    ActivityPipeline.run(spark, apiLoc)
    val api = GraftTable.load(spark, apiLoc).toDF
      .orderBy("txn_id").collect().map(_.toString).toSeq
    val sql = spark.sql(s"SELECT account, txn_date, txn_id, merchant, amount, category, last_updated FROM $tn")
      .orderBy("txn_id").collect().map(_.toString).toSeq
    assert(sql === api)
  }

  test("WapPipeline publishes clean batch, rejects bad batch") {
    val loc = tmpDir("app-wap")
    WapPipeline.run(spark, loc)
    val t = GraftTable.load(spark, loc)
    // 15 clean rows published; 3 bad rows discarded (reference: 15 stays 15)
    assert(t.toDF.count() === 15)
    assert(!t.meta.refs.contains(WapPipeline.WapBranch))
    // no row has any null
    val anyNull = t.schema.fieldNames.map(col(_).isNull).reduce(_ || _)
    assert(t.toDF.filter(anyNull).count() === 0)
  }
}
