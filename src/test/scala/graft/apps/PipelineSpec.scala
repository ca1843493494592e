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
