package graft.table.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.GraftTable

/** Path-based `format("graft")` reads: current snapshot by default,
  * pinned by ref / snapshot id / timestamp via the Iceberg-shaped read
  * options, always read-only and always the DSv2 parquet scan. */
class GraftDataSourceSpec extends SparkTestBase {

  test("path read resolves current, version ref, snapshot id and timestamp") {
    import spark.implicits._
    val loc = tmpDir("ds-read")
    val t = GraftTable.create(spark, loc, "ds", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.createOrReplaceBranch("two")
    val tsAfterFirst = t.meta.currentSnapshot.get.timestampMs
    Thread.sleep(5)
    t.append(Seq((3L, "c")).toDF("id", "v"))

    def read = spark.read.format("graft")
    assert(read.load(loc).count() === 3)
    assert(read.option("version", "two").load(loc).count() === 2)
    val firstSnapId = t.meta.refs("two").toString
    assert(read.option("version", firstSnapId).load(loc).count() === 2)
    assert(read.option("timestampMs", tsAfterFirst.toString).load(loc).count() === 2)
    // filters still push to the parquet scan through the path read
    val plan = read.load(loc).filter(col("id") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,1)]"), plan)
    // option combinations and unknown refs fail loudly
    intercept[Exception](
      read.option("version", "two").option("timestampMs", "1").load(loc).collect())
    intercept[Exception](read.option("version", "nope").load(loc).collect())
  }
}
