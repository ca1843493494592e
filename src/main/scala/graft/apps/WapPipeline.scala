package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/**
 * Reference-fidelity demo #2: Write-Audit-Publish (reference
 * WapIceberg.scala:13-92) — stage an append on a WAP branch, audit for
 * nulls, fast-forward `main` on success or discard the branch on failure.
 *
 * Run: sbt "runMain graft.apps.WapPipeline [tableDir]"
 */
object WapPipeline {

  val WapBranch = "feature_branch" // reference WapIceberg.scala:14

  /** Returns true when the batch was published. */
  def loadWithAudit(spark: SparkSession, table: GraftTable,
      batch: org.apache.spark.sql.DataFrame): Boolean = {
    // reference WapIceberg.scala:13-15: session-scoped write redirection
    spark.conf.set("spark.graft.wap.branch", WapBranch)
    try {
      table.append(batch) // lands on the WAP branch (:64)
      // audit (:66-76): same-session read sees staged rows; count any-null rows
      val staged = table.toDF
      println(s"audit sees ${staged.count()} rows (staged included)")
      val anyNull = table.schema.fieldNames.map(col(_).isNull).reduce(_ || _)
      val invalidData = staged.filter(anyNull).count()
      spark.conf.unset("spark.graft.wap.branch")
      if (invalidData > 0) {
        // reference :77-79: reject — staged rows never reach main
        println(s"audit FAILED: $invalidData invalid rows; discarding $WapBranch")
        false
      } else {
        // reference :81: publish via fast-forward
        table.fastForward("main", WapBranch)
        println("audit passed: fast-forwarded main")
        true
      }
    } finally {
      spark.conf.unset("spark.graft.wap.branch")
      // reference :84: branch always dropped
      if (table.meta.refs.contains(WapBranch)) table.dropBranch(WapBranch)
    }
  }

  def run(spark: SparkSession, location: String): Unit = {
    GraftTable.drop(spark, location)
    val table = GraftTable.create(spark, location, "finance.activity2",
      ActivityData.schema, ActivityData.partitionCols, ActivityData.tableProps)

    // clean load publishes (reference WapIceberg.scala:87-90)
    val published = loadWithAudit(spark, table, ActivityData.cleanBatch(spark))
    println(s"clean batch published=$published count=${table.toDF.count()}")

    // bad load (nulls) is rejected (reference :91-92 + input/2024-03-10);
    // read through the CSV ingestion path when the fixture exists
    val badBatch = ActivityData.csvFixturesDir
      .map(base => ActivityData.readDayCsv(spark, s"$base/2024-03-10"))
      .getOrElse(ActivityData.badBatch(spark))
    val published2 = loadWithAudit(spark, table, badBatch)
    println(s"bad batch published=$published2 count=${table.toDF.count()}")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-wap-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loc = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-wap").toString + "/activity2")
    run(spark, loc)
    spark.stop()
  }
}
