package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/**
 * Reference-fidelity demo #1: the full daily-ingestion pipeline of
 * `IcebergLoadActivityTask` (reference IcebergLoadActivityTask.scala:99-167)
 * rebuilt on the graft table layer —
 * create partitioned table -> 5 daily merge-upserts with a branch pinned
 * per day -> analytics over current + historical versions -> metadata
 * inspection -> maintenance (orphan GC, sort compaction, manifest rewrite,
 * snapshot expiry, branch drop).
 *
 * Run: sbt "runMain graft.apps.ActivityPipeline [tableDir]"
 */
object ActivityPipeline {

  def run(spark: SparkSession, location: String): Unit = {
    GraftTable.drop(spark, location)
    // reference IcebergLoadActivityTask.scala:17-40: partitioned DDL + props
    val table = GraftTable.create(spark, location, "finance.activity",
      ActivityData.schema, ActivityData.partitionCols, ActivityData.tableProps)

    // reference :99-105 — one merge-keyed CSV load + branch per day.
    // Ingestion is the S1 path: day-folder CSVs with header + explicit
    // schema (falls back to in-memory batches when fixtures are absent).
    val csvDays = Seq("2024-03-02", "2024-03-03", "2024-03-05", "2024-03-08", "2024-03-09")
    val days: Seq[(String, org.apache.spark.sql.DataFrame)] =
      ActivityData.csvFixturesDir match {
        case Some(base) => csvDays.zipWithIndex.map { case (d, i) =>
          s"day${i + 1}" -> ActivityData.readDayCsv(spark, s"$base/$d")
        }
        case None => Seq(
          "day1" -> ActivityData.day1(spark), "day2" -> ActivityData.day2(spark),
          "day3" -> ActivityData.day3(spark), "day4" -> ActivityData.day4(spark),
          "day5" -> ActivityData.day5(spark))
      }
    // reference :45-49 — each batch is staged in a schema-cloned tmp table
    // (CREATE OR REPLACE … AS SELECT * LIMIT 0), then merged from the stage
    val stagingLoc = s"$location-tmp"
    days.foreach { case (branch, df) =>
      val stage = GraftTable.createLike(table, stagingLoc, "finance.activity_tmp")
      stage.append(df)
      table.merge(stage.toDF, ActivityData.mergeKeys, ActivityData.updateCols)
      table.createOrReplaceBranch(branch)
    }
    GraftTable.drop(spark, stagingLoc)

    // reference :84-97 — metadata counts
    println(s"history: ${table.history.count()}")
    println(s"metadata log entries: ${table.metadataLogEntries.count()}")
    println(s"snapshot entries: ${table.snapshotsDF.count()}")
    println(s"manifests: ${table.manifestsDF.count()}")
    println(s"data files: ${table.filesDF.count()}")

    // reference :107-111 — current table, incl. the per-row foreach action
    val activityTable = table.toDF
    println(s"activity count: ${activityTable.count()}")
    // reference :110 `activityTable.foreach(println)` — the foreach runs on
    // executors; fine for this bounded demo table, never on a 100 TB scan
    activityTable.foreach(r => println(r))
    activityTable.show(2, truncate = false)

    // reference :113-123 — row counts per version
    days.map(_._1).foreach { b =>
      println(s"as of $b: ${table.asOf(b).count()}")
    }

    // reference :125 / README.md:40-45 — flagship group-by
    activityTable.groupBy("account")
      .agg(count(lit(1)).as("activity_count"))
      .orderBy("account")
      .show(10, truncate = false)

    // reference :128-137 / README.md:52-73 — txn10 through time
    table.asOf("day1").filter(col("txn_id") === "txn10").show(truncate = false)
    table.asOf("day5").filter(col("txn_id") === "txn10").show(truncate = false)
    activityTable.filter(col("txn_id") === "txn10").show(truncate = false)

    // reference :146-154 / README.md:94-114 — conjunction filter, two versions
    val pointFilter = col("account") === "acc4" &&
      col("txn_date") === to_date(lit("2024-03-05")) &&
      col("merchant") === "Gear Hub"
    table.asOf("day3").filter(pointFilter).show(truncate = false)
    activityTable.filter(pointFilter).show(truncate = false)

    // reference :156-165 — maintenance procedures
    println(s"orphans (dry run): ${table.removeOrphanFiles(dryRun = true).size}")
    table.rewriteDataFilesSorted(Seq(asc_nulls_last("account"), desc_nulls_first("txn_id")))
    table.rewriteManifests()
    val expired = table.expireSnapshots(System.currentTimeMillis(), retainLast = 3)
    println(s"expired snapshots: ${expired.size}")
    println(s"orphans after maintenance: ${table.removeOrphanFiles(dryRun = false, olderThanMs = Long.MaxValue).size}")

    // reference :167 — drop the oldest branch
    table.dropBranch("day1")
    println(s"final refs: ${table.meta.refs.keySet.toSeq.sorted.mkString(", ")}")
    println(s"final count: ${table.toDF.count()}")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-activity-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loc = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-activity").toString + "/activity")
    run(spark, loc)
    spark.stop()
  }
}
