package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Deletion vectors (round 14 — Iceberg v3's position-delete format):
  * per-data-file sorted run-length bitsets committed by positional
  * deletes under `write.delete.vector.enabled`, merged at read time into
  * an O(log runs) membership probe instead of a row-list anti-join. */
class DvSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def mkTable(name: String, dv: Boolean = true): GraftTable =
    GraftTable.create(spark, tmpDir(name), name, schema,
      props = if (dv) Map("write.delete.vector.enabled" -> "true")
        else Map.empty)

  private def rows(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  test("runs encoding: adjacent positions collapse, singletons stay, full file is one run") {
    import spark.implicits._
    val t = mkTable("dv-runs")
    t.append(rows(0 until 100).coalesce(1)) // one file, _pos = 0..99 in id order? no — writer order
    // delete by id bands; ids were appended in order within the single
    // file, so _pos i holds id i (single-task sequential write)
    t.deleteWherePositional(col("id").between(10, 19) ||
      col("id") === 40 || col("id") === 42 || col("id").between(90, 99))
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.size === 1 && dels.head.isDv)
    assert(dels.head.records === 22, "records must count covered positions")
    val dv = spark.read.parquet(s"${t.dataDir}/${dels.head.path}")
      .as[(String, Seq[Long])].collect()
    assert(dv.length === 1)
    assert(dv.head._2 === Seq(10L, 10L, 40L, 1L, 42L, 1L, 90L, 10L),
      "run-length encoding must collapse adjacency exactly")
    assert(t.toDF.count() === 78)
    assert(t.toDF.filter(col("id").between(10, 19)).count() === 0)
    assert(t.toDF.filter(col("id") === 41).count() === 1)
  }

  test("DV mode equals list mode row-for-row, incl. sequence semantics") {
    import spark.implicits._
    def drive(t: GraftTable): Seq[(Long, String)] = {
      t.append(rows(0 until 60))
      t.deleteWherePositional(col("id") % 7 === 3)
      // appended AFTER the delete: those ids must be live again
      t.append(rows(0 until 10).filter(col("id") % 7 === 3))
      t.deleteWherePositional(col("id") % 11 === 5)
      t.toDF.as[(Long, String)].collect().toSeq.sorted
    }
    val got = drive(mkTable("dv-parity-dv", dv = true))
    val want = drive(mkTable("dv-parity-list", dv = false))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("multiple DV commits fold; vectors survive expire + orphan GC") {
    val t = mkTable("dv-fold")
    t.append(rows(0 until 50))
    t.deleteWherePositional(col("id") < 10)
    t.deleteWherePositional(col("id") >= 45)
    assert(t.meta.currentSnapshot.get.deleteFiles.count(_.isDv) === 2)
    assert(t.toDF.count() === 35)
    t.expireSnapshots(System.currentTimeMillis() + 3600000L, retainLast = 1)
    t.removeOrphanFiles(dryRun = false,
      olderThanMs = System.currentTimeMillis() + 3600000L)
    assert(t.toDF.count() === 35,
      "maintenance must not collect live deletion vectors")
  }

  test("changelog DELETE images over a DV commit") {
    import spark.implicits._
    val t = mkTable("dv-changelog")
    t.append(rows(0 until 30))
    t.createOrReplaceBranch("before")
    t.deleteWherePositional(col("id") % 5 === 0)
    t.createOrReplaceBranch("after")
    val ch = t.changelogBetween("before", "after")
      .select(col("_change_type"), col("id")).as[(String, Long)]
      .collect().toSeq.sorted
    assert(ch === (0 until 30 by 5).map(i => ("DELETE", i.toLong)).sorted)
  }

  test("rewrite_position_delete_files migrates row lists to deletion vectors") {
    val t = mkTable("dv-migrate", dv = false)
    t.append(rows(0 until 40).coalesce(1))
    t.deleteWherePositional(col("id") < 8) // legacy row-list commit
    val before = t.meta.currentSnapshot.get.deleteFiles
    assert(before.size === 1 && before.head.isPositional && !before.head.isDv)
    // flip the table's declared representation, then migrate
    t.setProperties(Map("write.delete.vector.enabled" -> "true"))
    t.rewritePositionDeleteFiles()
    val after = t.meta.currentSnapshot.get.deleteFiles
    assert(after.size === 1 && after.head.isDv,
      s"migration must land on DV kind, got $after")
    assert(after.head.records === 8)
    assert(t.toDF.count() === 32)
    assert(t.toDF.filter(col("id") < 8).count() === 0)
  }

  test("dv_contains: binary search over runs, boundaries exact") {
    import spark.implicits._
    val runs = Seq(5L, 3L, 20L, 1L, 100L, 50L) // [5,8) U {20} U [100,150)
    val probes = Seq(0L, 4L, 5L, 7L, 8L, 19L, 20L, 21L, 99L, 100L, 149L, 150L)
    val got = probes.toDF("p")
      .select(graft.functions.GraftFunctions.dv_contains(
        typedlit(runs), col("p")).as("hit"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(false, false, true, true, false, false, true, false,
      false, true, true, false))
    // empty vector contains nothing
    val empty = Seq(1L).toDF("p")
      .select(graft.functions.GraftFunctions.dv_contains(
        typedlit(Seq.empty[Long]), col("p")))
      .head.getBoolean(0)
    assert(!empty)
  }

  test("legacy metadata without targetPaths parses to empty (read-fallback contract)") {
    // pre-round-17 snapshot JSON has no targetPaths field: json4s must
    // default it empty, and empty means NOT RECORDED — planners fall back
    // to the content read rather than treating it as "targets nothing"
    val json = """{"name":"old","schemaJson":"{\"type\":\"struct\",\"fields\":[]}",
      "partitionCols":[],"props":{},"refs":{"main":1},"version":1,
      "lastUpdatedMs":0,"metadataLog":[],
      "snapshots":[{"id":1,"timestampMs":0,"operation":"delete",
        "inlineFiles":[],"addedFiles":[],"removedFiles":[],"summary":{},
        "inlineDeleteFiles":[{"path":"_deletes/d1.parquet",
          "keyCols":["__file","__pos"],"records":3,"sizeBytes":10,
          "seq":1,"kind":"position"}]}]}"""
    val m = graft.table.SnapshotLog.parseMetadata(json)
    val d = m.snapshots.head.deleteFiles.head
    assert(d.isPositional && d.targetPaths.isEmpty)
  }

  test("read plan: DV merge is a broadcast probe, not a row-list anti-join") {
    val t = mkTable("dv-plan")
    t.append(rows(0 until 100))
    t.deleteWherePositional(col("id") < 50)
    val plan = t.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"DV frame must broadcast:\n$plan")
    assert(plan.contains("dvcontains") || plan.contains("DvContains") ||
      plan.toLowerCase.contains("dv_contains"),
      s"membership probe must be the native DvContains:\n$plan")
  }
}
