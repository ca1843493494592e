package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.MergeClause.src

/** Round-15 cross-feature interop pins: the new surfaces must compose —
  * WAP-by-id with the streaming read, the general MoR merge with the
  * Avro delete format and the CDC stream, staged snapshots with
  * expire_snapshots' retention pass. */
class Round15InteropSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("n", LongType)))

  private def rows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"v$i", i.toLong * 10)).toDF("id", "v", "n")
  }

  test("WAP-by-id x streaming: staged rows never stream; the publish streams as INSERTs") {
    val t = GraftTable.create(spark, tmpDir("r15-wapstream"), "ws", schema,
      props = Map("write.wap.enabled" -> "true"))
    t.append(rows(0 until 5))
    spark.conf.set("spark.graft.wap.id", "wb1")
    try t.append(rows(10 until 13))
    finally spark.conf.unset("spark.graft.wap.id")
    def drain(cp: String): Seq[Long] = {
      val out = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      spark.readStream.format("graft-stream").load(t.location)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => out.add(r.getLong(0))))
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      import scala.jdk.CollectionConverters._
      out.asScala.toSeq.sorted
    }
    val cp = tmpDir("r15-wapstream-cp")
    assert(drain(cp) === (0L until 5L),
      "a staged (unpublished) wap snapshot must not stream")
    t.cherryPick(t.snapshotForWapId("wb1").get.id)
    assert(drain(cp) === (10L until 13L),
      "the publish (cherrypick) must stream its rows exactly once")
  }

  test("WAP-by-id x changelog stream: the publish emits INSERT images with the publish snapshot id") {
    val t = GraftTable.create(spark, tmpDir("r15-wapcdc"), "wc", schema,
      props = Map("write.wap.enabled" -> "true"))
    t.append(rows(0 until 3))
    spark.conf.set("spark.graft.wap.id", "wb2")
    try t.append(rows(20 until 22))
    finally spark.conf.unset("spark.graft.wap.id")
    val pub = t.cherryPick(t.snapshotForWapId("wb2").get.id)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(t.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("_change_type"), col("_commit_snapshot_id"), col("id"))
          .collect().foreach(r =>
            out.add((r.getString(0), r.getLong(1), r.getLong(2)))))
      .option("checkpointLocation", tmpDir("r15-wapcdc-cp"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    import scala.jdk.CollectionConverters._
    val images = out.asScala.toSeq
    assert(images.forall(_._1 == "INSERT"))
    val published = images.filter(_._2 == pub.id).map(_._3).sorted
    assert(published === (20L until 22L),
      "publish images must carry the PUBLISH snapshot id, not the staged one")
    assert(images.map(_._3).sorted === Seq(0L, 1L, 2L, 20L, 21L))
  }

  test("general MoR merge x avro delete format x CDC replay lands on the batch state") {
    import spark.implicits._
    val srcT = GraftTable.create(spark, tmpDir("r15-mor-avro"), "ma", schema,
      props = Map("write.merge.mode" -> "merge-on-read",
        "write.delete.format.default" -> "avro"))
    val sink = GraftTable.create(spark, tmpDir("r15-mor-avro-sink"), "mas", schema)
    srcT.append(rows(0 until 8))
    srcT.mergeIntoMoR(
      Seq((1L, 100L), (2L, 0L), (12L, 120L)).toDF("sid", "sn"),
      keys = Seq("id" -> col("sid")),
      matched = Seq(
        MergeClause.Delete(Some(src("sn") === 0L)),
        MergeClause.Update(None, Seq("n" -> src("sn")))),
      notMatched = Seq(MergeClause.Insert(None,
        Seq("id" -> src("sid"), "v" -> lit("new"), "n" -> src("sn")))))
    // the merge's delete file is genuinely avro (the table's declared format)
    val snap = srcT.meta.currentSnapshot.get
    val dels = snap.deleteFiles.filter(_.seq == snap.id)
    assert(dels.nonEmpty && dels.forall(_.path.endsWith(".avro")), dels.map(_.path))
    // CDC stream replays the avro-delete merge commit into the sink
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(srcT.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", tmpDir("r15-mor-avro-cp"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    def state(t: GraftTable) =
      t.toDF.as[(Long, String, Long)].collect().toSeq.sorted
    assert(state(sink) === state(srcT))
    assert(state(srcT).map(_._1) === Seq(0L, 1L, 3L, 4L, 5L, 6L, 7L, 12L))
  }

  test("expire_snapshots garbage-collects an unpublished staged wap snapshot") {
    val t = GraftTable.create(spark, tmpDir("r15-wapexp"), "we", schema,
      props = Map("write.wap.enabled" -> "true"))
    t.append(rows(0 until 3))
    spark.conf.set("spark.graft.wap.id", "wb3")
    try t.append(rows(30 until 32))
    finally spark.conf.unset("spark.graft.wap.id")
    val staged = t.snapshotForWapId("wb3").get
    val future = System.currentTimeMillis() + 3600L * 1000
    val expired = t.expireSnapshots(olderThanMs = future, retainLast = 1,
      nowMs = future)
    assert(expired.contains(staged.id),
      "an abandoned staged snapshot is exactly what expire must collect")
    assert(t.snapshotForWapId("wb3").isEmpty)
    assert(t.toDF.count() === 3L, "main is untouched")
    // its exclusive data files are physically gone
    val stagedOnly = staged.addedFiles
    val live = t.meta.snapshots.flatMap(_.files.map(_.path)).toSet
    assert(stagedOnly.forall(p => !live.contains(p)))
  }

  test("position_deletes x rewrite_position_delete_files: the view tracks the compacted state") {
    val t = GraftTable.create(spark, tmpDir("r15-posmeta"), "pm", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    t.append(rows(0 until 50).coalesce(1)) // one file, _pos i == id i
    t.deleteWherePositional(col("id") < 5)
    t.deleteWherePositional(col("id") === 20L)
    assert(t.meta.currentSnapshot.get.deleteFiles.size === 2)
    val before = t.positionDeletesDF.collect()
      .map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(before.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 20L))
    assert(before.map(_._2).distinct.length === 2,
      "positions come from two physical delete files before the rewrite")
    t.rewritePositionDeleteFiles()
    val after = t.positionDeletesDF.collect()
      .map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(after.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 20L),
      "the logical deleted-position set must survive the compaction")
    assert(after.map(_._2).distinct.length === 1,
      "one compacted delete file after the rewrite")
    assert(t.toDF.count() === 44L)
  }

  test("entries x WAP staging: a staged snapshot never leaks into the head's entries") {
    val t = GraftTable.create(spark, tmpDir("r15-entwap"), "ew", schema,
      props = Map("write.wap.enabled" -> "true"))
    t.append(rows(0 until 10))
    val headEntries = t.entriesDF.collect()
    spark.conf.set("spark.graft.wap.id", "we1")
    try t.append(rows(100 until 105))
    finally spark.conf.unset("spark.graft.wap.id")
    assert(t.entriesDF.collect().map(_.getString(5)).sorted.toSeq ===
      headEntries.map(_.getString(5)).sorted.toSeq,
      "entries reads the CURRENT snapshot; staged files must not appear")
    // all_manifests DOES see the staged snapshot (it is a retained
    // snapshot with its own manifest list) — under its own reference id
    val staged = t.snapshotForWapId("we1").get
    val am = t.allManifestsDF.collect()
    assert(am.exists(_.getLong(0) == staged.id))
  }

  test("all_manifests x rewrite_manifests: the collapsed chain is reflected at head") {
    val t = GraftTable.create(spark, tmpDir("r15-amrw"), "am", schema)
    (0 until 5).foreach(i => t.append(rows(i * 10 until i * 10 + 10)))
    val headId = t.meta.currentSnapshotId.get
    val chainBefore = t.allManifestsDF
      .filter(col("reference_snapshot_id") === headId).count()
    assert(chainBefore === 5L, "append chain: one manifest per commit")
    t.rewriteManifests(maxManifests = 2)
    val m2 = t.meta
    val newHead = m2.currentSnapshotId.get
    val chainAfter = t.allManifestsDF
      .filter(col("reference_snapshot_id") === newHead).count()
    assert(chainAfter === 1L, "rewrite_manifests collapses the chain")
    assert(t.toDF.count() === 50L)
  }
}
