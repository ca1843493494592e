package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.GraftTable

/** CDC changelog streaming (round 14): graft-stream's `changelog` mode
  * emits INSERT / DELETE (deletion-vector full-row images) / DELETE_KEY
  * (equality-delete key retractions) images per commit, replayable into
  * a sink that lands on the exact batch state. */
class ChangelogStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def rows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 1.5)).toDF("id", "grp", "v")
  }

  private def collectChanges(loc: String, cp: String) = {
    val out = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long)]()
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(loc)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("_change_type"), col("_commit_snapshot_id"), col("id"))
          .collect().foreach(r =>
            out.add((r.getString(0), r.getLong(1), r.getLong(2)))))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq
  }

  test("images: INSERT for appends, full-row DELETE for DV commits, DELETE_KEY for equality") {
    val t = GraftTable.create(spark, tmpDir("cdc-img"), "cdcimg", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    t.append(rows(0 until 30))
    t.deleteWherePositional(col("id") < 5)            // DV commit
    t.deleteWhereMoR(col("id") >= 25, Seq("id"))      // equality commit
    val cp = tmpDir("cdc-img-cp")
    val changes = collectChanges(t.location, cp)
    val byType = changes.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    assert(byType("INSERT") === (0L until 30L))
    assert(byType("DELETE") === (0L until 5L),
      "DV images must be the exact deleted rows")
    assert(byType("DELETE_KEY") === (25L until 30L),
      "equality images must carry the key tuples")
    // commit order rides _commit_snapshot_id
    assert(changes.filter(_._1 == "DELETE").map(_._2).distinct.size === 1)
  }

  test("replayChangelog lands on the batch state; incremental runs resume the checkpoint") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("cdc-src"), "cdcsrc", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    val sink = GraftTable.create(spark, tmpDir("cdc-sink"), "cdcsink", schema)
    val cp = tmpDir("cdc-cp")
    def run(): Unit = spark.readStream.format("graft-stream")
      .option("changelog", "true").load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    src.append(rows(0 until 40)); run()
    src.deleteWhereMoR(col("id") % 7 === 3, Seq("id")); run()
    src.append(rows(100 until 120)); run()
    // MoR UPDATE: DELETE_KEY old versions + INSERT new ones in one commit
    src.updateWhereMoR(col("id") === 101L, Seq("v" -> lit(999.0)), Seq("id")); run()
    // a no-op delete (matches nothing) must stream as zero images
    src.deleteWhereMoR(col("id") === -1L, Seq("id")); run()
    src.deleteWherePositional(col("grp") === "g1"); run()
    def state(t: GraftTable) =
      t.toDF.as[(Long, String, Double)].collect().toSeq.sorted
    assert(state(sink) === state(src))
    assert(state(sink).nonEmpty)
  }

  test("position-LIST delete commits are refused in changelog mode; CoW needs skipOverwriteSnapshots") {
    val t = GraftTable.create(spark, tmpDir("cdc-ref"), "cdcref", schema)
    t.append(rows(0 until 10))
    t.deleteWherePositional(col("id") < 2) // legacy row-list (DV off)
    val e = intercept[Exception] {
      collectChanges(t.location, tmpDir("cdc-ref-cp"))
    }
    assert(e.getMessage.contains("position-LIST") ||
      Option(e.getCause).exists(_.getMessage.contains("position-LIST")))
    // CoW delete (removes files) refuses without the skip option
    val t2 = GraftTable.create(spark, tmpDir("cdc-cow"), "cdccow", schema)
    t2.append(rows(0 until 10))
    t2.deleteWhere(col("id") < 2)
    val e2 = intercept[Exception] {
      collectChanges(t2.location, tmpDir("cdc-cow-cp"))
    }
    assert(e2.getMessage.contains("state") ||
      Option(e2.getCause).exists(_.getMessage.contains("state diff")))
  }
}
