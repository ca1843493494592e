package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.GraftTable

class GraftStreamSinkSpec extends SparkTestBase {

  test("each micro-batch commits one snapshot; time travel works mid-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = GraftTable.create(spark, tmpDir("stream-sink"), "s", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    val input = MemoryStream[(String, Long)]
    val q = StreamingOps.writeToGraftTable(
      input.toDF.toDF("k", "v"), t,
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try {
      input.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      assert(t.toDF.count() === 2)
      t.createOrReplaceBranch("after_b1")
      input.addData(("c", 3L))
      q.processAllAvailable()
      assert(t.toDF.count() === 3)
      // branch pinned mid-stream stays stable
      assert(t.asOf("after_b1").count() === 2)
      assert(t.meta.snapshots.count(_.operation == "append") === 2)
    } finally q.stop()
  }

  test("Trigger.AvailableNow runs a file-source backfill to completion") {
    import spark.implicits._
    // the st_ingest shape: parquet files -> file stream -> graft sink,
    // AvailableNow = process everything then stop, so the materialized
    // table equals the batch read of the same files
    val srcDir = java.nio.file.Files.createTempDirectory("stream-src").toString
    Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(srcDir)
    val t = GraftTable.create(spark, tmpDir("stream-an"), "s", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("k", StringType), StructField("v", LongType))))
      .parquet(srcDir)
    val q = StreamingOps.writeToGraftTable(stream, t,
      java.nio.file.Files.createTempDirectory("ckpt-an").toString,
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q.awaitTermination()
    assert(t.toDF.count() === 3)
    assert(t.toDF.as[(String, Long)].collect().toSet ===
      Set(("a", 1L), ("b", 2L), ("c", 3L)))
    // commits are batch-id-stamped append snapshots (exactly-once sink)
    assert(t.meta.snapshots.filter(_.operation == "append")
      .forall(_.summary.contains(StreamingOps.BatchIdSummaryKey)))
  }

  test("streaming near-dup filter: novel docs append, near-dups drop, replays skip") {
    import spark.implicits._
    // corpus table stores each survivor's fingerprint alongside the row
    val t = GraftTable.create(spark, tmpDir("stream-neardup"), "nd", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("simhash", LongType))))
    val sid = "nd-stream"
    def batch(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

    // batch 0: an exact-dup pair (lowest id survives) + a distinct doc
    assert(StreamingOps.commitNearDupBatch(t,
      batch(1L -> "the quick brown fox jumps over the lazy dog",
            2L -> "the quick brown fox jumps over the lazy dog",
            3L -> "completely different content about spark engines"),
      0L, "text", "doc_id", maxDist = 3, sid))
    assert(t.toDF.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))

    // batch 1: a normalized dup of doc 1 (near-dup vs the CORPUS, not the
    // batch) drops; a novel doc survives
    assert(StreamingOps.commitNearDupBatch(t,
      batch(4L -> "  The Quick  Brown Fox jumps over the lazy dog ",
            5L -> "unrelated text mentioning neither foxes nor dogs at all"),
      1L, "text", "doc_id", maxDist = 3, sid))
    assert(t.toDF.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 5L))

    // replayed batch id: recognized and skipped (exactly-once inherited)
    assert(!StreamingOps.commitNearDupBatch(t,
      batch(6L -> "would be novel but this is a replay"),
      1L, "text", "doc_id", maxDist = 3, sid))
    assert(t.toDF.count() === 3)

    // survivors carry their fingerprints: corpus-side join input is real
    assert(t.toDF.filter(org.apache.spark.sql.functions.col("simhash").isNull)
      .count() === 0)
  }

  test("a replayed micro-batch is skipped: append sink is exactly-once") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("stream-eo"), "s", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val s1 = "stream-1"
    // first delivery commits and stamps the batch id + stream identity
    assert(StreamingOps.commitMicroBatch(t, b0, 0L, Seq.empty, Seq.empty, s1))
    assert(t.toDF.count() === 2)
    assert(t.meta.currentSnapshot.get.summary(
      StreamingOps.BatchIdSummaryKey) === "0")
    assert(t.meta.currentSnapshot.get.summary(
      StreamingOps.StreamIdSummaryKey) === s1)
    // post-restart re-delivery of the same batch id: recognized, skipped
    assert(!StreamingOps.commitMicroBatch(t, b0, 0L, Seq.empty, Seq.empty, s1))
    assert(t.toDF.count() === 2)
    assert(t.meta.snapshots.size === 1)
    // the next batch commits normally
    assert(StreamingOps.commitMicroBatch(t,
      Seq(("c", 3L)).toDF("k", "v"), 1L, Seq.empty, Seq.empty, s1))
    assert(t.toDF.count() === 3)
    // merge mode stamps and skips replays the same way
    assert(!StreamingOps.commitMicroBatch(t, b0, 1L, Seq("k"), Seq.empty, s1))
    assert(StreamingOps.commitMicroBatch(t,
      Seq(("a", 9L)).toDF("k", "v"), 2L, Seq("k"), Seq.empty, s1))
    assert(t.toDF.filter($"k" === "a").collect().head.getLong(1) === 9L)
    assert(t.meta.currentSnapshot.get.summary(
      StreamingOps.BatchIdSummaryKey) === "2")
  }

  test("batch ids are scoped per stream: a fresh checkpoint is not a replay") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("stream-scope"), "s", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    // stream 1 runs through batch 2
    assert(StreamingOps.commitMicroBatch(t,
      Seq(("a", 1L)).toDF("k", "v"), 2L, Seq.empty, Seq.empty, "stream-1"))
    // a recreated checkpoint (ids restart at 0) must NOT be dropped as a
    // replay of stream 1's batches — this was silent data loss before the
    // stream identity was stamped
    assert(StreamingOps.commitMicroBatch(t,
      Seq(("b", 2L)).toDF("k", "v"), 0L, Seq.empty, Seq.empty, "stream-2"))
    assert(t.toDF.count() === 2)
    // each stream's own replay protection still holds independently
    assert(!StreamingOps.commitMicroBatch(t,
      Seq(("b", 2L)).toDF("k", "v"), 0L, Seq.empty, Seq.empty, "stream-2"))
    assert(!StreamingOps.commitMicroBatch(t,
      Seq(("a", 1L)).toDF("k", "v"), 1L, Seq.empty, Seq.empty, "stream-1"))
    assert(t.toDF.count() === 2)
  }

  test("CDC apply: latestBy reduces a multi-version batch before the merge") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("stream-cdc"), "s", StructType(Seq(
      StructField("k", StringType), StructField("seq", LongType),
      StructField("v", LongType))))
    val sid = "cdc-1"
    // a change-feed batch with THREE versions of key a: without the
    // reduction the merge cardinality guard would (correctly) refuse it
    val b0 = Seq(("a", 1L, 10L), ("a", 3L, 30L), ("a", 2L, 20L),
      ("b", 1L, 100L)).toDF("k", "seq", "v")
    assert(StreamingOps.commitMicroBatch(t, b0, 0L, Seq("k"), Seq.empty, sid,
      latestBy = Seq("seq")))
    val after0 = t.toDF.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(after0 === Map("a" -> 30L, "b" -> 100L)) // highest seq wins
    // next batch: a newer version of b overwrites, a new key c inserts,
    // and ties on the first latestBy column break on the second
    val b1 = Seq(("b", 5L, 500L), ("b", 5L, 501L), ("c", 1L, 7L))
      .toDF("k", "seq", "v")
    assert(StreamingOps.commitMicroBatch(t, b1, 1L, Seq("k"), Seq.empty, sid,
      latestBy = Seq("seq", "v")))
    val after1 = t.toDF.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(after1 === Map("a" -> 30L, "b" -> 501L, "c" -> 7L))
    // the reduction inherits the replay guard unchanged
    assert(!StreamingOps.commitMicroBatch(t, b1, 1L, Seq("k"), Seq.empty, sid,
      latestBy = Seq("seq", "v")))
    // un-reduced multi-version batches still fail fast on the cardinality
    // guard — latestBy is opt-in, not a silent default
    val dup = Seq(("d", 1L, 1L), ("d", 2L, 2L)).toDF("k", "seq", "v")
    intercept[Exception] {
      StreamingOps.commitMicroBatch(t, dup, 2L, Seq("k"), Seq.empty, sid)
    }
  }

  test("merge-keyed streaming upsert deduplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = GraftTable.create(spark, tmpDir("stream-merge"), "s", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    val input = MemoryStream[(String, Long)]
    val q = StreamingOps.writeToGraftTable(
      input.toDF.toDF("k", "v"), t,
      java.nio.file.Files.createTempDirectory("ckpt").toString,
      mergeKeys = Seq("k"))
    try {
      input.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      input.addData(("a", 10L), ("c", 3L)) // update a, insert c
      q.processAllAvailable()
      val rows = t.toDF.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows === Map("a" -> 10L, "b" -> 2L, "c" -> 3L))
    } finally q.stop()
  }

  test("stream identity: equivalent checkpoint spellings share one id; " +
      "a recreated checkpoint gets a fresh identity through the query id") {
    val dir = java.nio.file.Files.createTempDirectory("sid-norm").toString
    // /tmp/x, /tmp/x/ and file:///tmp/x all resolve to one checkpoint —
    // the replay guard must see ONE stream for all three spellings
    assert(StreamingOps.streamId(dir) === StreamingOps.streamId(s"$dir/"))
    assert(StreamingOps.streamId(dir) === StreamingOps.streamId(s"file://$dir"))
    assert(StreamingOps.streamId(dir) !== StreamingOps.streamId(s"$dir-other"))
    // outside a streaming thread the runtime identity is the fallback;
    // inside one it is the checkpoint's persisted query id (which a
    // recreated checkpoint regenerates, so batch ids restarting at 0 are
    // a FRESH stream, not replays)
    assert(StreamingOps.runtimeStreamId(spark, "fb") === "fb")
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "qid-123")
    try assert(StreamingOps.runtimeStreamId(spark, "fb") === "qid-123")
    finally spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
  }

  test("replayChangelog fallback key inference: clean single key set works, " +
      "ambiguous partial columns are refused") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val sink = graft.table.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("rc-fb").toString + "/t",
      "rc_fb", schema)
    sink.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    // a key-only retraction frame WITHOUT _change_key: id fully
    // populated, v fully null -> keys inferred as (id) in one pass
    val retract = Seq((2L, Option.empty[String], "DELETE_KEY", 9L))
      .toDF("id", "v", "_change_type", "_commit_snapshot_id")
    StreamingOps.replayChangelog(retract, sink)
    assert(sink.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 3L))
    // a PARTIALLY-populated column is ambiguous (null key value vs mixed
    // key sets) — refused with a pointer to keep _change_key
    val ambiguous = Seq(
      (1L, Some("a"), "DELETE_KEY", 10L),
      (3L, Option.empty[String], "DELETE_KEY", 10L))
      .toDF("id", "v", "_change_type", "_commit_snapshot_id")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.replayChangelog(ambiguous, sink)
    }
    assert(e.getMessage.contains("_change_key"))
    assert(sink.toDF.count() === 2L, "refused replay must not mutate the sink")
  }
}
