package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import StreamingOps._

class StreamingOpsSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts aggregates a replayed batch under watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:15:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-01 11:05:00"), 1, "view", 3.0))
    val q = windowedCounts(input.toDF, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("wc_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("wc_out").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("value_sum"))).toMap
    assert(rows(("2024-01-01 10:00:00.0", "click")) === ((2L, 3.0)))
    assert(rows(("2024-01-01 11:00:00.0", "view")) === ((1L, 3.0)))
  }

  test("joinStreams pairs impression->click within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    impressions.addData(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-01 10:00:00")))
    clicks.addData(
      (1L, ts("2024-01-01 10:04:00")), // within 5 min -> joins
      (2L, ts("2024-01-01 10:30:00")), // outside the bound -> dropped
      (9L, ts("2024-01-01 10:01:00"))) // no impression -> dropped
    val joined = StreamingOps.joinStreams(
      impressions.toDF.toDF("imp_id", "imp_ts"),
      clicks.toDF.toDF("click_id", "click_ts"),
      "imp_id", "click_id", "imp_ts", "click_ts",
      withinMs = 5 * 60 * 1000L)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ss_join").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ss_join").select("imp_id").collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(1L))
    // the physical plan must be the stateful symmetric-hash stream join
    assert(q.lastProgress.stateOperators.nonEmpty)
  }

  test("enrich stream-static joins dimension attributes per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0),
      Event(3, ts("2024-01-01 10:02:00"), 9, "view", 3.0)) // no dim row
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("cust_id", "tier")
    val q = StreamingOps.enrich(input.toDF, dim, "user_id", "cust_id", Seq("tier"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enrich_out").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier")).toMap
    assert(rows === Map(1L -> "GOLD", 2L -> "SILVER", 3L -> null))
  }

  test("streaming sessionize closes sessions on gap and matches batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    // batch 1: user 1 opens session 1
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() === 0) // still open
    // batch 2: 45-minute gap closes session 1, opens session 2
    input.addData(Event(3, ts("2024-01-01 10:55:00"), 1, "click", 3.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[SessionUpdate].collect()
    q.stop()
    assert(closed.length === 1)
    val s = closed.head
    assert(s.user_id === 1 && s.session_id === 1)
    assert(s.n_events === 2 && s.duration_ms === 600000L && s.total_value === 3.0)
  }

  test("dedupStream drops re-arrivals of identical content across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingOps.dedupStream(
      input.toDF.toDF("doc_id", "ts", "text"), "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 10:01:00"), "  The Quick  Brown fox "), // normalized dup
      (3L, ts("2024-01-01 10:02:00"), "something else entirely"))
    q.processAllAvailable()
    // later batch, still within the watermark: dup dropped, new doc kept
    input.addData(
      (4L, ts("2024-01-01 10:10:00"), "the quick brown fox"),
      (5L, ts("2024-01-01 10:11:00"), "a third distinct document"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 5L))
  }

  test("chunked-source fixtures replay as multiple ordered micro-batches") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    def batchIds(t: graft.table.GraftTable): Seq[Long] = t.meta.snapshots
      .flatMap(_.summary.get(StreamingOps.BatchIdSummaryKey)).map(_.toLong)

    // sessionize: the 3-chunk source must commit >= 2 stamped micro-batch
    // snapshots (state carried across real batch boundaries, not one big
    // batch), and every emitted session must be a CLOSED one
    val sess = graft.queries.TableFixtures.streamSessions(spark, sf)
    val sessBatches = batchIds(sess).distinct
    assert(sessBatches.size >= 2,
      s"expected multiple micro-batches from the 3-chunk source, got $sessBatches")
    assert(sess.toDF.filter(col("n_events") < 1).count() === 0)

    // dedup: multiple batches AND exactly one survivor per distinct key
    val dd = graft.queries.TableFixtures.streamDeduped(spark, sf)
    val ddBatches = batchIds(dd).distinct
    assert(ddBatches.size >= 2,
      s"expected multiple micro-batches from the 3-chunk source, got $ddBatches")
    val keys = dd.toDF.select(
      graft.ops.Dedup.contentKey(col("text")).as("k"))
    assert(keys.count() === keys.distinct().count())
    val srcKeys = spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.ops.Dedup.contentKey(col("text")).as("k")).distinct()
    assert(keys.distinct().count() === srcKeys.count())
  }
}
