package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.GraftTable

/**
 * `readStream.format("graft-stream")`: micro-batch tailing of the
 * append log — incremental batches within a run, exactly-once across
 * restarts via checkpointed snapshot-id offsets, partition values from
 * the snapshot log, compaction invisibility, and the append-only
 * contract on row-changing snapshots.
 */
class GraftStreamSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(name: String, parts: Seq[String] = Seq.empty): GraftTable =
    GraftTable.create(spark, tmpDir(s"gss-$name"), name, StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType))), parts)

  test("incremental micro-batches within one run; memory sink sees each append once") {
    val t = freshTable("inc")
    t.append(Seq((1L, "a"), (2L, "a")).toDF("id", "grp"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_inc").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_inc").count() === 2)
      t.append(Seq((3L, "b")).toDF("id", "grp"))
      q.processAllAvailable()
      val rows = spark.table("gss_inc").orderBy("id").as[(Long, String)].collect()
      assert(rows.toSeq === Seq((1L, "a"), (2L, "a"), (3L, "b")))
    } finally q.stop()
  }

  test("exactly-once across restarts: checkpointed offsets resume after the last snapshot") {
    val t = freshTable("restart")
    t.append((1L to 5L).map((_, "x")).toDF("id", "grp"))
    val out = tmpDir("gss-out")
    val cp = tmpDir("gss-cp")
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-stream").load(t.location)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 5)
    t.append((6L to 8L).map((_, "y")).toDF("id", "grp"))
    runOnce()
    // 5 + 3, nothing re-emitted
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 8L))
    // no new data -> a third run emits nothing
    runOnce()
    assert(spark.read.parquet(out).count() === 8)
  }

  test("partition values come from the snapshot log, typed") {
    val t = GraftTable.create(spark, tmpDir("gss-part"), "gp", StructType(Seq(
      StructField("id", LongType), StructField("d", DateType))), Seq("d"))
    val day = java.sql.Date.valueOf("2024-03-05")
    val day2 = java.sql.Date.valueOf("2024-03-06")
    t.append(Seq((1L, day), (2L, day2)).toDF("id", "d"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_part").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gss_part").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getDate(1).toString))
      assert(got.toSeq === Seq((1L, "2024-03-05"), (2L, "2024-03-06")))
    } finally q.stop()
  }

  test("identity partition columns align with the declared schema when spec order differs") {
    // PARTITIONED BY (grp, d) on schema (id, d, v, grp): the reader emits
    // rows positionally as dataCols ++ partSchema — if partSchema followed
    // SPEC order (grp, d) while the table schema follows DECLARED order
    // (d, grp), the same-typed columns would swap silently
    val t = GraftTable.create(spark, tmpDir("gss-order"), "gorder",
      StructType(Seq(
        StructField("id", LongType), StructField("d", StringType),
        StructField("v", LongType), StructField("grp", StringType))),
      Seq("grp", "d"))
    t.append(Seq((1L, "day1", 10L, "alpha"), (2L, "day2", 20L, "beta"))
      .toDF("id", "d", "v", "grp"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_order").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gss_order").orderBy("id")
        .collect().map(r => (r.getLong(r.fieldIndex("id")),
          r.getString(r.fieldIndex("d")), r.getLong(r.fieldIndex("v")),
          r.getString(r.fieldIndex("grp"))))
      assert(got.toSeq === Seq((1L, "day1", 10L, "alpha"),
        (2L, "day2", 20L, "beta")))
    } finally q.stop()
  }

  test("compaction is invisible; row-changing snapshots fail unless opted out") {
    val t = freshTable("compact")
    t.append(Seq((1L, "a")).toDF("id", "grp"))
    t.append(Seq((2L, "a")).toDF("id", "grp"))
    t.rewriteDataFilesSorted(Seq(asc("id"))) // replace snapshot: skipped
    t.append(Seq((3L, "a")).toDF("id", "grp"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_cpt").start()
    try {
      q.processAllAvailable()
      // the compaction re-wrote rows 1,2 but the stream must not re-emit them
      assert(spark.table("gss_cpt").select("id").as[Long].collect().sorted.toSeq
        === Seq(1L, 2L, 3L))
    } finally q.stop()

    t.deleteWhere(col("id") === 1L) // row-changing overwrite commit
    t.append(Seq((4L, "b")).toDF("id", "grp"))
    val fail = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_fail").start()
    try {
      val e = intercept[Exception](fail.processAllAvailable())
      assert(e.getMessage != null)
    } finally fail.stop()
    // opted out: delete ignored, appends stream through
    val skip = spark.readStream.format("graft-stream")
      .option("skipOverwriteSnapshots", "true").load(t.location)
      .writeStream.format("memory").queryName("gss_skip").start()
    try {
      skip.processAllAvailable()
      assert(spark.table("gss_skip").select("id").as[Long].collect().sorted.toSeq
        === Seq(1L, 2L, 3L, 4L))
    } finally skip.stop()
  }

  test("maxSnapshotsPerTrigger bounds each micro-batch; catch-up proceeds in bites") {
    val t = freshTable("rate")
    (1L to 3L).foreach(i => t.append(Seq((i, "a")).toDF("id", "grp")))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-stream")
      .option("maxSnapshotsPerTrigger", "1").load(t.location)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.select("id").collect().map(_.getLong(0))
        // one snapshot per batch = exactly one row here
        assert(ids.length === 1, s"batch carried ${ids.length} snapshots of rows")
        ids.foreach(rows.add)
        batches.incrementAndGet(); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.get() === 3, s"expected 3 rate-limited batches, got ${batches.get()}")
    assert(rows.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("schema-evolution eras stream: renamed and type-promoted files read era-aware (round 16)") {
    val t = GraftTable.create(spark, tmpDir("gss-era"), "gss_era", StructType(Seq(
      StructField("id", IntegerType), StructField("grp", StringType))))
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "grp"))      // era 0: int id, grp
    t.renameColumn("grp", "category")
    t.append(Seq((3, "c")).toDF("id", "category"))           // era 1: int id, category
    t.updateColumnType("id", LongType)
    t.append(Seq((2147483650L, "d")).toDF("id", "category")) // era 2: long id
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_era").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("gss_era").orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(rows === Seq((1L, "a"), (2L, "b"), (3L, "c"), (2147483650L, "d")),
        "all three eras must read under the current names and types " +
          "(pre-promotion INT32 pages upcast; pre-rename columns map forward)")
    } finally q.stop()
  }

  test("initial defaults stream: pre-add files emit the frozen default, not NULL (round 17)") {
    val t = GraftTable.create(spark, tmpDir("gss-dflt"), "gss_dflt",
      StructType(Seq(StructField("id", LongType), StructField("grp", StringType))))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "grp")) // pre-add era
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.append(Seq((3L, "c", "STORE")).toDF("id", "grp", "channel"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_dflt").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("gss_dflt").orderBy("id")
        .select("id", "channel").as[(Long, String)].collect().toSeq
      assert(rows === Seq((1L, "WEB"), (2L, "WEB"), (3L, "STORE")),
        "a stream pinning the post-add schema must read pre-add files " +
          "through the initial default, batch parity")
    } finally q.stop()
  }

  test("partitioned era table streams: freshness check is order-insensitive to the partition-cols-last pin") {
    // declared order (id, grp, v) with grp partitioned: the stream pins
    // (id, v, grp) — an element-wise schema comparison would brick this
    val t = GraftTable.create(spark, tmpDir("gss-era-p"), "gss_era_p",
      StructType(Seq(StructField("id", LongType), StructField("grp", StringType),
        StructField("v", DoubleType))), partitionCols = Seq("grp"))
    t.append(Seq((1L, "a", 1.0)).toDF("id", "grp", "v"))
    t.renameColumn("v", "w")
    t.append(Seq((2L, "b", 2.0)).toDF("id", "grp", "w"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_era_p").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("gss_era_p").orderBy("id")
        .select("id", "grp", "w").as[(Long, String, Double)].collect().toSeq
      assert(rows === Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    } finally q.stop()
  }

  test("additive widening under a running era stream keeps streaming; only pinned-column changes demand a restart") {
    val t = freshTable("era-widen")
    t.append(Seq((1L, "a")).toDF("id", "grp"))
    t.renameColumn("grp", "category") // era table BEFORE the query starts
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_era_widen").start()
    try {
      q.processAllAvailable()
      t.append(Seq((2L, "b", 9.0)).toDF("id", "category", "extra")) // widens
      q.processAllAvailable() // pinned columns all readable: no restart demand
      val rows = spark.table("gss_era_widen").orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(rows === Seq((1L, "a"), (2L, "b")))
    } finally q.stop()
  }

  test("a rename landing UNDER a running stream fails loudly instead of reading silent nulls") {
    val t = freshTable("era-live")
    t.append(Seq((1L, "a")).toDF("id", "grp"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_era_live").start()
    try {
      q.processAllAvailable()
      t.renameColumn("grp", "category")
      t.append(Seq((2L, "b")).toDF("id", "category"))
      val e = intercept[Exception](q.processAllAvailable())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).toSeq
      assert(msgs.exists(_.contains("restart the stream")), msgs)
    } finally q.stop()
  }

  test("a DROP COLUMN landing UNDER a running stream fails loudly (tombstone-only history)") {
    // drop records only a tombstone — no rename/type-change entry — so a
    // gate on those lists would stream the pinned dropped column as
    // silent nulls; the freshness check must run unconditionally
    val t = freshTable("era-drop-live")
    t.append(Seq((1L, "a")).toDF("id", "grp"))
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_era_drop").start()
    try {
      q.processAllAvailable()
      t.dropColumn("grp")
      t.append(Seq(Tuple1(2L)).toDF("id"))
      val e = intercept[Exception](q.processAllAvailable())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).toSeq
      assert(msgs.exists(_.contains("restart the stream")), msgs)
    } finally q.stop()
  }

  test("fuzz: random append/compaction interleavings stream exactly the table contents") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val t = freshTable(s"fuzz$trial")
      val out = tmpDir(s"gss-fuzz-out$trial")
      val cp = tmpDir(s"gss-fuzz-cp$trial")
      def tail(): Unit = {
        val q = spark.readStream.format("graft-stream").load(t.location)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      var nextId = 0L
      (1 to 6).foreach { _ =>
        if (rnd.nextInt(4) == 0 && t.meta.currentSnapshot.exists(_.files.size > 1))
          t.rewriteDataFilesSorted(Seq(asc("id"))) // replace: must stay invisible
        else {
          val k = 1 + rnd.nextInt(5)
          t.append((nextId until nextId + k).map((_, s"g${rnd.nextInt(3)}"))
            .toDF("id", "grp").repartition(1 + rnd.nextInt(3)))
          nextId += k
        }
        if (rnd.nextBoolean()) tail() // interleave restarts mid-history
      }
      tail()
      val streamed = spark.read.parquet(out).select("id").as[Long].collect().sorted
      assert(streamed.toSeq === (0L until nextId),
        s"trial $trial: stream diverged from the append log")
    }
  }

  test("branch option tails a staging branch head, not main (continuous WAP audit)") {
    val t = freshTable("branch")
    t.append(Seq((1L, "pub")).toDF("id", "grp"))
    // stage rows on a branch; main does not move
    t.createOrReplaceBranch("staging")
    t.append(Seq((2L, "staged")).toDF("id", "grp"), branch = Some("staging"))
    t.append(Seq((3L, "staged")).toDF("id", "grp"), branch = Some("staging"))
    val q = spark.readStream.format("graft-stream")
      .option("branch", "staging").load(t.location)
      .writeStream.format("memory").queryName("gss_branch").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_branch").select("id").as[Long].collect().sorted.toSeq
        === Seq(1L, 2L, 3L))
    } finally q.stop()
    // main stream sees only the published row
    val qm = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_main").start()
    try {
      qm.processAllAvailable()
      assert(spark.table("gss_main").select("id").as[Long].collect().toSeq === Seq(1L))
    } finally qm.stop()
    // unknown branch fails loudly
    val bad = spark.readStream.format("graft-stream")
      .option("branch", "nope").load(t.location)
      .writeStream.format("memory").queryName("gss_bad").start()
    try intercept[Exception](bad.processAllAvailable())
    finally bad.stop()
  }

  test("fromSnapshotId starts the stream mid-history; batch read of the stream format is refused") {
    val t = freshTable("from")
    t.append(Seq((1L, "a")).toDF("id", "grp"))
    val firstSnap = t.meta.currentSnapshotId.get
    t.append(Seq((2L, "a")).toDF("id", "grp"))
    val q = spark.readStream.format("graft-stream")
      .option("fromSnapshotId", firstSnap.toString).load(t.location)
      .writeStream.format("memory").queryName("gss_from").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_from").select("id").as[Long].collect().toSeq === Seq(2L))
    } finally q.stop()
    intercept[Exception](
      spark.read.format("graft-stream").load(t.location).collect())
  }

  test("streams a transform-partitioned table (source columns live in the files)") {
    import java.sql.Timestamp
    val t = GraftTable.create(spark, tmpDir("gss-hp"), "gss_hp", StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType))),
      Seq("days(ts)", "bucket(4, id)"))
    def ts(h: Int) = Timestamp.from(
      java.time.Instant.parse("2024-03-01T00:00:00Z").plusSeconds(h * 3600L))
    t.append(Seq((1L, ts(0)), (2L, ts(30))).toDF("id", "ts"))
    // transform dirs (ts_day=..., id_bucket_4=...) are DERIVED — the
    // source columns are in the data files; the stream must not try to
    // resolve 'days(ts)' as a schema field
    val q = spark.readStream.format("graft-stream").load(t.location)
      .writeStream.format("memory").queryName("gss_hp").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gss_hp").orderBy("id")
        .as[(Long, Timestamp)].collect().toSeq
      assert(got === Seq((1L, ts(0)), (2L, ts(30))))
    } finally q.stop()
  }
}
