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

  test("changelog images of pre-add files carry initial defaults, not NULL (round 17)") {
    val t = GraftTable.create(spark, tmpDir("cdc-dflt"), "cdcdflt", schema)
    t.append(rows(0 until 6))                               // pre-add era
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.append(rows(6 until 8).withColumn("channel", lit("STORE")))
    t.deleteWhere(col("id") < 2)                            // CoW on pre-add rows
    val out = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, String)]()
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(t.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("_change_type"), col("id"), col("channel"))
          .collect().foreach(r =>
            out.add((r.getString(0), r.getLong(1),
              Option(r.getString(2)).getOrElse("∅")))))
      .option("checkpointLocation", tmpDir("cdc-dflt-cp"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    import scala.jdk.CollectionConverters._
    val changes = out.asScala.toSeq
    // every image of a pre-add row — INSERT carryovers and the DELETEs of
    // the CoW rewrite alike — reads the frozen initial default
    val preAdd = changes.filter(_._2 < 6)
    assert(preAdd.nonEmpty && preAdd.forall(_._3 == "WEB"),
      s"pre-add images must carry the initial default: $changes")
    assert(changes.filter(c => c._2 >= 6 && c._1 == "INSERT")
      .forall(_._3 == "STORE"))
    // file-granularity CoW: deleted rows 0,1 plus possible un-netted
    // carryover DELETE+INSERT pairs for survivors sharing their files —
    // a keyed replay must net to exactly ids 2..7
    val net = changes.groupBy(_._2).view.mapValues(cs =>
      cs.count(_._1 == "INSERT") - cs.count(_._1 == "DELETE")).toMap
    assert((0L until 8L).map(id => id -> net(id)).toMap ===
      (0L until 8L).map(id => id -> (if (id < 2) 0 else 1)).toMap,
      s"netted changelog must land on the batch state: $changes")
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

  test("Avro equality-delete commits stream as DELETE_KEY images (round 15)") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("cdc-avro"), "cdcavro", schema,
      props = Map("write.delete.format.default" -> "avro"))
    val sink = GraftTable.create(spark, tmpDir("cdc-avro-sink"), "cas", schema)
    val cp = tmpDir("cdc-avro-cp")
    def run(): Unit = spark.readStream.format("graft-stream")
      .option("changelog", "true").load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    src.append(rows(0 until 20)); run()
    src.deleteWhereMoR(col("id") % 5 === 0, Seq("id")); run()
    // the delete file is REALLY avro — the reference's declared default
    val dels = src.meta.currentSnapshot.get.deleteFiles
    assert(dels.nonEmpty && dels.forall(_.path.endsWith(".avro")), dels.map(_.path))
    src.updateWhereMoR(col("id") === 7L, Seq("v" -> lit(-1.0)), Seq("id")); run()
    def state(t: GraftTable) =
      t.toDF.as[(Long, String, Double)].collect().toSeq.sorted
    assert(state(sink) === state(src))
    assert(state(sink).nonEmpty)
  }

  test("null-safe retraction: null key values and all-null key columns replay exactly") {
    import spark.implicits._
    val nschema = StructType(Seq(
      StructField("k1", LongType), StructField("k2", StringType),
      StructField("v", DoubleType)))
    val src = GraftTable.create(spark, tmpDir("cdc-null"), "cdcnull", nschema,
      props = Map("write.delete.vector.enabled" -> "true"))
    val sink = GraftTable.create(spark, tmpDir("cdc-null-sink"), "cns", nschema)
    val cp = tmpDir("cdc-null-cp")
    def run(): Unit = spark.readStream.format("graft-stream")
      .option("changelog", "true").load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val data = Seq(
      (Some(1L), Some("a"), 1.0), (Some(2L), Option.empty[String], 2.0),
      (Some(3L), Some("c"), 3.0), (Option.empty[Long], Some("d"), 4.0),
      (Some(5L), Option.empty[String], 5.0))
      .toDF("k1", "k2", "v")
    src.append(data); run()
    // equality delete keyed on (k1, k2) matching a NULL k2 tuple: the
    // batch read removes row (2, null); the replayed sink must too
    src.deleteWhereMoR(col("k1") === 2L, Seq("k1", "k2")); run()
    // DV delete of a row with a null KEYLESS column: full-row image with
    // a null inside — whole-row null-safe match must remove it
    src.deleteWherePositional(col("v") === 5.0); run()
    def state(t: GraftTable) = t.toDF
      .select(col("k1"), col("k2"), col("v"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getDouble(2)))
      .toSeq.sortBy(_._3)
    assert(state(sink) === state(src))
    assert(state(src).map(_._3) === Seq(1.0, 3.0, 4.0))
  }

  test("_change_key carries the recorded key set even when a key column is all-null") {
    import spark.implicits._
    val nschema = StructType(Seq(
      StructField("k1", LongType), StructField("k2", StringType),
      StructField("v", DoubleType)))
    val src = GraftTable.create(spark, tmpDir("cdc-ak"), "cdcak", nschema)
    val sink = GraftTable.create(spark, tmpDir("cdc-ak-sink"), "cak", nschema)
    val cp = tmpDir("cdc-ak-cp")
    def run(): Unit = spark.readStream.format("graft-stream")
      .option("changelog", "true").load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    src.append(Seq((Some(1L), Some("x"), 1.0), (Some(1L), Option.empty[String], 2.0),
      (Some(2L), Option.empty[String], 3.0)).toDF("k1", "k2", "v"))
    run()
    // the matched tuple is (1, null): k2 is all-null in the RECORDED keys.
    // Key inference from non-null columns would retract on k1 alone and
    // over-delete (1,'x'); the recorded key list must keep it
    src.deleteWhereMoR(col("k1") === 1L && col("k2").isNull, Seq("k1", "k2"))
    run()
    def state(t: GraftTable) = t.toDF
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getDouble(2)))
      .toSeq.sortBy(_._3)
    assert(state(sink) === state(src))
    assert(state(src).map(_._3) === Seq(1.0, 3.0))
  }

  test("changelog admission control budgets removed+delete files, not just additions (round 16)") {
    val t = GraftTable.create(spark, tmpDir("cdc-rate"), "cdcrate", schema)
    t.append(rows(0 until 5).coalesce(1))     // snapshot 1: 1 file
    t.deleteWhere(col("id") < 2)              // snapshot 2: CoW -1 +1 = weight 2
    t.append(rows(100 until 105).coalesce(1)) // snapshot 3: 1 file
    val batchSnaps = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    spark.readStream.format("graft-stream").option("changelog", "true")
      .option("maxFilesPerTrigger", "3").load(t.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        batchSnaps.add(b.select("_commit_snapshot_id").distinct()
          .collect().map(_.getLong(0)).sorted.toSeq); ()
      })
      .option("checkpointLocation", tmpDir("cdc-rate-cp"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    import scala.jdk.CollectionConverters._
    val snaps = batchSnaps.asScala.toSeq.filter(_.nonEmpty)
    // budgeting only ADDED files would fit all three commits (1+1+1) in
    // one batch; the CoW commit's true cost (1 removed + 1 added) spends
    // the 3-file budget after commit 2
    assert(snaps === Seq(Seq(1L, 2L), Seq(3L)),
      s"CoW weight must exhaust the 3-file budget after commit 2; got $snaps")
  }

  test("fuzz: random CoW histories replay through the changelog stream onto the batch state (round 16)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 2) {
      // pure copy-on-write table (the reference's own delete mode): every
      // row-level commit is a file rewrite, so no masking refusal can arise
      val src = GraftTable.create(spark, tmpDir(s"cdc-fz-cow-$trial"),
        s"cfc$trial", schema)
      val sink = GraftTable.create(spark, tmpDir(s"cdc-fz-cow-sink-$trial"),
        s"cfcs$trial", schema)
      val cp = tmpDir(s"cdc-fz-cow-cp-$trial")
      def run(): Unit = spark.readStream.format("graft-stream")
        .option("changelog", "true").load(src.location)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingOps.replayChangelog(b, sink))
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      var nextId = 0L
      (1 to 10).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 =>
            val k = 1 + rnd.nextInt(8)
            src.append((nextId until nextId + k)
              .map(i => (i, s"g${rnd.nextInt(3)}", i * 1.5))
              .toDF("id", "grp", "v").repartition(1 + rnd.nextInt(2)))
            nextId += k
          case 2 =>
            val m0 = 2 + rnd.nextInt(4)
            src.deleteWhere(col("id") % m0 === rnd.nextInt(m0))
          case 3 =>
            src.updateWhere(col("id") % (2 + rnd.nextInt(4)) === 0,
              Seq("v" -> (col("v") + 10.0)))
          case 4 => // replace: row-preserving, must stay invisible
            if (src.meta.currentSnapshot.exists(_.files.size > 1))
              src.rewriteDataFilesSorted(Seq(asc("id")))
        }
        if (rnd.nextBoolean()) run() // interleave restarts mid-history
      }
      run()
      assert(sink.toDF.exceptAll(src.toDF).isEmpty &&
        src.toDF.exceptAll(sink.toDF).isEmpty,
        s"trial $trial: replayed CoW changelog diverged from the batch state")
    }
  }

  // r18 budget trim: the default run fuzzes DV-parquet and list-Avro
  // (both delete-storage axes crossed); the other two combinations are
  // tagged slow. Each trial carries its own model, so a subset is
  // self-consistent.
  test("fuzz: random MoR/DV histories replay through the changelog stream onto the batch state (round 16)") {
    morDvFuzz(Set(1, 4))
  }
  test("fuzz: MoR/DV changelog histories, remaining delete-storage combinations (slow)",
      graft.SlowTest) {
    morDvFuzz(Set(2, 3))
  }

  private def morDvFuzz(which: Set[Int]): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    for ((trial, props) <- Seq(
        1 -> Map("write.delete.vector.enabled" -> "true"),
        2 -> Map("write.delete.vector.enabled" -> "true",
          "write.delete.format.default" -> "avro"),
        // position LISTS (DV off), parquet and Avro containers — the
        // round-17 metadata-planned positional DELETE-image path
        3 -> Map.empty[String, String],
        4 -> Map("write.delete.format.default" -> "avro"))
        if which.contains(trial)) {
      val src = GraftTable.create(spark, tmpDir(s"cdc-fz-mor-$trial"),
        s"cfm$trial", schema, props = props)
      val sink = GraftTable.create(spark, tmpDir(s"cdc-fz-mor-sink-$trial"),
        s"cfms$trial", schema)
      val cp = tmpDir(s"cdc-fz-mor-cp-$trial")
      def run(): Unit = spark.readStream.format("graft-stream")
        .option("changelog", "true").load(src.location)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingOps.replayChangelog(b, sink))
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      var nextId = 0L
      (1 to 10).foreach { _ =>
        rnd.nextInt(7) match {
          case 0 | 1 =>
            val k = 1 + rnd.nextInt(8)
            src.append((nextId until nextId + k)
              .map(i => (i, s"g${rnd.nextInt(3)}", i * 1.5))
              .toDF("id", "grp", "v").repartition(1 + rnd.nextInt(2)))
            nextId += k
          case 2 =>
            val m0 = 2 + rnd.nextInt(4)
            src.deleteWhereMoR(col("id") % m0 === rnd.nextInt(m0), Seq("id"))
          case 3 =>
            src.deleteWherePositional(col("id") % (3 + rnd.nextInt(3)) === 1)
          case 4 =>
            src.updateWhereMoR(col("id") % (2 + rnd.nextInt(4)) === 0,
              Seq("v" -> (col("v") + 100.0)), Seq("id"))
          // round 17: CoW rewrites interleave with pending MoR deletes —
          // the masked DELETE-image path must compose with everything
          case 5 =>
            val m0 = 2 + rnd.nextInt(4)
            src.deleteWhere(col("id") % m0 === rnd.nextInt(m0))
          case 6 =>
            src.updateWhere(col("id") % (2 + rnd.nextInt(4)) === 1,
              Seq("v" -> (col("v") - 7.0)))
        }
        if (rnd.nextBoolean()) run()
      }
      run()
      assert(sink.toDF.exceptAll(src.toDF).isEmpty &&
        src.toDF.exceptAll(sink.toDF).isEmpty,
        s"trial $trial: replayed MoR/DV changelog diverged from the batch state")
    }
  }

  test("position-LIST delete commits stream DELETE images; masked CoW streams (round 17)") {
    val t = GraftTable.create(spark, tmpDir("cdc-ref"), "cdcref", schema)
    t.append(rows(0 until 10))
    t.deleteWherePositional(col("id") < 2) // row-list commit (DV off)
    val plId = t.meta.currentSnapshot.get.id
    val plChanges = collectChanges(t.location, tmpDir("cdc-ref-cp"))
    val plDels = plChanges.filter(c => c._1 == "DELETE" && c._2 == plId)
      .map(_._3).sorted
    assert(plDels === Seq(0L, 1L),
      s"position-list DELETE images must be the exact deleted rows: $plDels")
    // a CoW rewrite of files that older MoR deletes still apply to
    // (round 17 — was a round-16 refusal): the DELETE images must
    // exclude the equality-masked row 3
    val t2 = GraftTable.create(spark, tmpDir("cdc-cow-mixed"), "cdccowm", schema)
    t2.append(rows(0 until 10).coalesce(1))
    t2.deleteWhereMoR(col("id") === 3L, Seq("id")) // pending equality delete
    t2.deleteWhere(col("id") < 2)                  // CoW rewrite of the same file
    val cowId = t2.meta.currentSnapshot.get.id
    val changes = collectChanges(t2.location, tmpDir("cdc-cow-mixed-cp"))
    val cowDels = changes.filter(c => c._1 == "DELETE" && c._2 == cowId)
      .map(_._3).sorted
    assert(cowDels === (0L until 10L).filterNot(_ == 3L),
      s"equality-masked CoW DELETE images must exclude the dead row: $cowDels")
  }

  test("CoW delete/update commits stream DELETE+INSERT images that replay to the batch state (round 16)") {
    import spark.implicits._
    // plain table, no DV, no MoR: every row-level commit is a file rewrite —
    // the reference's own write.delete.mode=copy-on-write shape
    val src = GraftTable.create(spark, tmpDir("cdc-cow-src"), "cdccowsrc", schema)
    val sink = GraftTable.create(spark, tmpDir("cdc-cow-sink"), "ccs", schema)
    val cp = tmpDir("cdc-cow-cp2")
    def run(): Unit = spark.readStream.format("graft-stream")
      .option("changelog", "true").load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    src.append(rows(0 until 40)); run()
    src.deleteWhere(col("id") % 7 === 3); run()       // CoW delete
    src.append(rows(100 until 120)); run()
    src.updateWhere(col("id") === 101L, Seq("v" -> lit(999.0))); run()
    // a full-file CoW delete: removed file, NO added files
    src.deleteWhere(col("grp") === "g1"); run()
    // a no-op CoW delete (matches nothing) streams zero images
    src.deleteWhere(col("id") === -1L); run()
    def state(t: GraftTable) =
      t.toDF.as[(Long, String, Double)].collect().toSeq.sorted
    assert(state(sink) === state(src))
    assert(state(sink).nonEmpty)
    assert(state(src).exists(r => r._1 == 101L && r._3 == 999.0))
  }

  test("partitioned CoW images carry the partition column values (driver-attached, not in the files)") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("cdc-cow-part"), "cdccowp",
      schema, partitionCols = Seq("grp"))
    val sink = GraftTable.create(spark, tmpDir("cdc-cow-part-sink"), "ccps", schema)
    val cp = tmpDir("cdc-cow-part-cp")
    def run(): Unit = spark.readStream.format("graft-stream")
      .option("changelog", "true").load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    src.append(rows(0 until 30)); run()
    // CoW delete rewrites files in TWO partitions (odd ids land in every
    // grp); the DELETE images' grp values come from the partition
    // directories, not the data pages
    src.deleteWhere(col("id") % 2 === 1 && col("grp").isin("g0", "g1")); run()
    def state(t: GraftTable) =
      t.toDF.as[(Long, String, Double)].collect().toSeq.sorted
    assert(state(sink) === state(src))
    assert(state(src).nonEmpty && !state(src).exists(r => r._1 % 2 == 1 &&
      (r._2 == "g0" || r._2 == "g1")))
  }

  test("CoW rewrite streams when pending DVs target OTHER files; masks on actual overlap (round 17)") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("cdc-cow-dv"), "cdccowdv", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    val sink = GraftTable.create(spark, tmpDir("cdc-cow-dv-sink"), "ccds", schema)
    src.append(rows(0 until 10).coalesce(1))    // file A
    src.append(rows(100 until 110).coalesce(1)) // file B
    src.deleteWherePositional(col("id") === 105L) // DV targets B only
    src.deleteWhere(col("id") === 3L)             // CoW rewrite of A
    val cp = tmpDir("cdc-cow-dv-cp")
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    def state(t: GraftTable) =
      t.toDF.as[(Long, String, Double)].collect().toSeq.sorted
    assert(state(sink) === state(src),
      "a DV on an unrelated file must not block CoW streaming")
    assert(!state(src).exists(r => r._1 == 3L || r._1 == 105L))
    // the DV'd file itself CoW-rewritten (round 17 — was a refusal):
    // the DELETE images must EXCLUDE the DV-masked row 105, which was
    // already retracted when the DV commit streamed
    src.deleteWhere(col("id") === 106L)
    val changes = collectChanges(src.location, tmpDir("cdc-cow-dv-cp2"))
    val cowId = src.meta.currentSnapshot.get.id
    val cowDels = changes.filter(c => c._1 == "DELETE" && c._2 == cowId)
      .map(_._3).sorted
    assert(cowDels === (100L until 110L).filterNot(_ == 105L),
      s"masked CoW DELETE images must exclude the DV'd row: $cowDels")
  }

  test("masked CoW streams exact images when an equality delete AND a DV hit the same file (round 17)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("cdc-maskmix"), "cdcmm", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    val sink = GraftTable.create(spark, tmpDir("cdc-maskmix-sink"), "cdcmms",
      schema)
    t.append(rows(0 until 20).coalesce(1))        // one file
    t.deleteWherePositional(col("id") === 4L)     // DV on the file
    t.deleteWhereMoR(col("id") >= 18L, Seq("id")) // equality on the file
    t.deleteWhere(col("id") % 2 === 1L)           // CoW rewrite of the file
    val cp = tmpDir("cdc-maskmix-cp")
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(t.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    def state(x: GraftTable) =
      x.toDF.as[(Long, String, Double)].collect().toSeq.sorted
    assert(state(sink) === state(t),
      "replay through DV+equality masks must land on the batch state")
    assert(state(t).map(_._1) ===
      (0L until 20L).filter(i => i % 2 == 0 && i != 4L && i < 18L))
  }

  test("positional/DV delete commits record their target paths in metadata; equality does not (round 17)") {
    val t = GraftTable.create(spark, tmpDir("cdc-tp"), "cdctp", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    t.append(rows(0 until 10).coalesce(1))   // file A
    t.append(rows(100 until 110).coalesce(1)) // file B
    val dataPaths = t.meta.currentSnapshot.get.files.map(_.path).toSet
    t.deleteWherePositional(col("id") === 3L || col("id") === 105L)
    val dv = t.meta.currentSnapshot.get.deleteFiles.filter(_.isDv)
    assert(dv.nonEmpty)
    assert(dv.flatMap(_.targetPaths).toSet === dataPaths,
      "DV targets must be the two hit data files, data-dir-relative")
    t.deleteWhereMoR(col("id") === 7L, Seq("id"))
    val eq = t.meta.currentSnapshot.get.deleteFiles
      .filter(d => d.seq == t.meta.currentSnapshot.get.id)
    assert(eq.nonEmpty && eq.forall(_.targetPaths.isEmpty),
      "equality deletes apply by the sequence rule; no targets recorded")
    // over-cap commits record nothing and stay on the read-fallback path
    val t2 = GraftTable.create(spark, tmpDir("cdc-tp0"), "cdctp0", schema,
      props = Map("write.delete.vector.enabled" -> "true",
        "write.delete.max-recorded-targets" -> "0"))
    t2.append(rows(0 until 10).coalesce(1))
    t2.deleteWherePositional(col("id") === 3L)
    assert(t2.meta.currentSnapshot.get.deleteFiles
      .forall(_.targetPaths.isEmpty))
  }

  test("masked-CoW check and DV fan-out plan from metadata: zero delete-content reads (round 17)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("cdc-zeroread"), "cdczr", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    t.append(rows(0 until 10).coalesce(1))    // file A
    t.append(rows(100 until 110).coalesce(1)) // file B
    t.deleteWherePositional(col("id") === 105L) // DV targets B only
    val fromId = t.meta.currentSnapshot.get.id
    t.deleteWhere(col("id") === 3L)             // CoW rewrite of A
    // PROOF the masked check is metadata-only: physically remove the DV
    // parquet — a planner that still read delete content would now fail
    val delDir = new java.io.File(
      t.location.stripPrefix("file:") + "/data/_deletes")
    val removed = delDir.listFiles.filter(_.getName.startsWith("dv-"))
    assert(removed.nonEmpty)
    removed.foreach(f => assert(f.delete()))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.readStream.format("graft-stream").option("changelog", "true")
      .option("fromSnapshotId", fromId.toString)
      .load(t.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("_change_type"), col("id")).collect()
          .foreach(r => out.add((r.getString(0), r.getLong(1)))))
      .option("checkpointLocation", tmpDir("cdc-zeroread-cp"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    import scala.jdk.CollectionConverters._
    val changes = out.asScala.toSeq
    val dels = changes.filter(_._1 == "DELETE").map(_._2).sorted
    val ins = changes.filter(_._1 == "INSERT").map(_._2).sorted
    // un-netted CoW carryovers: file A's 10 rows DELETE, 9 survivors INSERT
    assert(dels === (0L until 10L), s"dels=$dels")
    assert(ins === (0L until 10L).filterNot(_ == 3L), s"ins=$ins")
  }

  test("DV DELETE images execute through the metadata-planned executor-side vector read (round 17)") {
    val t = GraftTable.create(spark, tmpDir("cdc-dvexec"), "cdcdvex", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    t.append(rows(0 until 20).repartition(3)) // several files
    t.deleteWherePositional(col("id") % 5 === 0)
    val dv = t.meta.currentSnapshot.get.deleteFiles.filter(_.isDv)
    assert(dv.nonEmpty && dv.forall(_.targetPaths.nonEmpty),
      "this test must exercise the metadata-planned path")
    val changes = collectChanges(t.location, tmpDir("cdc-dvexec-cp"))
    val dels = changes.filter(_._1 == "DELETE").map(_._3).sorted
    assert(dels === (0L until 20L).filter(_ % 5 == 0),
      "executor-side vector reads must select exactly the deleted positions")
  }

  test("CoW changelog fails loudly when the parent snapshot expired (DELETE images unrecoverable)") {
    val t = GraftTable.create(spark, tmpDir("cdc-cow-exp"), "cdccowexp", schema)
    t.append(rows(0 until 10).coalesce(1))     // s1
    t.deleteWhere(col("id") < 3)               // s2: CoW, parent s1
    t.append(rows(100 until 105).coalesce(1))  // s3
    val future = System.currentTimeMillis() + 3600L * 1000
    t.expireSnapshots(olderThanMs = future, retainLast = 2, nowMs = future) // s1 gone
    assert(t.meta.snapshot(1L).isEmpty, "fixture: s1 must have expired")
    val e = intercept[Exception] {
      collectChanges(t.location, tmpDir("cdc-cow-exp-cp"))
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).toSeq
    assert(msgs.exists(_.contains("no longer retained")),
      s"an expired parent must fail loudly, not drop DELETE images: $msgs")
  }

  test("changelog streams across a rename: era files and old-name DELETE_KEYs map forward (round 16)") {
    import spark.implicits._
    val src = GraftTable.create(spark, tmpDir("cdc-era"), "cdcera", schema)
    src.append(rows(0 until 10).coalesce(1))          // era 0 (column: id)
    src.deleteWhere(col("id") === 5L)                 // CoW on the era-0 file
    src.deleteWhereMoR(col("id") === 2L, Seq("id"))   // key recorded as "id"
    src.renameColumn("id", "doc_id")
    src.append(rows(100 until 105).coalesce(1)
      .withColumnRenamed("id", "doc_id"))             // era 1 (column: doc_id)
    src.deleteWhereMoR(col("doc_id") === 101L, Seq("doc_id"))
    val sinkSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("grp", StringType),
      StructField("v", DoubleType)))
    val sink = GraftTable.create(spark, tmpDir("cdc-era-sink"), "ces", sinkSchema)
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(src.location)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.replayChangelog(b, sink))
      .option("checkpointLocation", tmpDir("cdc-era-cp"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    def state(t: GraftTable) = t.toDF
      .select(col("doc_id"), col("grp"), col("v"))
      .as[(Long, String, Double)].collect().toSeq.sorted
    assert(state(sink) === state(src),
      "era-0 images must map to the current column names; the pre-rename " +
        "DELETE_KEY must retract under doc_id")
    assert(!state(src).exists(r => r._1 == 2L || r._1 == 5L || r._1 == 101L))
    assert(state(src).exists(_._1 == 100L))
  }

  test("changelog streams across a key-type promotion: pre-promotion tuples upcast per value (round 17)") {
    import spark.implicits._
    // key recorded as INT, column later promoted to BIGINT: the recorded
    // tuples must decode under the era type and upcast — was a refusal
    for ((tag, props) <- Seq(
        "parquet" -> Map.empty[String, String],
        "avro" -> Map("write.delete.format.default" -> "avro"))) {
      val intSchema = StructType(Seq(
        StructField("id", IntegerType), StructField("grp", StringType),
        StructField("v", DoubleType)))
      val src = GraftTable.create(spark, tmpDir(s"cdc-promo-$tag"),
        s"cdcpromo$tag", intSchema, props = props)
      src.append((0 until 10).map(i => (i, s"g${i % 3}", i * 1.5))
        .toDF("id", "grp", "v").coalesce(1))
      src.deleteWhereMoR(col("id") === 2, Seq("id")) // key tuple stored INT
      src.updateColumnType("id", LongType)
      src.append(Seq((4294967300L, "g0", 1.0)).toDF("id", "grp", "v"))
      val sinkSchema = StructType(Seq(
        StructField("id", LongType), StructField("grp", StringType),
        StructField("v", DoubleType)))
      val sink = GraftTable.create(spark, tmpDir(s"cdc-promo-sink-$tag"),
        s"cps$tag", sinkSchema)
      spark.readStream.format("graft-stream").option("changelog", "true")
        .load(src.location)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingOps.replayChangelog(b, sink))
        .option("checkpointLocation", tmpDir(s"cdc-promo-cp-$tag"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      def state(t: GraftTable) =
        t.toDF.as[(Long, String, Double)].collect().toSeq.sorted
      assert(state(sink) === state(src),
        s"[$tag] pre-promotion DELETE_KEY must retract id=2 as a BIGINT")
      assert(!state(src).exists(_._1 == 2L))
      assert(state(src).exists(_._1 == 4294967300L))
      // the masked-CoW path through the same era upcast: rewrite the
      // era-0 file while the INT-recorded equality delete still applies
      src.deleteWhere(col("id") === 5L)
      val cowId = src.meta.currentSnapshot.get.id
      val changes = collectChanges(src.location, tmpDir(s"cdc-promo-cp2-$tag"))
      val cowDels = changes.filter(c => c._1 == "DELETE" && c._2 == cowId)
        .map(_._3).sorted
      assert(cowDels === (0L until 10L).filterNot(_ == 2L),
        s"[$tag] masked CoW images must exclude the INT-era-keyed dead row: $cowDels")
    }
  }

  test("CoW images carry exact DELETE pre-images and INSERT post-images per commit") {
    val t = GraftTable.create(spark, tmpDir("cdc-cow-img"), "cdccowimg", schema)
    t.append(rows(0 until 30).coalesce(1)) // single file: the rewrite touches all 30 rows
    t.deleteWhere(col("id") < 5) // CoW: rewrites the file, drops 5 rows
    val changes = collectChanges(t.location, tmpDir("cdc-cow-img-cp"))
    val delSnap = changes.filter(_._1 == "DELETE").map(_._2).distinct
    assert(delSnap.size === 1, "all DELETE images belong to the CoW commit")
    val byType = changes.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    // file-granularity images: the rewritten file's 30 rows are DELETEs,
    // the surviving 25 re-emit as INSERTs in the same commit (carryovers) —
    // plus the original append's 30 INSERTs from commit 1
    assert(byType("DELETE") === (0L until 30L))
    assert(byType("INSERT").diff(0L until 30L) === (5L until 30L))
    // keyed net per commit = the batch answer: deletes minus re-inserts
    val cowId = delSnap.head
    val netGone = byType("DELETE").diff(
      changes.filter(c => c._1 == "INSERT" && c._2 == cowId).map(_._3))
    assert(netGone === (0L until 5L))
  }
}
