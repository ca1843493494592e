package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table._
import graft.apps.ActivityData
/** Manual end-to-end drive of the public GraftTable API (verification harness). */
object DriveApp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.extensions","graft.GraftSparkExtensions")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val loc = java.nio.file.Files.createTempDirectory("drive").toString + "/activity"
    val t = GraftTable.create(spark, loc, "finance.activity", ActivityData.schema, Seq("txn_date"), ActivityData.tableProps)
    Seq(ActivityData.day1(spark), ActivityData.day2(spark), ActivityData.day3(spark), ActivityData.day4(spark), ActivityData.day5(spark)).zipWithIndex.foreach { case (d, i) => t.merge(d, Seq("txn_id"), ActivityData.updateCols); t.createOrReplaceBranch(s"day${i+1}") }
    println("== per-branch counts (expect 15,30,45,47,50): " + (1 to 5).map(i => t.asOf(s"day$i").count()).mkString(","))
    println("== flagship group-by:")
    t.toDF.groupBy("account").agg(count(lit(1)).as("activity_count")).orderBy("account").show()
    println("== txn10 as of day1 vs latest:")
    t.asOf("day1").filter(col("txn_id")==="txn10").select("txn_id","category","amount").show()
    t.toDF.filter(col("txn_id")==="txn10").select("txn_id","category","amount").show()
    println("== WAP: stage bad batch on branch, audit, reject")
    spark.conf.set("spark.graft.wap.branch", "audit_branch")
    t.append(ActivityData.badBatch(spark))
    val staged = t.toDF.count()
    val nulls = t.toDF.filter(t.schema.fieldNames.map(col(_).isNull).reduce(_ || _)).count()
    spark.conf.unset("spark.graft.wap.branch")
    println(s"staged-visible-count=$staged nulls=$nulls mainCount=${t.toDF.count()}")
    if (nulls > 0) t.dropBranch("audit_branch")
    println(s"after reject: main=${t.toDF.count()} refs=${t.meta.refs.keySet}")
    println("== probe: unknown ref")
    try t.asOf("nope") catch { case e: IllegalArgumentException => println("unknown-ref error: " + e.getMessage) }
    println("== probe: double create")
    try GraftTable.create(spark, loc, "x", ActivityData.schema) catch { case e: IllegalArgumentException => println("double-create error: " + e.getMessage) }
    println("== probe: partition-pruned scan plan (filter on txn_date):")
    val plan = t.toDF.filter(col("txn_date")===lit("2024-03-02").cast("date")).queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(l => l.contains("Scan") || l.contains("PartitionFilters") || l.contains("PushedFilters")).mkString("\n").take(1200))
    println("== CTAS schema-clone (createLike) + foreach action")
    val stage = GraftTable.createLike(t, loc + "-tmp", "finance.activity_tmp")
    println(s"createLike empty=${stage.toDF.count()} schemaEq=${stage.schema == t.schema} partEq=${stage.partitionCols == t.partitionCols}")
    stage.append(ActivityData.day1(spark))
    val fe = spark.sparkContext.longAccumulator("fe")
    stage.toDF.foreach(r => fe.add(1))
    println(s"staged=${stage.toDF.count()} foreach-visited=${fe.value}")
    GraftTable.drop(spark, loc + "-tmp")
    println("== maintenance: expire + orphans + sort compaction")
    t.dropBranch("day1")
    println("expired=" + t.expireSnapshots(System.currentTimeMillis()+1000, 3))
    println("orphans=" + t.removeOrphanFiles(dryRun=true))
    t.rewriteDataFilesSorted(Seq(asc_nulls_last("account"), desc_nulls_first("txn_id")))
    println("post-compaction count=" + t.toDF.count() + " files=" + t.meta.currentSnapshot.get.files.size)
    println("metadata: history=" + t.history.count() + " snapshots=" + t.snapshotsDF.count())
    println("== SQL catalog: VERSION AS OF through spark.sql")
    val wh = java.nio.file.Files.createTempDirectory("drive-wh").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val ct = GraftTable.create(spark, s"$wh/fin/act", "fin.act",
      ActivityData.schema, ActivityData.partitionCols)
    ct.append(ActivityData.day1(spark)); ct.createOrReplaceBranch("d1")
    ct.append(ActivityData.day2(spark))
    println("sql current=" + spark.sql("SELECT count(*) FROM graft.fin.act").collect().head.getLong(0)
      + " asof-d1=" + spark.sql("SELECT count(*) FROM graft.fin.act VERSION AS OF 'd1'").collect().head.getLong(0))
    println("== SQL write: INSERT INTO commits an append snapshot")
    spark.sql("INSERT INTO graft.fin.act (account, txn_date, txn_id, merchant, amount, category, last_updated) " +
      "SELECT 'acc9', DATE'2024-03-02', 'txn99', 'M', 1.0, 'C', TIMESTAMP'2024-03-02 00:00:00'")
    println("post-insert count=" + spark.sql("SELECT count(*) FROM graft.fin.act").collect().head.getLong(0)
      + " snapshots=" + ct.snapshotsDF.count())
    println("== SQL write: CORTAS staging idiom + versioned INSERT OVERWRITE")
    spark.sql("CREATE OR REPLACE TABLE graft.fin.act_tmp AS SELECT * FROM graft.fin.act LIMIT 0")
    println("cortas-limit0 rows=" + spark.sql("SELECT count(*) FROM graft.fin.act_tmp").collect().head.getLong(0)
      + " schemaEq=" + (spark.table("graft.fin.act_tmp").schema == spark.table("graft.fin.act").schema))
    spark.sql("INSERT OVERWRITE graft.fin.act_tmp SELECT * FROM graft.fin.act LIMIT 1")
    val tmpT = GraftTable.load(spark, s"$wh/fin/act_tmp")
    println("overwrite rows=" + spark.sql("SELECT count(*) FROM graft.fin.act_tmp").collect().head.getLong(0)
      + " ops=" + tmpT.snapshotsDF.orderBy("snapshot_id").collect().map(_.getAs[String]("operation")).mkString(","))
    spark.sql("DROP TABLE graft.fin.act_tmp")
    println("== SQL write: DELETE FROM runs the CoW commit")
    spark.sql("DELETE FROM graft.fin.act WHERE txn_id = 'txn99'")
    println("post-delete count=" + spark.sql("SELECT count(*) FROM graft.fin.act").collect().head.getLong(0))
    println("== SQL write: UPDATE SET runs the CoW rewrite")
    spark.sql("UPDATE graft.fin.act SET amount = amount + 0.5 WHERE account = 'acc1'")
    println("post-update acc1-sum=" + spark.sql("SELECT round(sum(amount),1) FROM graft.fin.act WHERE account='acc1'").collect().head.getDouble(0))
    println("== CALL maintenance procedures through the catalog")
    val rw = spark.sql("CALL graft.system.rewrite_data_files(table => 'fin.act', strategy => 'sort', sort_order => 'account ASC NULLS LAST')").collect().head
    println(s"call-rewrite rewritten=${rw.getInt(0)} added=${rw.getInt(1)} count=${ct.toDF.count()}")
    println("call-expire expired=" + spark.sql("CALL graft.system.expire_snapshots(table => 'fin.act', older_than => TIMESTAMP '2030-01-01 00:00:00', retain_last => 2)").collect().map(_.getLong(0)).mkString(","))
    println("call-orphans=" + spark.sql("CALL graft.system.remove_orphan_files(table => 'fin.act', dry_run => true, older_than => TIMESTAMP '2030-01-01 00:00:00')").count()
      + " call-manifests=" + spark.sql("CALL graft.system.rewrite_manifests('fin.act')").collect().head.getLong(0))
    ct.createOrReplaceBranch("pin"); ct.append(ActivityData.day3(spark)); ct.createOrReplaceBranch("feat")
    println("call-fast-forward=" + spark.sql("CALL graft.system.fast_forward('fin.act', 'pin', 'feat')").collect().head.getString(0)
      + " pinned=" + (ct.meta.refs("pin") == ct.meta.refs("feat")))
    // cherry-pick: stage on a branch, advance main, publish the staged append
    ct.createOrReplaceBranch("cstage")
    val cstaged = ct.append(ActivityData.day4(spark).filter(col("txn_id") === "txn46"),
      branch = Some("cstage"))
    spark.sql("INSERT INTO graft.fin.act (account, txn_date, txn_id, merchant, amount, category, last_updated) " +
      "SELECT 'acc8', DATE'2024-03-03', 'txn98', 'M', 2.0, 'C', TIMESTAMP'2024-03-03 00:00:00'")
    val preCherry = ct.toDF.count()
    val cp = spark.sql(s"CALL graft.system.cherrypick_snapshot('fin.act', ${cstaged.id}L)").collect().head
    println(s"cherrypick from=${cp.getLong(0)} rows=${ct.toDF.count()} (pre=$preCherry)")
    println("== MERGE INTO + branch DDL through SQL (the reference's write path)")
    spark.sql("SELECT CAST(2024 AS BIGINT) AS id").createOrReplaceTempView("mrg_ids")
    spark.sql("""SELECT 'acc1' AS account, DATE'2024-03-01' AS txn_date, 'txn1' AS txn_id,
                 'M2' AS merchant, 777.0 AS amount, 'Upserted' AS category,
                 TIMESTAMP'2024-03-09 00:00:00' AS last_updated""").createOrReplaceTempView("mrg_src")
    spark.sql("""MERGE INTO graft.fin.act AS target USING mrg_src AS src
                 ON target.txn_id = src.txn_id
                 WHEN MATCHED THEN UPDATE SET target.amount = src.amount, target.category = src.category, target.last_updated = src.last_updated, target.txn_date = src.txn_date
                 WHEN NOT MATCHED THEN INSERT *""")
    println("post-merge txn1: " + spark.sql("SELECT category, amount FROM graft.fin.act WHERE txn_id='txn1'").collect().map(r => r.getString(0)+"/"+r.getDouble(1)).mkString)
    spark.sql("""MERGE INTO graft.fin.act AS target USING mrg_src AS src
                 ON target.txn_id = src.txn_id
                 WHEN MATCHED THEN DELETE""")
    println("post-merge-delete txn1-count=" + spark.sql("SELECT count(*) FROM graft.fin.act WHERE txn_id='txn1'").collect().head.getLong(0))
    // round-15: DELETE with an uncorrelated IN-subquery (non-pushable ->
    // GraftDeleteRule routes to the file-level delete)
    spark.sql("SELECT 'txn2' AS kill UNION ALL SELECT 'txn3'")
      .createOrReplaceTempView("del_subq_src")
    spark.sql("DELETE FROM graft.fin.act WHERE txn_id IN (SELECT kill FROM del_subq_src)")
    println("subquery-delete remaining=" + spark.sql(
      "SELECT count(*) FROM graft.fin.act WHERE txn_id IN ('txn2','txn3')")
      .collect().head.getLong(0))
    spark.sql("ALTER TABLE graft.fin.act CREATE OR REPLACE BRANCH sqlbranch")
    println("branch-ddl refs=" + ct.meta.refs.keySet.toSeq.sorted.mkString(","))
    spark.sql("ALTER TABLE graft.fin.act DROP BRANCH sqlbranch")
    println("== metadata tables through SQL")
    println("sql-history=" + spark.sql("SELECT * FROM graft.fin.act.history").count()
      + " sql-snapshots=" + spark.sql("SELECT * FROM graft.fin.act.snapshots").count()
      + " sql-files-records=" + spark.sql("SELECT sum(record_count) FROM graft.fin.act.files").collect().head.getLong(0)
      + " sql-refs=" + spark.sql("SELECT count(*) FROM graft.fin.act.refs").collect().head.getLong(0))
    println("== file skipping: scanWhere input files vs plain filter")
    println("pruned=" + ct.scanWhere(col("txn_id") === "txn20").inputFiles.length
      + " unpruned=" + ct.toDF.filter(col("txn_id") === "txn20").inputFiles.length)

    // manifest blooms: interleaved keys make every file's [min,max] cover
    // every probe, so any skipping below the file total is bloom-driven
    {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      import spark.implicits._
      val bloomLoc = java.nio.file.Files.createTempDirectory("drive_bloom").toString + "/t"
      val bt = GraftTable.create(spark, bloomLoc, "drive_bloom",
        StructType(Seq(StructField("k", LongType), StructField("s", StringType))),
        props = Map("write.metadata.bloom-filter.column.k" -> "true",
          "write.metadata.bloom-filter.expected-items" -> "4096",
          "write.metadata.bloom-filter.fpp" -> "0.001"))
      for (b <- 0 until 3)
        bt.append((0 until 200).map(i => (i.toLong * 3 + b, s"r$b-$i"))
          .toDF("k", "s").coalesce(1))
      val probe = bt.scanWhere(col("k") === 4L) // only in batch 1
      println(s"manifest-bloom files=${bt.meta.currentSnapshot.get.files.size}" +
        s" probed=${probe.inputFiles.length} rows=${probe.count()}")
    }
    println("== native expressions via SQL")
    graft.functions.GraftFunctions.register(spark)
    spark.sql("SELECT rolling_hash('graft') AS h, vec_cosine(array(1.0F,2.0F), array(2.0F,1.0F)) AS c").show()
    println("== range join: binned interval join, no cross product")
    locally {
      import spark.implicits._
      val pts = Seq((1L, 5L), (2L, 12L), (3L, 40L)).toDF("p_id", "p")
      val ivs = Seq((10L, 0L, 10L), (11L, 10L, 20L)).toDF("i_id", "lo", "hi")
      val rj = graft.ops.RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 8L)
      val hits = rj.select("p_id", "i_id").collect()
        .map(r => s"${r.getLong(0)}->${r.getLong(1)}").sorted.mkString(",")
      val crossFree = !rj.queryExecution.executedPlan.toString.contains("CartesianProduct")
      println(s"range-join hits=$hits crossFree=$crossFree")
    }
    println("== schema evolution: RENAME/DROP COLUMN, metadata-only eras")
    spark.sql("ALTER TABLE graft.fin.act RENAME COLUMN merchant TO vendor")
    spark.sql("ALTER TABLE graft.fin.act DROP COLUMN category")
    println("rename-drop cols=" + spark.table("graft.fin.act").columns.sorted.mkString(",")
      + " vendors=" + spark.sql("SELECT count(DISTINCT vendor) FROM graft.fin.act").collect().head.getLong(0))
    println("== schema evolution: ALTER COLUMN TYPE (int->long era upcast)")
    locally {
      import spark.implicits._
      val promoteLoc = loc + "-promote"
      val pt = graft.table.GraftTable.create(spark, promoteLoc, "promote",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType))))
      pt.append(Seq(("a", 1), ("b", 2)).toDF("k", "n"))
      pt.updateColumnType("n", org.apache.spark.sql.types.LongType)
      pt.append(Seq(("c", 1L + Int.MaxValue)).toDF("k", "n"))
      println("type-promotion sum=" + pt.toDF.agg(sum(col("n"))).head.getLong(0)
        + " dtype=" + pt.schema("n").dataType.simpleString
        + " typeEras=" + pt.meta.typeChanges.size.+(1))
    }
    println("== add_files: zero-copy onboarding of existing parquet")
    locally {
      import spark.implicits._
      val srcDir = loc + "-afsrc"
      (1L to 20L).map(i => (s"k$i", i)).toDF("k", "n")
        .coalesce(2).write.mode("overwrite").parquet(srcDir)
      val at = graft.table.GraftTable.create(spark, loc + "-aft", "af",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType))))
      val snap = at.addFiles(srcDir)
      println("add-files files=" + snap.addedFiles.size
        + " sum=" + at.toDF.agg(sum(col("n"))).head.getLong(0)
        + " op=" + snap.operation)
      // snapshot clone (metadata-only default): entries reference the
      // source by absolute base, clone data dir stays empty until its own
      // appends; independent — source survives clone DROP
      val ct = at.snapshotTo(loc + "-clone", "af_clone")
      val extern = ct.meta.currentSnapshot.get.files.count(_.base.isDefined)
      ct.append(Seq(("z", 100L)).toDF("k", "n"))
      val cloneSum = ct.toDF.agg(sum(col("n"))).head.getLong(0)
      graft.table.GraftTable.drop(spark, ct.location)
      println("snapshot-clone cloneSum=" + cloneSum
        + " srcAfterCloneDrop=" + at.toDF.count()
        + " externalEntries=" + extern)
    }
    println("== unigram-LM tokenizer: soft-EM train + Viterbi encode")
    locally {
      import spark.implicits._
      val docs = Seq(
        (1L, "the fast table scan beats the slow table scan"),
        (2L, "fast hash join beats slow sort merge join")).toDF("doc_id", "text")
      val vocabDf = graft.ops.UnigramLm.train(docs, "text", vocabSize = 25,
        rounds = 2, seedMultis = 30)
      val vocab = vocabDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val enc = graft.ops.UnigramLm.encodeTokenCounts(docs, "doc_id", "text", vocab)
        .orderBy("doc_id").collect()
      println("unigram vocab=" + vocab.size
        + " multis=" + vocab.keys.count(_.length > 1)
        + " enc=" + enc.map(r => r.getLong(0) + ":" + r.getLong(1) + "w/" +
          r.getLong(2) + "t").mkString(","))
    }
    println("== IVF drift: staleness signal over frozen centers")
    locally {
      import spark.implicits._
      val vecs = (0 until 120).map { i =>
        val shift = if (i >= 80) 40.0f else 0.0f // batch 2 drifts far away
        (i.toLong, Seq.tabulate(4)(d => shift + ((i * 7 + d) % 5).toFloat))
      }.toDF("vec_id", "embedding")
      val centers = graft.ops.Similarity.buildIvfIndex(
        vecs.filter(col("vec_id") < 40), nCells = 3).centers
      val drift = graft.ops.Similarity.ivfDriftStats(
          vecs.withColumn("batch", (col("vec_id") / lit(40)).cast("int")),
          centers, "batch", baselineBatch = lit(0))
        .orderBy("batch").collect()
      println("ivf-drift batches=" + drift.length
        + " refits=" + drift.map(r => r.getInt(0) + ":" + r.getBoolean(5)).mkString(","))
    }
    println("== changelog stream: CDC images replayed into a sink")
    locally {
      import spark.implicits._
      val src = graft.table.GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("drive-cdc").toString + "/s",
        "dcdcs", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType))),
        props = Map("write.delete.vector.enabled" -> "true"))
      val sink = graft.table.GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("drive-cdc").toString + "/k",
        "dcdck", src.schema)
      val cp = java.nio.file.Files.createTempDirectory("drive-cdc-cp").toString
      def run(): Unit = spark.readStream.format("graft-stream")
        .option("changelog", "true").load(src.location)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.streaming.StreamingOps.replayChangelog(b, sink))
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      src.append((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")); run()
      src.deleteWherePositional(col("id") < 5); run()
      src.deleteWhereMoR(col("id") >= 18, Seq("id")); run()
      val match_ = sink.toDF.exceptAll(src.toDF).isEmpty &&
        src.toDF.exceptAll(sink.toDF).isEmpty
      println(s"st-changelog sink=${sink.toDF.count()} src=${src.toDF.count()} equal=$match_")
    }
    println("== column stats: compute_table_stats -> scan Statistics for CBO")
    locally {
      import spark.implicits._
      val t = graft.table.GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("drive-stats").toString + "/t",
        "dstats", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("g",
            org.apache.spark.sql.types.StringType))))
      t.append((0 until 5000).map(i => (i.toLong, s"g${i % 40}")).toDF("id", "g"))
      val rec = t.computeTableStats()
      println(s"stats rows=${rec.rowCount} gNdv=${rec.cols("g").ndv} " +
        s"idNulls=${rec.cols("id").nullCount} pinned=${rec.snapshotId == t.meta.currentSnapshotId.get}")
    }
    println("== SQL views: versioned graft-catalog views through the extensions")
    locally {
      import spark.implicits._
      val wh = java.nio.file.Files.createTempDirectory("drive-views").toString
      spark.conf.set("spark.sql.catalog.dvcat", "graft.table.catalog.GraftSparkCatalog")
      spark.conf.set("spark.sql.catalog.dvcat.warehouse", wh)
      val t = graft.table.GraftTable.create(spark, s"$wh/ns/vb", "dvcat.ns.vb",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType))))
      t.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"))
      spark.sql("CREATE VIEW dvcat.ns.v1 AS SELECT k, sum(n) AS s FROM dvcat.ns.vb GROUP BY k")
      t.append(Seq(("a", 10L)).toDF("k", "n"))
      spark.sql("CREATE OR REPLACE VIEW dvcat.ns.v1 AS SELECT sum(n) AS s FROM dvcat.ns.vb")
      val s1 = spark.sql("SELECT s FROM dvcat.ns.v1").head.getLong(0)
      val versions = graft.table.catalog.GraftViews.load(s"$wh/ns/v1",
        spark.sparkContext.hadoopConfiguration).get.versions.size
      val listed = spark.sql("SHOW VIEWS IN dvcat.ns").collect().map(_.getString(1)).mkString(",")
      println(s"views sum=$s1 versions=$versions listed=$listed")
    }
    println("== deletion vectors: run-length position deletes, membership-probe reads")
    locally {
      import spark.implicits._
      val t = graft.table.GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("drive-dv").toString + "/t",
        "dvdrive", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType))),
        props = Map("write.delete.vector.enabled" -> "true"))
      t.append((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
      t.deleteWherePositional(col("id").between(10, 29))
      val dels = t.meta.currentSnapshot.get.deleteFiles
      val runs = spark.read.parquet(s"${t.dataDir}/${dels.head.path}")
        .select(col("__runs")).head.getSeq[Long](0)
      println(s"dv kind=${dels.head.kind} records=${dels.head.records} " +
        s"runs=${runs.mkString(",")} live=${t.toDF.count()}")
    }
    println("== product quantization: codebooks, 1-byte codes, ADC search")
    locally {
      import spark.implicits._
      val vecs = (0 until 160).map { i =>
        val c = i % 2
        (i.toLong, Seq.tabulate(8)(d =>
          (if (d % 2 == c) 1.0f else 0.1f) + ((i * 13 + d * 3) % 11) / 110.0f))
      }.toDF("vec_id", "embedding")
      val cb = graft.ops.Similarity.pqTrain(vecs, m = 4, ksub = 8, iters = 2)
      val enc = graft.ops.Similarity.pqEncode(vecs, cb)
      val codeBytes = enc.select(col("__codes")).head.getSeq[Byte](0).length
      val res = graft.ops.Similarity.pqSearch(
        vecs.filter(col("vec_id") < 2), enc, cb, vecs, k = 3, rescore = 10)
        .collect()
      val exact = graft.ops.Similarity.bruteForceTopK(
          vecs.filter(col("vec_id") < 2), vecs, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val hits = res.count(r => exact.contains((r.getLong(0), r.getLong(2))))
      println(s"pq codebooks=${cb.count()} codeBytes=$codeBytes " +
        s"compression=${8 * 4 / codeBytes}x topk=${res.length} recall=$hits/${exact.size}")
    }
    println("== streaming: watermarked stream-stream interval join")
    locally {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val imp = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
      val clk = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
      imp.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      clk.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 10:03:00")),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00")))
      val q = graft.streaming.StreamingOps.joinStreams(
          imp.toDF.toDF("imp_id", "imp_ts"), clk.toDF.toDF("click_id", "click_ts"),
          "imp_id", "click_id", "imp_ts", "click_ts", withinMs = 5 * 60 * 1000L)
        .writeStream.outputMode("append").format("memory")
        .queryName("drive_ssj").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      println("stream-stream-join rows=" + spark.table("drive_ssj").count()
        + " stateful=" + q.lastProgress.stateOperators.nonEmpty)
    }
    println("== bloom-prefiltered anti join: exact result, bypassed shuffle")
    locally {
      import spark.implicits._
      val batch = (1L to 100L).map(i => (i, i % 60)).toDF("id", "k")
      val corpus = (0L to 29L).map(Tuple1(_)).toDF("ck")
      val kept = graft.ops.Bloom.antiJoinKeys(batch, corpus, "k", "ck", 30L)
      val plainKept = batch.join(corpus, col("k") === col("ck"), "left_anti")
      println(s"bloom-anti kept=${kept.count()} plain=${plainKept.count()} " +
        s"equal=${kept.count() == plainKept.count()}")
    }
    println("== manifest-list layout: externalized lazy file lists")
    locally {
      val m = ct.meta
      val externalized = m.snapshots.forall(s =>
        s.manifestRefs.nonEmpty && s.inlineFiles.isEmpty)
      println(s"manifests externalized=$externalized snapshots=${m.snapshots.size} "
        + s"headFiles=${m.currentSnapshot.map(_.files.size).getOrElse(0)}")
      // the physical manifest list: every head file accounted for across
      // the (possibly amortized/collapsed) manifest chain
      val mf = ct.manifestFilesDF.collect()
      val entries = mf.map(r => r.getInt(3) + r.getInt(4)).sum
      println(s"manifest-files rows=${mf.length} entries=$entries " +
        s"headFiles=${m.currentSnapshot.map(_.files.size).getOrElse(0)}")
      // round-15 metadata views: entry-level status + chain-wide manifest
      // reuse + DV expansion back to row positions
      val ent = ct.entriesDF.collect()
      val reuse = ct.allManifestsDF.groupBy("path").count()
        .filter(col("count") > 1).count()
      val pd = graft.table.GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("drive-posdel").toString + "/t",
        "drive_posdel", ct.schema,
        props = Map("write.delete.vector.enabled" -> "true"))
      pd.append(ct.toDF.coalesce(1))
      pd.deleteWherePositional(col("amount") > 50)
      val positions = pd.positionDeletesDF.count()
      println(s"entries rows=${ent.length} added=${ent.count(_.getInt(1) == 1)} " +
        s"reusedManifests=$reuse dv-positions=$positions")
    }
    println("== MoR changelog: delete-file commit surfaces row-level DELETEs")
    locally {
      import spark.implicits._
      val mt = graft.table.GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("drive-morchg").toString + "/t",
        "morchg", graft.apps.ActivityData.schema,
        graft.apps.ActivityData.partitionCols)
      mt.append(graft.apps.ActivityData.day1(spark))
      mt.createOrReplaceBranch("before")
      mt.deleteWhereMoR(col("txn_id") === "txn5", Seq("txn_id"))
      val chg = mt.changelogBetween("before", "main")
        .select("txn_id", "_change_type").collect()
        .map(r => s"${r.getString(0)}:${r.getString(1)}").sorted.mkString(",")
      println(s"mor-changelog $chg")
      // incremental consumer: full load, then caught-up, then a new range
      val cp = java.nio.file.Files.createTempDirectory("drive-cp").toString
      var n = -1L
      mt.consumeChanges(cp)(df => n = df.count())
      val caughtUp = mt.consumeChanges(cp)(_ => ()).isEmpty
      mt.append(graft.apps.ActivityData.day2(spark).filter(col("txn_id") === "txn16"))
      var inc = -1L
      mt.consumeChanges(cp)(df => inc = df.count())
      println(s"consume initial=$n caughtUp=$caughtUp incremental=$inc")
    }
    println("== multimodal: real JDK codec decode")
    locally {
      val media = graft.ops.Multimodal.syntheticMedia(spark, 9)
      val img = graft.ops.Multimodal.decodeImageMeta(media).collect()
        .map(m => s"${m.width}x${m.height}:${m.format}").sorted.mkString(",")
      val aud = graft.ops.Multimodal.decodeAudioMeta(media).collect()
        .map(m => s"${m.sample_rate}hz/${m.channels}ch").sorted.mkString(",")
      println(s"media-decode img=$img aud=$aud")
      val vid = graft.ops.Multimodal.decodeVideoMeta(media).collect()
        .map(m => s"${m.width}x${m.height}@${m.fps}x${m.n_frames}")
        .sorted.mkString(",")
      val frames = graft.ops.Multimodal.sampleFrames(media, stride = 2)
        .collect()
      val jpegOk = frames.forall { f =>
        javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.frame_bytes)) != null
      }
      println(s"video-decode vid=$vid frames=${frames.length} jpegOk=$jpegOk")
    }
    println("== IVF index: persist as partitioned graft tables, pruned serving")
    locally {
      import spark.implicits._
      val corpus = (0 until 120).map { i =>
        val c = i % 3
        (i.toLong, Array.tabulate(8)(d =>
          (if (d == c) 1.0f else 0.0f) + ((i * 31 + d * 7) % 13) / 130.0f).toSeq)
      }.toDF("vec_id", "embedding")
      val ivfDir = java.nio.file.Files.createTempDirectory("drive-ivf").toString
      graft.ops.Similarity.saveIvfIndex(
        graft.ops.Similarity.buildIvfIndex(corpus, nCells = 5), ivfDir)
      val loaded = graft.ops.Similarity.loadIvfIndex(spark, ivfDir)
      val hits = graft.ops.Similarity.ivfSearch(
        corpus.filter(col("vec_id") === 0), loaded, k = 2, nProbe = 2,
        pruneScan = true)
      val rows = hits.collect().length
      val prunedScan = hits.queryExecution.executedPlan.toString
        .linesIterator.exists(l =>
          l.contains("PartitionFilters: [__cell#") && l.contains(" IN ("))
      println(s"ivf-persist rows=$rows partitionPruned=$prunedScan")
    }
    println("== CDC apply: latestBy reduce-then-merge streaming sink")
    locally {
      import spark.implicits._
      import org.apache.spark.sql.types._
      implicit val sqlCtx = spark.sqlContext
      val t = graft.table.GraftTable.create(spark,
        java.nio.file.Files.createTempDirectory("drive-cdc").toString,
        "drive.cdc", StructType(Seq(StructField("k", StringType),
          StructField("seq", LongType), StructField("v", LongType))))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StreamingOps.writeToGraftTable(
        input.toDF.toDF("k", "seq", "v"), t,
        java.nio.file.Files.createTempDirectory("drive-cdc-ckpt").toString,
        mergeKeys = Seq("k"), latestBy = Seq("seq"))
      try {
        // a multi-version change-feed batch, then a newer batch
        input.addData(("a", 1L, 10L), ("a", 3L, 30L), ("b", 1L, 100L))
        q.processAllAvailable()
        input.addData(("a", 4L, 40L), ("c", 1L, 7L))
        q.processAllAvailable()
      } finally q.stop()
      val st = t.toDF.orderBy("k").collect()
        .map(r => s"${r.getString(0)}=${r.getLong(2)}").mkString(",")
      println(s"cdc-apply state=$st")
    }
    println("== heavy hitters: native Misra-Gries aggregate + exact pass")
    locally {
      import spark.implicits._
      val df = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
        (0 until 100).map(i => s"t$i")).toDF("item").repartition(6)
      val hh = graft.ops.HeavyHitters.heavyHitters(df, "item", 10)
        .orderBy(col("cnt").desc).collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(",")
      val partial = graft.ops.HeavyHitters.heavyHitters(df, "item", 10)
        .queryExecution.executedPlan.toString.contains("partial_misra_gries")
      println(s"heavy-hitters $hh partialAgg=$partial")
    }
    println("== perplexity filter: corpus bigram LM scoring")
    locally {
      import spark.implicits._
      val d = Seq((1L, "the cat sat on the mat"), (2L, "the cat sat on the mat"),
        (3L, "mat the cat on sat the")).toDF("doc_id", "text")
      val ppl = graft.ops.TextAnalysis.bigramLmScore(d, "text", "doc_id")
        .orderBy("doc_id").collect()
        .map(r => s"${r.getLong(0)}:${r.getDouble(3)}").mkString(",")
      println(s"perplexity $ppl")
    }
    println("== fuzzy join: PassJoin-banded edit-distance self-join")
    locally {
      import spark.implicits._
      val d = Seq(1L -> "kitten", 2L -> "sitten", 3L -> "xkitten",
        4L -> "sitting").toDF("id", "s")
      val pairs = graft.ops.FuzzyJoin.editDistanceJoin(d, "s", "id", 2)
        .orderBy("id_a", "id_b").collect()
        .map(r => s"${r.getLong(0)}~${r.getLong(1)}:${r.getLong(2)}")
        .mkString(",")
      println(s"fuzzy-join $pairs")
    }
    println("== duplicated spans: cross-doc substring-level dedup signal")
    locally {
      import spark.implicits._
      val d = Seq((1L, "a b c d tail one"), (2L, "head two a b c d"),
        (3L, "nothing shared here at all")).toDF("doc_id", "text")
      val out = graft.ops.Dedup.duplicatedSpanStats(d, "text", "doc_id", 4)
        .orderBy("doc_id").collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(2)}/${r.getLong(1)}")
        .mkString(",")
      println(s"dup-spans $out")
    }
    println("== PCA: one-pass Gram aggregate -> driver eigen -> literal projection")
    locally {
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val model = graft.ops.Pca.fit(e, "embedding", 64, 4)
      val projected = graft.ops.Pca.project(e, "embedding", model)
      val k = model.components.length
      val explained = model.eigenvalues.sum
      val ordered = model.eigenvalues.sliding(2).forall(p => p(0) >= p(1))
      println(f"pca k=$k rows=${projected.count()} ordered=$ordered " +
        f"top-ev=${model.eigenvalues.head}%.3f sum-ev=$explained%.3f")
    }
    println("== skyline + shard shuffle: frontier and deterministic export order")
    locally {
      import spark.implicits._
      val pts = Seq((1L, 9L), (3L, 7L), (5L, 5L), (2L, 2L), (5L, 4L))
        .toDF("x", "y")
      val sky = graft.ops.Skyline.skyline2D(pts, "x", "y")
        .orderBy("x").collect().map(r => s"${r.getLong(0)},${r.getLong(1)}")
        .mkString(" ")
      val d = (0L until 10L).map(i => Tuple1(i)).toDF("id")
      val sh = graft.ops.Corpus.shardShuffle(d, "id", "demo", 3)
      val sizes = sh.groupBy("shard").count().orderBy("shard")
        .collect().map(_.getLong(1)).mkString(",")
      println(s"skyline $sky shard-sizes=$sizes")
    }
    println("== session catalog + graft format + JDBC commit CAS")
    locally {
      import graft.table.JdbcCommitGuard
      import graft.table.catalog.GraftSessionCatalog
      // spark_catalog override: unqualified names resolve versioned tables
      val wh = java.nio.file.Files.createTempDirectory("drive-sc-wh").toString
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog",
        classOf[GraftSessionCatalog].getName)
      s2.conf.set("spark.sql.catalog.spark_catalog.warehouse", wh)
      s2.sql("CREATE TABLE finance.drive_demo (id BIGINT, v STRING) USING graft")
      s2.sql("INSERT INTO finance.drive_demo VALUES (1, 'a'), (2, 'b')")
      s2.sql("ALTER TABLE finance.drive_demo CREATE BRANCH first")
      s2.sql("INSERT INTO finance.drive_demo VALUES (3, 'c')")
      val unq = s2.sql("SELECT count(*) FROM finance.drive_demo").collect().head.getLong(0)
      val asOf = s2.sql("SELECT count(*) FROM finance.drive_demo VERSION AS OF 'first'")
        .collect().head.getLong(0)
      // path-based v2 format read of the same table directory
      val viaFormat = spark.read.format("graft")
        .load(s"$wh/finance/drive_demo").count()
      println(s"session-catalog unqualified=$unq asof-branch=$asOf format-read=$viaFormat")
      // Iceberg reserved metadata columns through SQL and the API
      val mdSql = s2.sql(
        """SELECT _partition, count(*) AS n, max(_pos) AS maxp
           FROM finance.drive_demo GROUP BY _partition""").collect()
      val mdApi = graft.table.GraftTable.load(spark, s"$wh/finance/drive_demo")
        .metadataDF.select("_file").distinct().count()
      println(s"metadata-cols sql-rows=${mdSql.map(_.getLong(1)).sum} " +
        s"distinct-files=$mdApi")
      // JDBC commit CAS: two guarded commits, one pre-claimed slot healed
      val url = s"jdbc:derby:${java.nio.file.Files.createTempDirectory("drive-derby")}/db;create=true"
      val restore = JdbcCommitGuard.installGlobally(url)
      try {
        import spark.implicits._
        val t = graft.table.GraftTable.create(spark,
          java.nio.file.Files.createTempDirectory("drive-jdbc").toString + "/t",
          "jd", org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("i",
              org.apache.spark.sql.types.LongType))))
        t.append(Seq(1L, 2L).toDF("i"))
        t.append(Seq(3L).toDF("i"))
        println(s"jdbc-guard commits=${t.meta.snapshots.size} rows=${t.toDF.count()}")
      } finally graft.table.SnapshotLog.commitGuardFor = restore
    }
    println("== graft-stream: micro-batch tail of the append log")
    locally {
      import spark.implicits._
      val loc = java.nio.file.Files.createTempDirectory("drive-gs").toString + "/t"
      val t = graft.table.GraftTable.create(spark, loc, "gs",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
      t.append(Seq(1L, 2L).toDF("id"))
      val q = spark.readStream.format("graft-stream").load(loc)
        .writeStream.format("memory").queryName("drive_gs").start()
      q.processAllAvailable()
      val first = spark.table("drive_gs").count()
      t.append(Seq(3L).toDF("id"))
      q.processAllAvailable()
      val second = spark.table("drive_gs").count()
      q.stop()
      println(s"graft-stream initial=$first afterAppend=$second")
    }
    println("== hidden partitioning: transform layout + source-predicate pruning")
    locally {
      import spark.implicits._
      val loc = java.nio.file.Files.createTempDirectory("drive-hp").toString + "/t"
      val df = (0 until 48).map(i => (i.toLong,
        java.sql.Timestamp.from(java.time.Instant.parse("2024-05-01T00:00:00Z")
          .plusSeconds(i * 3600L)))).toDF("id", "ts")
      val t = graft.table.GraftTable.create(spark, loc, "hp", df.schema,
        partitionCols = Seq("days(ts)", "bucket(4,id)"))
      t.append(df)
      val dirs = t.meta.currentSnapshot.get.files
        .flatMap(_.partitionValues.keys).toSet.toSeq.sorted.mkString(",")
      val all = t.toDF.inputFiles.length
      val pruned = t.scanWhere(
        org.apache.spark.sql.functions.col("ts") >=
          org.apache.spark.sql.functions.lit("2024-05-02 00:00:00").cast("timestamp")
          && org.apache.spark.sql.functions.col("id") === 30L)
      println(s"hidden-partitioning dirs=$dirs files=$all " +
        s"prunedFiles=${pruned.inputFiles.length} rows=${pruned.count()}")
    }
    println("== storage-partitioned join: co-bucketed tables, no shuffle")
    locally {
      import spark.implicits._
      val wh = java.nio.file.Files.createTempDirectory("drive-spj").toString
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spj",
        classOf[graft.table.catalog.GraftSparkCatalog].getName)
      s2.conf.set("spark.sql.catalog.spj.warehouse", wh)
      s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      val a = graft.table.GraftTable.create(s2, s"$wh/db/a", "spj.db.a",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))),
        Seq("bucket(4,k)"))
      a.append { import s2.implicits._; (0L until 100L).map(i => (i, i * 2)).toDF("k", "v") }
      val b = graft.table.GraftTable.create(s2, s"$wh/db/b", "spj.db.b",
        a.schema, Seq("bucket(4,k)"))
      b.append { import s2.implicits._; (0L until 50L).map(i => (i, i * 3)).toDF("k", "v") }
      val j = s2.sql("SELECT a.k FROM spj.db.a a JOIN spj.db.b b ON a.k = b.k")
      val shuffles = j.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      println(s"spj-join rows=${j.count()} shuffles=$shuffles")
    }
    println("== general MERGE clause surface: conditional/multi/NMBS cascade")
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import graft.table.MergeClause
      import graft.table.MergeClause.src
      val loc = java.nio.file.Files.createTempDirectory("drive-gm").toString + "/t"
      val t = graft.table.GraftTable.create(spark, loc, "gm",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType))))
      t.append(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "n"))
      t.mergeInto(Seq((1L, 100L), (2L, 0L), (8L, 80L)).toDF("sid", "sn"),
        keys = Seq("id" -> col("sid")),
        matched = Seq(
          MergeClause.Delete(Some(src("sn") === 0L)),
          MergeClause.Update(Some(src("sn") > col("n")), Seq("n" -> src("sn")))),
        notMatched = Seq(MergeClause.Insert(Some(src("sn") > 50L),
          Seq("id" -> src("sid"), "n" -> src("sn")))),
        notMatchedBySource = Seq(
          MergeClause.Delete(Some(col("n") >= 40L)),
          MergeClause.Update(None, Seq("n" -> (col("n") + 1L)))))
      // expect: 1->100 (updated), 2 deleted (sn=0), 3->31 (NMBS +1),
      // 4 deleted (NMBS n>=40), 8->80 inserted
      val state = t.toDF.orderBy("id").as[(Long, Long)].collect()
        .map { case (i, n) => s"$i:$n" }.mkString(",")
      println(s"merge-into state=$state op=${t.meta.currentSnapshot.get.operation}")
    }
    println("== ALTER TABLE RENAME TO (round 17): directory move + pointer re-point")
    locally {
      spark.sql("CREATE TABLE graft.fin.rn1 (id BIGINT) USING parquet")
      spark.sql("INSERT INTO graft.fin.rn1 SELECT id FROM range(6)")
      spark.sql("ALTER TABLE graft.fin.rn1 RENAME TO fin.rn2")
      val n = spark.sql("SELECT count(*) FROM graft.fin.rn2").collect().head.getLong(0)
      val oldGone = scala.util.Try(
        spark.sql("SELECT * FROM graft.fin.rn1").collect()).isFailure
      println(s"rename-table rows=$n oldGone=$oldGone")
    }
    println("== MERGE WITH SCHEMA EVOLUTION (round 17): new source column + widen")
    locally {
      spark.sql("CREATE TABLE graft.fin.evo (id BIGINT, n INT) USING parquet")
      spark.sql("INSERT INTO graft.fin.evo SELECT id, CAST(id AS INT) FROM range(4)")
      spark.sql("""SELECT id, CAST(id * 4000000000 AS BIGINT) AS n,
                     concat('tag', id) AS tag
                   FROM (VALUES (CAST(2 AS BIGINT)), (7)) v(id)""")
        .createOrReplaceTempView("evo_src")
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft.fin.evo t
                   USING evo_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
      val cols = spark.table("graft.fin.evo").schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      val st = spark.sql("SELECT id, n, tag FROM graft.fin.evo ORDER BY id")
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}:${Option(r.getString(2)).getOrElse("-")}")
        .mkString(",")
      println(s"merge-evolution cols=$cols state=$st")
    }
    println("== column DEFAULT values (round 17): initial vs write default")
    locally {
      spark.sql("CREATE TABLE graft.fin.dflt (id BIGINT, ch STRING DEFAULT 'WEB') USING parquet")
      spark.sql("INSERT INTO graft.fin.dflt (id) VALUES (1)")
      spark.sql("ALTER TABLE graft.fin.dflt ADD COLUMN score INT DEFAULT 7")
      spark.sql("ALTER TABLE graft.fin.dflt ALTER COLUMN score SET DEFAULT 9")
      spark.sql("INSERT INTO graft.fin.dflt (id, ch) VALUES (2, 'APP')")
      val rows = spark.sql(
        "SELECT id, ch, score FROM graft.fin.dflt ORDER BY id")
        .collect().map(r => s"${r.getLong(0)}:${r.getString(1)}:${r.getInt(2)}")
        .mkString(",")
      // row 1 predates `score` -> initial default 7; row 2 post-add omits
      // it -> current write-default 9; `ch` fills 'WEB' where omitted
      println(s"default-values state=$rows")
    }
    println("== row lineage (round 17): stable _row_id across rewrites")
    locally {
      spark.sql("CREATE TABLE graft.fin.lin (id BIGINT, v DOUBLE) USING parquet")
      spark.sql("INSERT INTO graft.fin.lin VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
      val before = spark.sql("SELECT id, _row_id FROM graft.fin.lin")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.sql("UPDATE graft.fin.lin SET v = 9.0 WHERE id = 2")
      spark.sql("DELETE FROM graft.fin.lin WHERE id = 3")
      val after = spark.sql(
        "SELECT id, _row_id, _last_updated_sequence_number FROM graft.fin.lin ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val stable = after.forall { case (id, rid, _) => before(id) == rid }
      val seqs = after.map(_._3).distinct.sorted.mkString(",")
      // update keeps id 2's _row_id but bumps its sequence; the delete's
      // rewrite carries id 1/2 unchanged
      println(s"row-lineage stable=$stable rows=${after.length} seqs=$seqs")
    }
    println("== WAP by id + per-ref retention (round 15)")
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val loc = java.nio.file.Files.createTempDirectory("drive-wapid").toString + "/t"
      val t = graft.table.GraftTable.create(spark, loc, "dwi",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))),
        props = Map("write.wap.enabled" -> "true"))
      t.append((1L to 4L).map(i => (i, i * 10)).toDF("id", "v"))
      spark.conf.set("spark.graft.wap.id", "drive-batch")
      try t.append(Seq((9L, 90L)).toDF("id", "v"))
      finally spark.conf.unset("spark.graft.wap.id")
      val mainDuringStage = t.toDF.count()
      val staged = t.snapshotForWapId("drive-batch").get
      val audit = t.asOfSnapshot(staged.id).count()
      t.cherryPick(staged.id)
      val pub = t.meta.currentSnapshot.get.summary("published-wap-id")
      // retention: branch pinned with min=2, aged tag expires on the pass
      t.createOrReplaceBranch("pin")
      t.setRefRetention("pin", minSnapshotsToKeep = Some(2))
      t.createTag("aged")
      t.setRefRetention("aged", maxRefAgeMs = Some(1000L))
      t.append(Seq((5L, 50L)).toDF("id", "v"))
      val future = System.currentTimeMillis() + 3600L * 1000
      t.expireSnapshots(olderThanMs = future, retainLast = 1, nowMs = future)
      val m = t.meta
      val pinAnc = m.ancestry(m.refs("pin")).size
      println(s"wap-id staged=$audit mainDuringStage=$mainDuringStage " +
        s"published=$pub pinAncestors=$pinAnc agedTag=${m.tags.contains("aged")}")
      // round 17: the SQL procedure twins — stage a second wap id and
      // publish it by name; then jump main around with set_current_snapshot
      spark.conf.set("spark.graft.wap.id", "drive-batch2")
      try t.append(Seq((6L, 60L)).toDF("id", "v"))
      finally spark.conf.unset("spark.graft.wap.id")
      spark.sql(s"CALL graft.system.register_table('fin.dwi', '${t.location}')")
      val pc = spark.sql(
        "CALL graft.system.publish_changes('fin.dwi', 'drive-batch2')")
        .collect().head
      val before = t.meta.refs("main")
      spark.sql(s"CALL graft.system.set_current_snapshot('fin.dwi', ${pc.getLong(0)}L)")
      val jumped = t.toDF.count()
      t.setCurrentSnapshot(before)
      println(s"publish-changes current=${t.toDF.count()} jumpedTo=${pc.getLong(0)} jumpedCount=$jumped")
    }
    println("== correlated row-level SQL + CoW changelog stream (round 16)")
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val wh = java.nio.file.Files.createTempDirectory("drive-corr").toString
      spark.conf.set("spark.sql.catalog.dcorr",
        "graft.table.catalog.GraftSparkCatalog")
      spark.conf.set("spark.sql.catalog.dcorr.warehouse", wh)
      try {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType)))
        val src = graft.table.GraftTable.create(spark, s"$wh/db/t", "db.t", schema)
        src.append(spark.range(10)
          .select(col("id"), (col("id") * 1.0).as("v")).coalesce(1))
        Seq(2L, 5L, 8L).toDF("kid").createOrReplaceTempView("drive_keep")
        // correlated EXISTS delete: re-bound by exprId, decorrelated to a
        // semi join, committed as a position-keyed CoW rewrite
        spark.sql("""DELETE FROM dcorr.db.t t
                     WHERE EXISTS (SELECT 1 FROM drive_keep k WHERE k.kid = t.id)""")
        val left = spark.sql("SELECT id FROM dcorr.db.t ORDER BY id")
          .collect().map(_.getLong(0)).mkString(",")
        // correlated IN update (correlation through the inner WHERE):
        // matches ids {1, 4, 7}
        spark.sql("""UPDATE dcorr.db.t t SET v = -1.0
                     WHERE t.id IN (SELECT k.kid - 1 FROM drive_keep k
                                    WHERE k.kid > t.id)""")
        val negs = spark.sql("SELECT id FROM dcorr.db.t WHERE v = -1.0 ORDER BY id")
          .collect().map(_.getLong(0)).mkString(",")
        // the CoW commits above stream as DELETE/INSERT change images and
        // replay to the exact batch state
        val sink = graft.table.GraftTable.create(spark, s"$wh/db/sink",
          "db.sink", schema)
        spark.readStream.format("graft-stream").option("changelog", "true")
          .load(s"$wh/db/t")
          .writeStream
          .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
            graft.streaming.StreamingOps.replayChangelog(b, sink))
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("drive-corr-cp").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
        val replayEq = sink.toDF.exceptAll(src.toDF).isEmpty &&
          src.toDF.exceptAll(sink.toDF).isEmpty
        println(s"correlated-sql left=$left negUpdated=$negs " +
          s"cow-replay-matches=$replayEq")
      } finally {
        spark.conf.unset("spark.sql.catalog.dcorr")
        spark.conf.unset("spark.sql.catalog.dcorr.warehouse")
      }
    }
    spark.stop()
  }
}
