package graft.table

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.apps.ActivityData

class GraftTableSpec extends SparkTestBase {

  private def fullPipeline(): GraftTable = {
    val loc = tmpDir("graft-activity")
    val t = GraftTable.create(spark, loc, "finance.activity",
      ActivityData.schema, ActivityData.partitionCols, ActivityData.tableProps)
    val days = Seq(
      ActivityData.day1(spark), ActivityData.day2(spark),
      ActivityData.day3(spark), ActivityData.day4(spark),
      ActivityData.day5(spark))
    days.zipWithIndex.foreach { case (d, i) =>
      t.merge(d, ActivityData.mergeKeys, ActivityData.updateCols)
      t.createOrReplaceBranch(s"day${i + 1}")
    }
    t
  }

  test("sort compaction of an UNPARTITIONED table: multi-file terasort global order") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val t = GraftTable.create(spark, tmpDir("unpart-sort"), "us", schema, Seq.empty)
    val rnd = new scala.util.Random(13)
    // many small files: 6 appends x 2 tasks each
    (1 to 6).foreach { _ =>
      t.append(Seq.fill(200)((rnd.nextLong().abs, "v")).toDF("k", "v").repartition(2))
    }
    assert(t.meta.currentSnapshot.get.files.size >= 12)
    t.rewriteDataFilesSorted(Seq(asc_nulls_last("k")), targetFiles = 4)
    val files = t.meta.currentSnapshot.get.files
    // compacted AND distributed: more than one task wrote, none saw all rows
    assert(files.size > 1 && files.size <= 4, s"got ${files.size} files")
    // global terasort order: each file internally sorted, file key ranges
    // disjoint — so concatenating files by min-key reads the whole table
    // in order without any single-task global sort having run
    val ranges = files.map { f =>
      val ks = spark.read.schema(schema)
        .parquet(s"${t.location}/data/${f.path}")
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"file ${f.path} not internally sorted")
      (ks.min, ks.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi <= lo, s"file ranges overlap: $ranges")
      case _ =>
    }
    assert(t.toDF.count() === 1200)
  }

  test("create + append + read back round trip") {
    val loc = tmpDir("graft-basic")
    val t = GraftTable.create(spark, loc, "t", ActivityData.schema,
      ActivityData.partitionCols)
    assert(t.toDF.count() === 0)
    t.append(ActivityData.day1(spark))
    assert(t.toDF.count() === 15)
    t.append(ActivityData.day2(spark))
    assert(t.toDF.count() === 30)
    // schema preserved, partition column readable
    assert(t.toDF.schema.fieldNames.toSeq === ActivityData.schema.fieldNames.toSeq)
    assert(t.toDF.select("txn_date").distinct().count() === 2)
  }

  test("createLike clones schema/partitioning/props, empty or with data (CTAS)") {
    val loc = tmpDir("graft-ctas-src")
    val src = GraftTable.create(spark, loc, "src", ActivityData.schema,
      ActivityData.partitionCols, ActivityData.tableProps)
    src.append(ActivityData.day1(spark))

    // SELECT * LIMIT 0 shape: structure cloned, zero rows
    val empty = GraftTable.createLike(src, tmpDir("graft-ctas-empty"), "src_tmp")
    assert(empty.toDF.count() === 0)
    assert(empty.schema === src.schema)
    assert(empty.partitionCols === src.partitionCols)
    assert(empty.meta.props === src.meta.props)
    assert(empty.name === "src_tmp")

    // full CTAS: one snapshot holding the source's current rows
    val full = GraftTable.createLike(src, tmpDir("graft-ctas-full"), "src_copy",
      withData = true)
    assert(full.toDF.count() === 15)
    assert(full.snapshotsDF.count() === 1)

    // createOrReplace semantics: re-clone over an existing table succeeds
    val again = GraftTable.createLike(src, empty.location, "src_tmp2")
    assert(again.toDF.count() === 0 && again.name === "src_tmp2")
  }

  test("write.distribution-mode=hash clusters appends: one file per partition") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType)))
    val none = GraftTable.create(spark, tmpDir("dist-none"), "n", schema, Seq("p"))
    val hash = GraftTable.create(spark, tmpDir("dist-hash"), "h", schema, Seq("p"),
      Map("write.distribution-mode" -> "hash"))
    // 8 incoming tasks x 2 partition values
    val df = (1L to 64L).map(i => (i, s"p${i % 2}")).toDF("k", "p").repartition(8)
    none.append(df); hash.append(df)
    assert(none.toDF.count() === 64 && hash.toDF.count() === 64)
    val noneFiles = none.meta.currentSnapshot.get.files
    val hashFiles = hash.meta.currentSnapshot.get.files
    // default: every task writes into every partition it holds rows for
    assert(noneFiles.size > 2, s"expected task-local files, got ${noneFiles.size}")
    // hash mode: rows clustered by partition value first -> 1 file each
    assert(hashFiles.size === 2, s"expected one file per partition, got ${hashFiles.size}")
    assert(hashFiles.map(_.partitionValues("p")).sorted === Seq("p0", "p1"))
  }

  test("write.distribution-mode=range clusters appends by partition-value ranges") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType)))
    val range = GraftTable.create(spark, tmpDir("dist-range"), "r", schema, Seq("p"),
      Map("write.distribution-mode" -> "range"))
    val df = (1L to 64L).map(i => (i, s"p${i % 4}")).toDF("k", "p").repartition(8)
    range.append(df)
    assert(range.toDF.count() === 64)
    // each partition value lands in exactly one range slice -> one file
    val files = range.meta.currentSnapshot.get.files
    assert(files.map(_.partitionValues("p")).distinct.size === 4)
    assert(files.size === 4, s"expected one file per partition value, got ${files.size}")
  }

  test("binpack compaction coalesces only small files; MoR deletes survive for untouched files") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val t = GraftTable.create(spark, tmpDir("binpack"), "bp", schema)
    // one "big" file (by row count; threshold set between the sizes below)
    t.append((0L until 5000L).map(i => (i, i)).toDF("id", "v").coalesce(1))
    val bigPath = t.meta.currentSnapshot.get.files.head.path
    val bigSize = t.meta.currentSnapshot.get.files.head.sizeBytes
    // five small files
    (0 until 5).foreach { b =>
      t.append((10000L + b * 10 until 10000L + b * 10 + 10)
        .map(i => (i, i)).toDF("id", "v").coalesce(1))
    }
    // a MoR delete that hits the BIG (untouched) file
    t.deleteWhereMoR(col("id") === 42L, Seq("id"))
    assert(t.toDF.count() === 5049)
    val snap = t.rewriteDataFilesBinpack(minFileSizeBytes = bigSize)
    // big file untouched; smalls coalesced into one
    val paths = snap.files.map(_.path)
    assert(paths.contains(bigPath), "full-sized file must not be rewritten")
    assert(paths.size === 2, s"5 small files should coalesce to 1, got $paths")
    // delete still applies to the untouched big file
    assert(snap.deleteFiles.nonEmpty, "partial rewrite must keep delete files")
    assert(t.toDF.count() === 5049)
    assert(t.toDF.filter(col("id") === 42L).count() === 0)
    assert(t.toDF.filter(col("id") >= 10000L).count() === 50)
    // idempotent: nothing left to coalesce
    val again = t.rewriteDataFilesBinpack(minFileSizeBytes = bigSize)
    assert(again.id === snap.id, "no-op binpack must not commit")
  }

  test("binpack under an active WAP branch compacts the BRANCH's files, not main's") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val t = GraftTable.create(spark, tmpDir("binpack-wap"), "bpw", schema,
      props = Map("write.wap.enabled" -> "true"))
    t.append((1L to 3L).toDF("id").coalesce(1))
    t.createOrReplaceBranch("audit")
    // main advances past the branch point
    t.append((100L to 102L).toDF("id").coalesce(1))
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      // two small staged appends on the branch, then binpack while the
      // WAP redirect is active: the rewrite must read the BRANCH snapshot
      // (reading main would graft rows 100-102 into the staged branch)
      t.append((10L to 11L).toDF("id").coalesce(1))
      t.append((12L to 13L).toDF("id").coalesce(1))
      val branchRows = t.toDF.orderBy("id").as[Long].collect().toSeq
      assert(branchRows === Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L))
      t.rewriteDataFilesBinpack(minFileSizeBytes = 1L << 20)
      assert(t.toDF.orderBy("id").as[Long].collect().toSeq === branchRows,
        "branch content must be unchanged by compaction")
      assert(!t.toDF.as[Long].collect().contains(100L),
        "main's rows must never leak into the staged branch")
    } finally spark.conf.unset("spark.graft.wap.branch")
    // main unchanged by the branch compaction
    assert(t.toDF.orderBy("id").as[Long].collect().toSeq ===
      Seq(1L, 2L, 3L, 100L, 101L, 102L))
  }

  test("sort compaction keeps within-file order on a hash-distribution table") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType)))
    val t = GraftTable.create(spark, tmpDir("dist-sort"), "ds", schema, Seq("p"),
      Map("write.distribution-mode" -> "hash"))
    val rnd = new scala.util.Random(7)
    t.append(Seq.fill(200)((rnd.nextLong().abs, s"p${rnd.nextInt(2)}"))
      .toDF("k", "p").repartition(4))
    t.rewriteDataFilesSorted(Seq(asc_nulls_last("k")))
    // re-applying the distribution shuffle after sortWithinPartitions
    // would leave files internally unsorted — read each file alone and
    // check its k column is non-decreasing
    val files = t.meta.currentSnapshot.get.files
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.schema(schema).option("basePath", s"${t.location}/data")
        .parquet(s"${t.location}/data/${f.path}")
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"file ${f.path} lost its sort order")
    }
    assert(t.toDF.count() === 200)
  }

  test("write.target-file-size-rows rolls oversized tasks into more files") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    val t = GraftTable.create(spark, tmpDir("target-rows"), "t", schema,
      Seq.empty, Map("write.target-file-size-rows" -> "25"))
    t.append((1L to 100L).toDF("k").coalesce(1))
    val files = t.meta.currentSnapshot.get.files
    assert(files.size === 4, s"100 rows / 25 per file, got ${files.size}")
    assert(files.forall(_.records <= 25))
    assert(t.toDF.count() === 100)
  }

  test("daily merge pipeline yields reference row-count arithmetic 15/30/45/47/50") {
    val t = fullPipeline()
    assert(t.asOf("day1").count() === 15)
    assert(t.asOf("day2").count() === 30)
    assert(t.asOf("day3").count() === 45)
    assert(t.asOf("day4").count() === 47)
    assert(t.asOf("day5").count() === 50)
    assert(t.toDF.count() === 50)
  }

  test("merge updates only the update columns and preserves the rest") {
    val t = fullPipeline()
    // txn10: day1 category Jewellery -> day4 Fashion, amount updated to 199
    val latest = t.toDF.filter(col("txn_id") === "txn10").collect().head
    assert(latest.getAs[String]("category") === "Fashion")
    assert(latest.getAs[Double]("amount") === 199.0)
    // account/merchant were NOT in updateCols -> preserved from day1 insert
    assert(latest.getAs[String]("account") === "acc1")
    // time travel: day1 state still Jewellery
    val orig = t.asOf("day1").filter(col("txn_id") === "txn10").collect().head
    assert(orig.getAs[String]("category") === "Jewellery")
    // txn44 history: Hardware (day3) -> Phone (day5)
    assert(t.asOf("day3").filter(col("txn_id") === "txn44").collect()
      .head.getAs[String]("category") === "Hardware")
    assert(t.asOf("day5").filter(col("txn_id") === "txn44").collect()
      .head.getAs[String]("category") === "Phone")
  }

  test("merge moves a row across partitions when the partition key is updated") {
    val loc = tmpDir("graft-move")
    val t = GraftTable.create(spark, loc, "t", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    import spark.implicits._
    val move = Seq(("acc1", java.sql.Date.valueOf("2024-04-01"), "txn10", "Moved Mart",
      java.lang.Double.valueOf(1.0), "Moved", java.sql.Timestamp.valueOf("2024-04-01 00:00:00")))
      .toDF("account", "txn_date", "txn_id", "merchant", "amount", "category", "last_updated")
    t.merge(move, Seq("txn_id"), ActivityData.updateCols)
    assert(t.toDF.count() === 15)
    val moved = t.toDF.filter($"txn_id" === "txn10").collect().head
    assert(moved.getAs[java.sql.Date]("txn_date").toString === "2024-04-01")
    // old partition no longer contains the row
    assert(t.toDF.filter($"txn_date" === "2024-03-02" && $"txn_id" === "txn10").count() === 0)
  }

  test("merge rewrites only the FILES containing matched keys (file-level CoW)") {
    import spark.implicits._
    val loc = tmpDir("graft-filecow")
    val t = GraftTable.create(spark, loc, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("part", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))),
      partitionCols = Seq("part"))
    // two files in the SAME partition with disjoint key ranges
    t.append(Seq((1L, "p", 1.0), (2L, "p", 2.0)).toDF("k", "part", "v").coalesce(1))
    t.append(Seq((10L, "p", 10.0), (11L, "p", 11.0)).toDF("k", "part", "v").coalesce(1))
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert(before.size === 2)
    // merge touches only keys of the second file
    t.merge(Seq((10L, "p", 100.0)).toDF("k", "part", "v"), Seq("k"))
    val after = t.meta.currentSnapshot.get.files.map(_.path).toSet
    // the first file survives untouched; the second was rewritten
    val survivors = before.intersect(after)
    assert(survivors.size === 1)
    val survivorRows = spark.read.schema(t.schema).option("basePath", t.dataDir)
      .parquet(s"${t.dataDir}/${survivors.head}").select("k").collect().map(_.getLong(0)).toSet
    assert(survivorRows === Set(1L, 2L))
    assert(t.toDF.count() === 4)
    assert(t.toDF.filter($"k" === 10L).collect().head.getAs[Double]("v") === 100.0)
  }

  test("merge leaves untouched partitions' files alone (partition-level CoW)") {
    val t = fullPipeline()
    // day5 merge touched only 2024-03-05 (updates) + 2024-03-09 (inserts);
    // files for 2024-03-02/03 must predate the day5 snapshot
    val m = t.meta
    val day4Files = m.snapshotForRef("day4").get.files.filter(
      _.partitionValues("txn_date") == "2024-03-02").map(_.path).toSet
    val day5Files = m.snapshotForRef("day5").get.files.filter(
      _.partitionValues("txn_date") == "2024-03-02").map(_.path).toSet
    assert(day4Files === day5Files)
  }

  test("group-by count matches the flagship query shape") {
    val t = fullPipeline()
    val counts = t.toDF.groupBy("account").agg(count(lit(1)).as("activity_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 50)
    assert(counts.keySet === Set("acc1", "acc2", "acc3", "acc4", "acc5"))
  }

  test("branch pins survive later commits and drops work") {
    val t = fullPipeline()
    val day2Count = t.asOf("day2").count()
    t.append(ActivityData.cleanBatch(spark))
    assert(t.asOf("day2").count() === day2Count)
    assert(t.toDF.count() === 65)
    t.dropBranch("day1")
    assertThrows[IllegalArgumentException](t.asOf("day1"))
    assert(t.asOf("day2").count() === 30)
  }

  test("metadata tables: history / snapshots / files / manifests / metadata_log") {
    val t = fullPipeline()
    val m = t.meta
    assert(t.history.count() === m.snapshots.size.toLong)
    assert(t.snapshotsDF.count() === m.snapshots.size.toLong)
    assert(t.history.filter(col("is_current_ancestor")).count() === 5)
    val files = t.filesDF.collect()
    assert(files.map(_.getAs[Long]("record_count")).sum === 50)
    assert(t.manifestsDF.count() > 0)
    assert(t.metadataLogEntries.count() === m.metadataLog.size.toLong)
    assert(t.refsDF.filter(col("name") === "main").count() === 1)
  }

  test("changesBetween returns exactly the appended rows of an append-only range") {
    val loc = tmpDir("graft-incr")
    val t = GraftTable.create(spark, loc, "incr", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark)); t.createOrReplaceBranch("v1")
    t.append(ActivityData.day2(spark)); t.createOrReplaceBranch("v2")
    t.append(ActivityData.day3(spark)); t.createOrReplaceBranch("v3")
    assert(t.changesBetween("v1", "v3").count() === 30)
    assert(t.changesBetween("v2", "v3").count() === 15)
    assert(t.changesBetween("v3", "v3").count() === 0)
    // changes compose: v1->v2 plus v2->v3 equals v1->v3
    val composed = t.changesBetween("v1", "v2").unionByName(t.changesBetween("v2", "v3"))
      .select("txn_id").collect().map(_.getString(0)).toSet
    assert(composed === t.changesBetween("v1", "v3")
      .select("txn_id").collect().map(_.getString(0)).toSet)
    // non-ancestor and CoW-in-range both fail loudly
    assert(intercept[IllegalArgumentException] {
      t.changesBetween("v3", "v1") }.getMessage.contains("not an ancestor"))
    t.merge(ActivityData.day4(spark), ActivityData.mergeKeys, ActivityData.updateCols)
    t.createOrReplaceBranch("v4")
    assert(intercept[IllegalArgumentException] {
      t.changesBetween("v3", "v4") }.getMessage.contains("append-only"))
  }

  test("changelogBetween: CoW updates emit net DELETE+INSERT pairs") {
    val t = GraftTable.create(spark, tmpDir("changelog"), "cl",
      ActivityData.schema, ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    t.createOrReplaceBranch("base")
    // day4 updates txn10 (amount/category change) and inserts txn46/txn47
    t.merge(ActivityData.day4(spark).filter(
      col("txn_id").isin("txn10", "txn46", "txn47")),
      ActivityData.mergeKeys, ActivityData.updateCols)
    t.deleteWhere(col("txn_id") === "txn3")
    // compaction rewrites bytes, not rows: contributes nothing
    t.rewriteDataFilesSorted(Seq(asc_nulls_last("account")))
    val log = t.changelogBetween("base", "main")
      .select("txn_id", "_change_type", "_commit_snapshot_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byType = log.groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    // carryovers netted out: only the really-changed rows remain
    assert(byType("INSERT") === Seq("txn10", "txn46", "txn47"))
    assert(byType("DELETE") === Seq("txn10", "txn3"))
    // the update's pre-image and post-image share one commit
    val txn10 = log.filter(_._1 == "txn10")
    assert(txn10.map(_._3).distinct.length === 1 && txn10.length === 2)
    // carryovers visible when asked for: strictly more rows, same net
    val rawLog = t.changelogBetween("base", "main", removeCarryovers = false)
    assert(rawLog.count() > log.length)
    // a merge-on-read delete in the range resolves through the state diff
    // (no data file moved, yet the deleted row surfaces as a DELETE)
    t.createOrReplaceBranch("pre_mor")
    t.deleteWhereMoR(col("txn_id") === "txn5", Seq("txn_id"))
    val morLog = t.changelogBetween("pre_mor", "main")
      .select("txn_id", "_change_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(morLog.toSeq === Seq(("txn5", "DELETE")))
  }

  test("partitionsDF totals match per-partition recounts") {
    val t = fullPipeline()
    val fromMeta = t.partitionsDF.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val recount = t.toDF.groupBy("txn_date").count().collect()
      .map(r => s"{txn_date=${r.get(0)}}" -> r.getLong(1)).toMap
    assert(fromMeta === recount)
    assert(fromMeta.values.sum === 50)
  }

  test("z-order compaction makes file stats selective on every z dimension") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    def build(name: String): GraftTable = {
      val t = GraftTable.create(spark, tmpDir(s"graft-z-$name"), name, orders.schema)
      t.append(orders)
      t
    }
    // linear: range-sorted on o_custkey only (single-col z-order degenerates
    // to a range sort); z: clustered on (o_custkey, o_orderkey)
    val linear = build("zlin")
    linear.rewriteDataFilesZOrder(Seq("o_custkey"), targetFiles = 8)
    val zed = build("zmulti")
    zed.rewriteDataFilesZOrder(Seq("o_custkey", "o_orderkey"), targetFiles = 8)
    // contents preserved exactly
    assert(zed.toDF.count() === orders.count())
    assert(zed.toDF.agg(org.apache.spark.sql.functions.sum("o_orderkey")).collect().head.getLong(0)
      === orders.agg(org.apache.spark.sql.functions.sum("o_orderkey")).collect().head.getLong(0))
    // a predicate on the NON-leading dimension skips files only under z-order
    val cut = orders.agg(org.apache.spark.sql.functions.expr("percentile_approx(o_orderkey, 0.1)"))
      .collect().head.getLong(0)
    val pred = col("o_orderkey") < cut
    val linFiles = linear.scanWhere(pred).inputFiles.length
    val zFiles = zed.scanWhere(pred).inputFiles.length
    assert(linear.meta.currentSnapshot.get.files.size === 8)
    assert(zFiles < linFiles,
      s"z-order should prune files on the second dimension: z=$zFiles linear=$linFiles")
    // and both return identical rows for the predicate
    assert(zed.scanWhere(pred).count() === orders.filter(pred).count())
  }

  test("cherryPick publishes a staged append after main advanced") {
    val loc = tmpDir("graft-cherry")
    val t = GraftTable.create(spark, loc, "t", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark)) // main: 15 rows
    // stage day2 on a WAP-style branch (main unaffected)
    t.createOrReplaceBranch("staged")
    val stagedSnap = t.append(ActivityData.day2(spark)
      .filter(col("txn_id").isin("txn16", "txn17")), branch = Some("staged"))
    // main ADVANCES past the staged snapshot's base: fast-forward is now
    // impossible (staged is not a descendant), cherry-pick is the publish
    t.append(ActivityData.day2(spark).filter(col("txn_id") === "txn18"))
    intercept[IllegalArgumentException](t.fastForward("main", "staged"))
    val picked = t.cherryPick(stagedSnap.id)
    assert(picked.operation === "cherrypick")
    assert(picked.summary("cherry-picked-from") === stagedSnap.id.toString)
    assert(t.toDF.count() === 18) // 15 + txn18 + the two staged rows
    assert(t.toDF.filter(col("txn_id").isin("txn16", "txn17")).count() === 2)
    // picking the same snapshot again is rejected
    val ex = intercept[IllegalArgumentException](t.cherryPick(stagedSnap.id))
    assert(ex.getMessage.contains("already applied"))
    // a non-append snapshot that is ALREADY the published head cannot be
    // picked again (round 15: linear non-append staged commits publish by
    // fast-forward; WapIdSpec covers the moved-head re-stage refusal)
    t.deleteWhere(col("txn_id") === "txn18")
    val delSnap = t.meta.currentSnapshotId.get
    assert(intercept[IllegalArgumentException](t.cherryPick(delSnap))
      .getMessage.contains("already published"))
  }

  test("expire_snapshots keeps branch-pinned + last N, deletes exclusive files") {
    val t = fullPipeline()
    t.dropBranch("day1")
    val expired = t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 3)
    // day1's snapshot is unpinned and outside retain-last-3 -> expired
    assert(expired.nonEmpty)
    // all remaining branches still readable with correct counts
    assert(t.asOf("day2").count() === 30)
    assert(t.asOf("day5").count() === 50)
    assert(t.toDF.count() === 50)
    // no orphans left dangling beyond expired ones
    val orphans = t.removeOrphanFiles(dryRun = true, olderThanMs = Long.MaxValue)
    assert(orphans.isEmpty)
  }

  test("remove_orphan_files: dry run lists, real run deletes") {
    val t = fullPipeline()
    // plant an orphan
    val orphan = new java.io.File(s"${t.dataDir}/txn_date=2024-03-02/zz-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    // default age threshold protects fresh files (in-flight commit guard):
    // a seconds-old orphan must NOT be listed without an explicit cutoff
    assert(t.removeOrphanFiles(dryRun = true).isEmpty)
    val dry = t.removeOrphanFiles(dryRun = true, olderThanMs = Long.MaxValue)
    assert(dry === Seq("txn_date=2024-03-02/zz-orphan.parquet"))
    assert(orphan.exists())
    val real = t.removeOrphanFiles(dryRun = false, olderThanMs = Long.MaxValue)
    assert(real === dry)
    assert(!orphan.exists())
    assert(t.toDF.count() === 50)
  }

  test("rewrite_data_files sort compaction: fewer files, same data, sorted within files") {
    val t = fullPipeline()
    val before = t.toDF.groupBy("account").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val filesBefore = t.meta.currentSnapshot.get.files.size
    t.rewriteDataFilesSorted(Seq(asc_nulls_last("account"), desc_nulls_first("txn_id")))
    val after = t.toDF.groupBy("account").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after === before)
    val filesAfter = t.meta.currentSnapshot.get.files.size
    assert(filesAfter <= filesBefore)
    // per-partition files are sorted by the compaction order
    val onePart = t.meta.currentSnapshot.get.files.head
    val rows = spark.read.schema(t.schema).option("basePath", t.dataDir)
      .parquet(s"${t.dataDir}/${onePart.path}")
      .select("account", "txn_id").collect()
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).sorted.toSeq)
    // time travel through a replace snapshot still works
    assert(t.asOf("day3").count() === 45)
  }

  test("schema widening on append (mergeSchema semantics)") {
    val loc = tmpDir("graft-widen")
    val t = GraftTable.create(spark, loc, "t", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    val extra = ActivityData.day2(spark).withColumn("channel", lit("web"))
    t.append(extra)
    assert(t.schema.fieldNames.contains("channel"))
    val c = t.toDF.groupBy("channel").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    assert(c === Map("web" -> 15L, "null" -> 15L))
  }

  test("typed row-lambda null audit matches the columnar audit (Q7 fidelity)") {
    // reference WapIceberg.scala:70-75 filters with a Row lambda; the
    // product path uses the codegen-friendly columnar reduce — both must
    // count the same invalid rows
    val loc = tmpDir("graft-q7")
    val t = GraftTable.create(spark, loc, "t", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    t.append(ActivityData.badBatch(spark))
    val df = t.toDF
    val columnar = df.filter(t.schema.fieldNames.map(col(_).isNull).reduce(_ || _)).count()
    val typed = df.filter(row => (0 until row.length).exists(row.isNullAt)).count()
    assert(columnar === 3 && typed === 3)
  }

  test("merge with deleteMatched removes matched rows at file-level CoW") {
    val loc = tmpDir("graft-mergedel")
    val t = GraftTable.create(spark, loc, "t", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark)) // txn1..txn15
    import spark.implicits._
    val src = ActivityData.day1(spark).filter(col("txn_id").isin("txn1", "txn2"))
      .unionByName(ActivityData.day2(spark).filter(col("txn_id") === "txn16"))
    t.merge(src, ActivityData.mergeKeys, deleteMatched = true)
    val ids = t.toDF.select("txn_id").collect().map(_.getString(0)).toSet
    assert(!ids.contains("txn1") && !ids.contains("txn2"))
    assert(ids.contains("txn16") && t.toDF.count() === 14) // 15 - 2 + 1
    // delete-only form: drop txn16 again without inserting anything
    t.merge(ActivityData.day2(spark).filter(col("txn_id") === "txn16"),
      ActivityData.mergeKeys, insertNotMatched = false, deleteMatched = true)
    assert(t.toDF.count() === 13)
    intercept[IllegalArgumentException](
      t.merge(src, ActivityData.mergeKeys, updateCols = Seq("amount"),
        deleteMatched = true))
  }

  test("merge on a composite key") {
    import spark.implicits._
    val loc = tmpDir("graft-ck")
    val t = GraftTable.create(spark, loc, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k1", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("k2", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    t.append(Seq(("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0)).toDF("k1", "k2", "v"))
    t.merge(Seq(("a", 1, 10.0), ("c", 9, 9.0)).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    val got = t.toDF.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got === Map(("a", 1) -> 10.0, ("a", 2) -> 2.0, ("b", 1) -> 3.0, ("c", 9) -> 9.0))
  }

  test("merge rejects a source with duplicate keys") {
    import spark.implicits._
    val loc = tmpDir("graft-dupkey")
    val t = GraftTable.create(spark, loc, "t", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    val dupSrc = ActivityData.day4(spark).unionByName(
      ActivityData.day4(spark).limit(1))
    val e = intercept[IllegalArgumentException](
      t.merge(dupSrc, Seq("txn_id"), ActivityData.updateCols))
    assert(e.getMessage.contains("duplicate"))
    assert(t.toDF.count() === 15) // no partial commit
  }

  test("deleteWhere rewrites only affected partitions") {
    val t = fullPipeline()
    t.deleteWhere(col("txn_date") === "2024-03-02" && col("account") === "acc1")
    val remaining = t.toDF.filter(col("txn_date") === "2024-03-02").count()
    assert(remaining < 15 && t.toDF.count() < 50)
    assert(t.toDF.filter(col("txn_date") === "2024-03-02" && col("account") === "acc1").count() === 0)
    // other partitions untouched
    assert(t.toDF.filter(col("txn_date") === "2024-03-09").count() === 3)
  }

  test("deleteWhere keeps rows where the predicate evaluates to NULL") {
    import spark.implicits._
    val loc = tmpDir("graft-delnull")
    val t = GraftTable.create(spark, loc, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    // null-valued rows co-located in the same file as a matching row
    t.append(Seq(("a", java.lang.Double.valueOf(500.0)),
      ("b", null.asInstanceOf[java.lang.Double]),
      ("c", java.lang.Double.valueOf(10.0))).toDF("k", "v").coalesce(1))
    t.deleteWhere(col("v") > 100)
    // SQL DELETE semantics: only TRUE rows go; NULL-predicate rows stay
    val kept = t.toDF.collect().map(_.getString(0)).toSet
    assert(kept === Set("b", "c"))
  }

  test("merge treats null keys null-unsafely: target kept, source inserted") {
    import spark.implicits._
    val loc = tmpDir("graft-nullkey")
    val t = GraftTable.create(spark, loc, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    // a null-key target row sharing a file with a matched key
    t.append(Seq(("a", java.lang.Double.valueOf(1.0)),
      (null.asInstanceOf[String], java.lang.Double.valueOf(2.0))).toDF("k", "v").coalesce(1))
    val src = Seq(("a", java.lang.Double.valueOf(10.0)),
      (null.asInstanceOf[String], java.lang.Double.valueOf(20.0))).toDF("k", "v")
    t.merge(src, Seq("k"))
    // null keys never match (SQL MERGE): target (null,2.0) kept unchanged,
    // source (null,20.0) inserted as not-matched, 'a' updated
    val got = t.toDF.collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toSeq.sorted
    assert(got === Seq((None, 2.0), (None, 20.0), (Some("a"), 10.0)).sorted)
  }
}
