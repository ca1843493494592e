package graft.table

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Property-style invariants over seeded random datasets (SURVEY.md §5.2.4):
 * merge idempotence, time-travel immutability, compaction multiset
 * preservation, expiry never losing branch-pinned data.
 */
class TableInvariantsSpec extends SparkTestBase {

  private def randomBatch(spark: SparkSession, seed: Long, n: Int,
      keyspace: Int): DataFrame = {
    import spark.implicits._
    val rnd = new Random(seed)
    (1 to n).map { _ =>
      val k = rnd.nextInt(keyspace)
      (s"k$k", rnd.nextInt(4), rnd.nextDouble() * 100, s"v${rnd.nextInt(1000)}")
    }.toDF("key", "part", "amount", "payload")
  }

  private def contentHash(df: DataFrame): Seq[String] =
    df.select(md5(concat_ws("|", df.columns.sorted.map(c =>
      coalesce(col(c).cast("string"), lit("NULL"))): _*)).as("h"))
      .orderBy("h").collect().map(_.getString(0)).toSeq

  private def freshTable(tag: String): GraftTable = {
    import org.apache.spark.sql.types._
    GraftTable.create(spark, tmpDir(tag), tag, StructType(Seq(
      StructField("key", StringType), StructField("part", IntegerType),
      StructField("amount", DoubleType), StructField("payload", StringType))),
      partitionCols = Seq("part"))
  }

  test("merge is idempotent: re-merging the same source changes nothing") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val t = freshTable(s"inv-idem-$seed")
      t.append(randomBatch(spark, seed, 200, 80))
      val src = randomBatch(spark, seed + 100, 60, 80)
        .dropDuplicates("key")
      t.merge(src, Seq("key"))
      val once = contentHash(t.toDF)
      t.merge(src, Seq("key"))
      assert(contentHash(t.toDF) === once, s"seed $seed")
    }
  }

  test("merge result equals dropDuplicates-union semantics") {
    for (seed <- Seq(7L, 8L)) {
      val t = freshTable(s"inv-sem-$seed")
      val base = randomBatch(spark, seed, 150, 50).dropDuplicates("key")
      val src = randomBatch(spark, seed + 1, 70, 50).dropDuplicates("key")
      t.append(base)
      t.merge(src, Seq("key"))
      // expected: src rows win per key, others kept
      val expected = src.unionByName(base.join(src, Seq("key"), "left_anti"))
      assert(contentHash(t.toDF) === contentHash(expected), s"seed $seed")
    }
  }

  test("time travel is immutable under later merges/appends/compaction") {
    for (seed <- Seq(11L, 12L)) {
      val t = freshTable(s"inv-tt-$seed")
      t.append(randomBatch(spark, seed, 120, 40))
      t.createOrReplaceBranch("pin")
      val pinned = contentHash(t.asOf("pin"))
      t.merge(randomBatch(spark, seed + 5, 50, 40).dropDuplicates("key"), Seq("key"))
      t.append(randomBatch(spark, seed + 6, 30, 40))
      t.rewriteDataFilesSorted(Seq(asc("key")))
      assert(contentHash(t.asOf("pin")) === pinned, s"seed $seed")
    }
  }

  test("sort compaction preserves the exact row multiset") {
    val t = freshTable("inv-compact")
    t.append(randomBatch(spark, 21L, 300, 60))
    t.append(randomBatch(spark, 22L, 300, 60))
    val before = contentHash(t.toDF)
    t.rewriteDataFilesSorted(Seq(asc_nulls_last("key"), desc("amount")))
    assert(contentHash(t.toDF) === before)
  }

  test("expiry never loses data referenced by a live branch") {
    val t = freshTable("inv-expire")
    for (i <- 1 to 5) {
      t.append(randomBatch(spark, 30L + i, 50, 30))
      t.createOrReplaceBranch(s"b$i")
    }
    val b2 = contentHash(t.asOf("b2"))
    t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    t.removeOrphanFiles(dryRun = false)
    assert(contentHash(t.asOf("b2")) === b2)
    assert(t.asOf("b5").count() === 250)
  }

  test("metadata-version retention honors write.metadata.delete-after-commit") {
    import org.apache.spark.sql.types._
    def metaFiles(t: GraftTable): Seq[String] = {
      val dir = new java.io.File(t.location, "_graft")
      dir.listFiles().map(_.getName).filter(_.matches("v\\d+\\.metadata\\.json"))
        .sorted.toSeq
    }
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("amount", DoubleType)))
    // opt-in: only the current + 2 previous metadata roots survive commits
    val t = GraftTable.create(spark, tmpDir("metaret"), "metaret", schema,
      props = Map("write.metadata.delete-after-commit.enabled" -> "true",
        "write.metadata.previous-versions-max" -> "2"))
    import spark.implicits._
    val firstId = {
      t.append(Seq(("a", 1.0)).toDF("key", "amount"))
      t.meta.currentSnapshotId.get
    }
    (2 to 6).foreach(i => t.append(Seq((s"k$i", i.toDouble)).toDF("key", "amount")))
    val files = metaFiles(t)
    assert(files.size === 3, s"expected current + 2 previous, got $files")
    // history and time travel live in the CURRENT metadata — unaffected
    assert(t.meta.snapshots.size === 6)
    assert(t.asOf(firstId.toString).count() === 1)
    assert(t.toDF.count() === 6)
    // metadata_log_entries still lists the full lineage (Iceberg behavior)
    assert(t.metadataLogEntries.count() >= 6)
    // default (no property): every root version is retained
    val t2 = GraftTable.create(spark, tmpDir("metaret2"), "metaret2", schema)
    (1 to 5).foreach(i => t2.append(Seq((s"k$i", i.toDouble)).toDF("key", "amount")))
    assert(metaFiles(t2).size === 6) // v0 create + 5 appends
  }

  test("entries/all_manifests/position_deletes agree with the commit metadata " +
      "through appends, MoR deletes, DV deletes and compaction") {
    val t = freshTable("inv-meta-views")
    t.setProperties(Map("write.delete.vector.enabled" -> "true"))
    for (seed <- Seq(11L, 12L, 13L)) t.append(randomBatch(spark, seed, 150, 60))
    t.deleteWhereMoR(col("amount") > 80, Seq("key", "part", "amount", "payload"))
    t.deleteWherePositional(col("amount") < 2)

    def checkViews(): Unit = {
      val head = t.meta.currentSnapshot.get
      val e = t.entriesDF.collect()
      // entry accounting == commit metadata, exactly
      assert(e.count(_.getInt(0) == 0) === head.files.size)
      assert(e.filter(_.getInt(0) == 0).map(_.getLong(6)).sum ===
        head.files.map(_.records).sum)
      assert(e.count(_.getInt(0) != 0) === head.deleteFiles.size)
      val dvRecords = head.deleteFiles.filter(d => d.isDv || d.isPositional)
        .map(_.records).sum
      assert(t.positionDeletesDF.count() === dvRecords,
        "expanded DV positions must equal the recorded covered-position count")
      // every manifest any retained snapshot references appears in
      // all_manifests under exactly that snapshot
      val am = t.allManifestsDF.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val expected = t.meta.snapshots
        .flatMap(s => s.manifestRefs.map(n => (s.id, n))).toSet
      assert(am === expected)
    }
    val before = contentHash(t.toDF)
    checkViews()
    // compaction rewrites the physical layout; the views must keep
    // agreeing with the new metadata and the data must not move
    t.rewriteDataFilesBinpack(minFileSizeBytes = Long.MaxValue)
    checkViews()
    assert(contentHash(t.toDF) === before,
      "binpack must preserve the exact row multiset")
  }
}
