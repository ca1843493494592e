package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The round-15 metadata-table additions — Iceberg's `entries`,
  * `all_manifests`, and `position_deletes` views over the commit log:
  * entry STATUS distinguishes a manifest's own writes (ADDED) from files
  * a collapse carried forward (EXISTING), `all_manifests` surfaces
  * manifest reuse across the append chain, and `position_deletes`
  * expands deletion vectors back to exact row positions. */
class MetadataEntriesSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def rows(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  test("entries: append chain is all-ADDED; a binpack collapse splits ADDED vs EXISTING") {
    val t = GraftTable.create(spark, tmpDir("entries"), "entries_t", schema)
    t.append(rows(0 until 100).coalesce(1))   // snapshot 1: big file
    t.append(rows(100 until 110).coalesce(1)) // snapshot 2: small file
    t.append(rows(110 until 120).coalesce(1)) // snapshot 3: small file

    // pure append chain: one manifest per commit, every entry ADDED at
    // its own commit's sequence
    val pre = t.entriesDF.collect()
    assert(pre.length === 3)
    assert(pre.forall(r => r.getInt(0) == 0 && r.getInt(1) == 1))
    assert(pre.map(r => (r.getLong(2), r.getLong(6))).sorted.toSeq ===
      Seq((1L, 100L), (2L, 10L), (3L, 10L)))

    // compact only the small files: the collapse manifest must stamp the
    // rewritten rows ADDED at the rewrite commit and carry the untouched
    // big file EXISTING under its original sequence
    val bigSize = t.meta.currentSnapshot.get.files.map(_.sizeBytes).max
    t.rewriteDataFilesBinpack(minFileSizeBytes = bigSize)
    val post = t.entriesDF.collect()
    val added = post.filter(_.getInt(1) == 1)
    val existing = post.filter(_.getInt(1) == 0)
    assert(added.map(_.getLong(6)).sum === 20L, "rewritten rows are ADDED")
    assert(existing.map(r => (r.getLong(2), r.getLong(6))).toSeq ===
      Seq((1L, 100L)), "untouched file stays EXISTING at its own sequence")
  }

  test("entries: a MoR delete file appears as a content=2 entry") {
    val t = GraftTable.create(spark, tmpDir("entries-del"), "entries_del", schema)
    t.append(rows(0 until 50).coalesce(1))
    t.deleteWhereMoR(col("id") % 10 === 3, Seq("id"))
    val e = t.entriesDF.collect()
    val del = e.filter(_.getInt(0) == 2)
    assert(del.length === 1)
    assert(del.head.getLong(6) === 5L, "delete entry carries its key count")
    assert(del.head.getInt(1) === 1, "the delete commit's manifest owns it")
    assert(e.count(_.getInt(0) == 0) === 1)
  }

  test("all_manifests: snapshot i references manifests 1..i untouched") {
    val t = GraftTable.create(spark, tmpDir("allman"), "allman_t", schema)
    (0 until 3).foreach(i => t.append(rows(i * 10 until (i + 1) * 10).coalesce(1)))
    val rws = t.allManifestsDF
      .select("reference_snapshot_id", "added_snapshot_id", "added_records")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rws === Seq((1L, 1L, 10L), (2L, 1L, 10L), (2L, 2L, 10L),
      (3L, 1L, 10L), (3L, 2L, 10L), (3L, 3L, 10L)),
      "append manifests are shared backward across the whole chain")
  }

  test("position_deletes: DV runs expand to exact positions; row lists pass through") {
    def drive(dv: Boolean): Set[(String, Long)] = {
      val t = GraftTable.create(spark, tmpDir(s"posdel-$dv"), s"posdel_$dv",
        schema, props = if (dv) Map("write.delete.vector.enabled" -> "true")
        else Map.empty)
      t.append(rows(0 until 100).coalesce(1)) // single file: _pos i holds id i
      t.deleteWherePositional(col("id").between(10, 12) || col("id") === 40)
      val kinds = t.meta.currentSnapshot.get.deleteFiles.map(_.kind).toSet
      assert(kinds === Set(if (dv) "dv" else "position"))
      t.positionDeletesDF.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val fromDv = drive(dv = true)
    val fromList = drive(dv = false)
    assert(fromDv.map(_._2) === Set(10L, 11L, 12L, 40L))
    assert(fromList.map(_._2) === Set(10L, 11L, 12L, 40L),
      "both physical representations surface the same logical positions")
    assert(fromDv.map(_._1).size === 1, "all positions name the single data file")
  }

  test("position_deletes: plan stays bounded under 100+ delete files, all kinds in one scan pass (round 16)") {
    // rows-per-file=1 fans each positional commit out to one file per
    // deleted row (capped at 64), so two commits build a 100+-file
    // uncompacted delete set cheaply
    val t = GraftTable.create(spark, tmpDir("posdel-many"), "posdel_many",
      schema, props = Map("write.delete.rows-per-file" -> "1"))
    t.append(rows(0 until 300).coalesce(1)) // single sorted file: _pos i = id i
    t.deleteWherePositional(col("id") < 60)               // 60 parquet row lists
    t.deleteWherePositional(col("id").between(100, 159))  // 60 more
    t.setProperties(Map("write.delete.format.default" -> "avro"))
    t.deleteWherePositional(col("id").between(200, 219))  // 20 avro row lists
    t.setProperties(Map("write.delete.vector.enabled" -> "true"))
    t.deleteWherePositional(col("id") === 250)            // 1 deletion vector
    val nDel = t.meta.currentSnapshot.get.deleteFiles
      .count(d => d.isPositional || d.isDv)
    assert(nDel > 100, s"fixture must fan out 100+ delete files, got $nDel")
    val df = t.positionDeletesDF
    // one multi-path scan per KIND: plan size is O(kinds), never O(files) —
    // the former per-file union fold built 100+ branches here
    val nodes = df.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nodes <= 20, s"plan must stay bounded in the delete-file count; got $nodes nodes")
    val got = df.collect()
    assert(got.map(_.getLong(1)).toSet ===
      ((0 until 60) ++ (100 to 159) ++ (200 to 219) ++ Seq(250)).map(_.toLong).toSet,
      "all three physical kinds surface their exact positions")
    assert(got.map(_.getString(2)).distinct.length === nDel,
      "per-row provenance names every contributing delete file")
  }

  test("ancestry never emits an expired, unresolvable snapshot id (round 16)") {
    val t = GraftTable.create(spark, tmpDir("anc-exp"), "anc_exp", schema)
    (0 until 3).foreach(i => t.append(rows(i * 10 until (i + 1) * 10)))
    val future = System.currentTimeMillis() + 3600L * 1000
    t.expireSnapshots(olderThanMs = future, retainLast = 2, nowMs = future)
    val m = t.meta
    val anc = m.ancestry(m.currentSnapshotId.get)
    assert(anc.forall(id => m.snapshot(id).isDefined),
      s"ancestry leaked an unresolvable id: $anc")
    assert(anc === Seq(3L, 2L),
      "the oldest retained snapshot's dangling parent pointer stays out")
  }

  test("SQL catalog routes the three new metadata tables") {
    val wh = tmpDir("meta-cat-wh")
    spark.conf.set("spark.sql.catalog.metacat",
      "graft.table.catalog.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.metacat.warehouse", wh)
    try {
      val t = GraftTable.create(spark, s"$wh/db/mt", "db.mt", schema,
        props = Map("write.delete.vector.enabled" -> "true"))
      t.append(rows(0 until 30).coalesce(1))
      t.deleteWherePositional(col("id") < 3)
      assert(spark.sql("SELECT * FROM metacat.db.mt.entries").count() === 2)
      assert(spark.sql("SELECT * FROM metacat.db.mt.all_manifests").count() >= 2)
      assert(spark.sql("SELECT pos FROM metacat.db.mt.position_deletes ORDER BY pos")
        .collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    } finally {
      spark.conf.unset("spark.sql.catalog.metacat")
      spark.conf.unset("spark.sql.catalog.metacat.warehouse")
    }
  }
}
