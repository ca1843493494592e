package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Row lineage (Iceberg v3): every committed data file is assigned a
 * `firstRowId` from the table's monotonic counter, and a row's `_row_id`
 * is firstRowId + its file position — UNLESS the file materializes
 * `__row_id`/`__last_seq` columns, which every preserving rewrite
 * (compaction, CoW delete/update/merge, MoR new-version appends) writes
 * so rows KEEP their identity across rewrites. A NULL materialized cell
 * means "assign fresh" (inserted rows / update bumps) — the v3
 * inheritance rule. `_last_updated_sequence_number` is the sequence of
 * the commit that last created or updated the row.
 */
class RowLineageSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField("p", StringType)))

  private def fresh(prefix: String, rows: Seq[(Long, Double, String)],
      props: Map[String, String] = Map.empty): GraftTable = {
    val t = GraftTable.create(spark, tmpDir(prefix), s"t_$prefix", schema,
      partitionCols = Seq("p"), props = props)
    import spark.implicits._
    t.append(rows.toDF("k", "v", "p"))
    t
  }

  private def lineage(t: GraftTable): Map[Long, (Long, Long)] =
    t.metadataDF.select("k", "_row_id", "_last_updated_sequence_number")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("appends assign dense unique ids; two commits never overlap") {
    val t = fresh("assign", Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b")))
    import spark.implicits._
    t.append(Seq((4L, 4.0, "a"), (5L, 5.0, "b")).toDF("k", "v", "p"))
    val ids = t.metadataDF.select("_row_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 5L), s"dense unique ids expected: ${ids.toSeq}")
    assert(t.meta.nextRowId === 5L)
    // every live file carries its firstRowId
    assert(t.meta.currentSnapshot.get.files.forall(_.firstRowId.isDefined))
  }

  test("compaction preserves every row's id and last-updated sequence") {
    val t = fresh("compact", Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b")))
    val before = lineage(t)
    t.rewriteDataFilesSorted(Seq(desc("v")))
    assert(lineage(t) === before,
      "a content no-op rewrite must not move ids or sequences")
    // the rewritten files are marked materialized
    assert(t.meta.currentSnapshot.get.files.forall(_.lineage))
    // and a SECOND compaction (reading materialized files) still preserves
    t.rewriteDataFilesBinpack(minFileSizeBytes = 1L << 20)
    assert(lineage(t) === before)
  }

  test("CoW delete: survivors keep their ids") {
    val t = fresh("del", Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b")))
    val before = lineage(t)
    t.deleteWhere(col("k") === 1L)
    val after = lineage(t)
    assert(after.keySet === Set(2L, 3L))
    assert(after(2L) === before(2L) && after(3L) === before(3L),
      "carryover rows of the rewritten file keep id AND sequence")
  }

  test("CoW update: updated rows keep ids and take the new sequence; carryovers keep both") {
    val t = fresh("upd", Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b")))
    val before = lineage(t)
    val snap = t.updateWhere(col("k") === 2L, Seq("v" -> lit(20.0)))
    val after = lineage(t)
    assert(after(2L)._1 === before(2L)._1, "updated row keeps its id")
    assert(after(2L)._2 === snap.id, "updated row takes the update's sequence")
    assert(after(1L) === before(1L), "same-file carryover keeps both")
    assert(after(3L) === before(3L), "untouched file keeps both")
  }

  test("merge: matched rows keep ids with bumped sequence; inserts get fresh ids") {
    import spark.implicits._
    val t = fresh("merge", Seq((1L, 1.0, "a"), (2L, 2.0, "a")))
    val before = lineage(t)
    val snap = t.merge(Seq((2L, 22.0, "a"), (9L, 9.0, "b")).toDF("k", "v", "p"),
      keys = Seq("k"))
    val after = lineage(t)
    assert(after(2L)._1 === before(2L)._1 && after(2L)._2 === snap.id)
    assert(after(1L)._1 === before(1L)._1,
      "carryover in the rewritten file keeps its id")
    assert(after(9L)._2 === snap.id)
    assert(!before.values.map(_._1).toSet.contains(after(9L)._1),
      "the inserted row's id must be fresh")
    assert(after.values.map(_._1).toSet.size === 3, "ids stay unique")
  }

  test("MoR delete leaves ids untouched; MoR update keeps id on the new version") {
    import spark.implicits._
    val t = fresh("mor", Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b")),
      props = Map("write.delete.mode" -> "merge-on-read"))
    val before = lineage(t)
    t.deleteWhereMoR(col("k") === 1L, keyCols = Seq("k"))
    val afterDel = lineage(t)
    assert(afterDel === before.removed(1L),
      "a MoR delete never rewrites surviving rows")
    val snap = t.updateWhereMoR(col("k") === 2L, Seq("v" -> lit(20.0)),
      keyCols = Seq("k"))
    val afterUpd = lineage(t)
    assert(afterUpd(2L)._1 === before(2L)._1,
      "the appended new version keeps the row's id")
    assert(afterUpd(2L)._2 === snap.id)
    assert(afterUpd(3L) === before(3L))
  }

  test("general conditional merge (CoW and MoR) preserves identity") {
    import spark.implicits._
    import graft.table.MergeClause
    import graft.table.MergeClause.src
    for (mor <- Seq(false, true)) {
      val t = fresh(s"gm-$mor", Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b")))
      val before = lineage(t)
      val srcDF = Seq((2L, 22.0, "a"), (9L, 9.0, "b")).toDF("sk", "sv", "sp")
      val keys = Seq("k" -> col("sk"))
      val matched = Seq(MergeClause.Update(None, Seq("v" -> src("sv"))))
      val notMatched = Seq(MergeClause.Insert(None,
        Seq("k" -> src("sk"), "v" -> src("sv"), "p" -> src("sp"))))
      val snap = if (mor) t.mergeIntoMoR(srcDF, keys, matched, notMatched)
      else t.mergeInto(srcDF, keys, matched, notMatched)
      val after = lineage(t)
      assert(after(2L)._1 === before(2L)._1, s"mor=$mor: updated row keeps id")
      assert(after(2L)._2 === snap.id, s"mor=$mor: updated row bumps sequence")
      assert(after(1L) === before(1L), s"mor=$mor: carryover keeps both")
      assert(after.values.map(_._1).toSet.size === 4, s"mor=$mor: ids unique")
    }
  }

  test("rollback never reuses ids: divergent histories stay disjoint") {
    import spark.implicits._
    val t = fresh("rb", Seq((1L, 1.0, "a"), (2L, 2.0, "a")))
    val keep = t.meta.currentSnapshotId.get
    t.append(Seq((3L, 3.0, "b")).toDF("k", "v", "p")) // ids 2
    t.rollbackToSnapshot(keep)
    t.append(Seq((4L, 4.0, "b")).toDF("k", "v", "p")) // must NOT reuse id 2
    val after = lineage(t)
    assert(after(4L)._1 === 3L,
      "the counter is table-lifetime monotonic; rollback does not rewind it")
  }

  test("SQL surface: _row_id and _last_updated_sequence_number resolve as metadata columns") {
    val wh = tmpDir("lineage-cat")
    spark.conf.set("spark.sql.catalog.glin",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.glin.warehouse", wh)
    spark.sql("CREATE TABLE glin.ns.t (k BIGINT, v DOUBLE) USING parquet")
    try {
      spark.sql("INSERT INTO glin.ns.t VALUES (1, 1.0), (2, 2.0)")
      spark.sql("INSERT INTO glin.ns.t VALUES (3, 3.0)")
      val rows = spark.sql(
        "SELECT k, _row_id, _last_updated_sequence_number FROM glin.ns.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.map(_._2).toSet === Set(0L, 1L, 2L))
      assert(rows.map(_._3).toSet.size === 2, "two commits, two sequences")
      // UPDATE through SQL keeps the id, bumps the sequence
      spark.sql("UPDATE glin.ns.t SET v = 9.0 WHERE k = 1")
      val r1 = spark.sql(
        "SELECT _row_id, _last_updated_sequence_number FROM glin.ns.t WHERE k = 1")
        .collect().head
      assert(r1.getLong(0) === rows.find(_._1 == 1L).get._2)
      assert(r1.getLong(1) > rows.map(_._3).max)
    } finally spark.sql("DROP TABLE glin.ns.t")
  }

  test("lineage composes with schema-evolution eras and defaults") {
    import spark.implicits._
    val t = fresh("era", Seq((1L, 1.0, "a"), (2L, 2.0, "a")))
    val before = lineage(t)
    t.addColumn("tag", StringType, defaultSql = Some("'x'"))
    t.renameColumn("v", "w")
    t.append(Seq((3L, 3.0, "b", "y")).toDF("k", "w", "p", "tag"))
    val after = lineage(t)
    assert(after(1L) === before(1L) && after(2L) === before(2L))
    // compaction across eras: ids survive the physical rewrite
    t.rewriteDataFilesSorted(Seq(asc("k")))
    assert(lineage(t).view.filterKeys(Set(1L, 2L)).toMap ===
      before.view.filterKeys(Set(1L, 2L)).toMap)
    assert(t.toDF.filter(col("k") === 1L).select("tag").head.getString(0) === "x")
  }
}
