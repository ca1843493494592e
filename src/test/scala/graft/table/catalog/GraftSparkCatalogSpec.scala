package graft.table.catalog

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.apps.ActivityData
import graft.table.GraftTable

class GraftSparkCatalogSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val t = GraftTable.create(spark, s"$wh/finance/activity", "finance.activity",
      ActivityData.schema, ActivityData.partitionCols, ActivityData.tableProps)
    Seq(ActivityData.day1(spark), ActivityData.day2(spark), ActivityData.day3(spark))
      .zipWithIndex.foreach { case (d, i) =>
        t.merge(d, ActivityData.mergeKeys, ActivityData.updateCols)
        t.createOrReplaceBranch(s"day${i + 1}")
      }
    wh
  }

  test("SQL reads the current snapshot through the catalog") {
    warehouse
    assert(spark.sql("SELECT count(*) AS n FROM graft.finance.activity")
      .collect().head.getLong(0) === 45)
    val byAccount = spark.sql(
      """SELECT account, count(*) AS n FROM graft.finance.activity
         GROUP BY account ORDER BY account""").collect()
    assert(byAccount.map(_.getLong(1)).sum === 45)
  }

  test("SHOW TBLPROPERTIES round-trips declared properties (incl. the waived avro delete format)") {
    warehouse
    val props = spark.sql("SHOW TBLPROPERTIES graft.finance.activity")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.wap.enabled").contains("true"))
    // recorded verbatim from the DDL; behavior is waived — delete files
    // are written as parquet (GraftTable.writeDeleteFiles), functionally
    // equivalent to the reference's avro delete files
    assert(props.get("write.delete.format.default").contains("avro"))
    assert(props.get("write.parquet.compression-codec").contains("zstd"))
  }

  test("SQL VERSION AS OF resolves branch refs and snapshot ids") {
    warehouse
    assert(spark.sql(
      "SELECT count(*) FROM graft.finance.activity VERSION AS OF 'day1'")
      .collect().head.getLong(0) === 15)
    assert(spark.sql(
      "SELECT count(*) FROM graft.finance.activity VERSION AS OF 'day2'")
      .collect().head.getLong(0) === 30)
    // numeric snapshot id: snapshot 1 is the first merge commit
    assert(spark.sql(
      "SELECT count(*) FROM graft.finance.activity VERSION AS OF '1'")
      .collect().head.getLong(0) === 15)
  }

  test("SQL TIMESTAMP AS OF picks the snapshot current at that time") {
    warehouse
    val t = GraftTable.load(spark, s"$warehouse/finance/activity")
    val snap2 = t.meta.snapshot(2L).get
    val ts = new java.sql.Timestamp(snap2.timestampMs).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft.finance.activity TIMESTAMP AS OF '$ts'")
      .collect().head.getLong(0) === 30)
  }

  test("catalog scans keep pushdown and partition pruning") {
    warehouse
    val df = spark.sql(
      """SELECT txn_id, category FROM graft.finance.activity
         WHERE txn_date = DATE'2024-03-02' AND txn_id = 'txn10'""")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(txn_id,txn10)"), plan)
    assert(df.inputFiles.forall(_.contains("txn_date=2024-03-02")), plan)
  }

  test("INSERT INTO commits append snapshots through the catalog") {
    warehouse
    spark.sql(
      """CREATE TABLE graft.finance.sqlwrite (k STRING, v DOUBLE)
         USING parquet PARTITIONED BY (k)""")
    try {
      // the SQL surface lists partition columns last (Hive convention), so
      // name the columns explicitly rather than relying on declared order
      spark.sql("INSERT INTO graft.finance.sqlwrite (k, v) VALUES ('a', 1.0), ('b', 2.0)")
      spark.sql("INSERT INTO graft.finance.sqlwrite (k, v) SELECT 'c' AS k, 3.0 AS v")
      assert(spark.sql("SELECT count(*) FROM graft.finance.sqlwrite")
        .collect().head.getLong(0) === 3)
      // each INSERT is one transactional append commit in the snapshot log
      val t = GraftTable.load(spark, s"$warehouse/finance/sqlwrite")
      assert(t.snapshotsDF.filter(col("operation") === "append").count() === 2)
      assert(t.toDF.orderBy("k").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
        === Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
    } finally spark.sql("DROP TABLE graft.finance.sqlwrite")
  }

  test("DELETE FROM runs the file-level copy-on-write commit through SQL") {
    warehouse
    spark.sql(
      """CREATE TABLE graft.finance.sqldelete (k STRING, v DOUBLE)
         USING parquet PARTITIONED BY (k)""")
    try {
      spark.sql("INSERT INTO graft.finance.sqldelete (k, v) VALUES ('a', 1.0), ('a', 2.0), ('b', 3.0), ('b', 4.0)")
      spark.sql("DELETE FROM graft.finance.sqldelete WHERE k = 'a' AND v > 1.5")
      assert(spark.sql("SELECT k, v FROM graft.finance.sqldelete ORDER BY k, v").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
        === Seq(("a", 1.0), ("b", 3.0), ("b", 4.0)))
      // the commit is a real 'delete' snapshot in the log
      val t = GraftTable.load(spark, s"$warehouse/finance/sqldelete")
      assert(t.snapshotsDF.filter(col("operation") === "delete").count() === 1)
      // round 15: a non-translatable predicate no longer fails planning —
      // GraftDeleteRule routes it to the file-level delete (here nothing
      // matches, so the state is unchanged under a real delete commit)
      spark.sql("DELETE FROM graft.finance.sqldelete WHERE length(k) > 5")
      assert(spark.sql("SELECT count(*) FROM graft.finance.sqldelete")
        .collect().head.getLong(0) === 3)
      assert(t.snapshotsDF.filter(col("operation") === "delete").count() === 2)
    } finally spark.sql("DROP TABLE graft.finance.sqldelete")
  }

  test("INSERT OVERWRITE commits an overwrite snapshot; history survives") {
    warehouse
    spark.sql("CREATE TABLE graft.finance.ow (k STRING, v DOUBLE) USING parquet")
    try {
      spark.sql("INSERT INTO graft.finance.ow VALUES ('a', 1.0), ('b', 2.0)")
      spark.sql("INSERT OVERWRITE graft.finance.ow VALUES ('c', 3.0)")
      assert(spark.sql("SELECT k FROM graft.finance.ow").collect()
        .map(_.getString(0)).toSeq === Seq("c"))
      // versioned, not destructive: the overwrite is one more snapshot and
      // the pre-overwrite state stays time-travelable
      val t = GraftTable.load(spark, s"$warehouse/finance/ow")
      assert(t.snapshotsDF.filter(col("operation") === "overwrite").count() === 1)
      assert(spark.sql("SELECT count(*) FROM graft.finance.ow VERSION AS OF '1'")
        .collect().head.getLong(0) === 2)
    } finally spark.sql("DROP TABLE graft.finance.ow")
  }

  test("CALL create_changelog_view registers the row-level diff as a view") {
    warehouse
    spark.sql("CREATE TABLE graft.finance.clv (k STRING, v DOUBLE) USING parquet")
    try {
      spark.sql("INSERT INTO graft.finance.clv VALUES ('a', 1.0), ('b', 2.0)")
      val t = GraftTable.load(spark, s"$warehouse/finance/clv")
      t.createOrReplaceBranch("base")
      spark.sql("INSERT INTO graft.finance.clv VALUES ('c', 3.0)")
      spark.sql("DELETE FROM graft.finance.clv WHERE k = 'a'")
      val r = spark.sql("""CALL graft.system.create_changelog_view(
        'finance.clv', 'base', 'main', 'clv_changes')""").collect().head
      assert(r.getString(0) === "clv_changes" && r.getLong(1) === 2L)
      val changes = spark.sql(
        "SELECT k, _change_type FROM clv_changes ORDER BY k").collect()
        .map(x => (x.getString(0), x.getString(1)))
      assert(changes.toSeq === Seq(("a", "DELETE"), ("c", "INSERT")))
    } finally spark.sql("DROP TABLE graft.finance.clv")
  }

  test("CTAS and CREATE OR REPLACE TABLE AS SELECT (the staging idiom)") {
    warehouse
    spark.sql("CREATE TABLE graft.finance.ctsrc (k STRING, v DOUBLE) USING parquet")
    try {
      spark.sql("INSERT INTO graft.finance.ctsrc VALUES ('a', 1.0), ('b', 2.0)")
      // the reference's staging-table idiom, verbatim modulo catalog name
      // (IcebergLoadActivityTask.scala:45-49): schema clone, zero rows
      spark.sql("""CREATE OR REPLACE TABLE graft.finance.cttmp AS
                   SELECT * FROM graft.finance.ctsrc LIMIT 0""")
      assert(spark.sql("SELECT count(*) FROM graft.finance.cttmp")
        .collect().head.getLong(0) === 0)
      assert(spark.table("graft.finance.cttmp").schema ===
        spark.table("graft.finance.ctsrc").schema)
      // plain CTAS carries data; re-running OR REPLACE swaps contents
      spark.sql("""CREATE OR REPLACE TABLE graft.finance.cttmp AS
                   SELECT * FROM graft.finance.ctsrc WHERE k = 'b'""")
      assert(spark.sql("SELECT k, v FROM graft.finance.cttmp").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq === Seq(("b", 2.0)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.finance.cttmp")
      spark.sql("DROP TABLE graft.finance.ctsrc")
    }
  }

  test("SQL reads honor the WAP branch redirect like the DataFrame API") {
    warehouse
    val t = graft.table.GraftTable.load(spark, s"$warehouse/finance/activity")
    spark.conf.set("spark.graft.wap.branch", "sql_wap")
    try {
      t.append(ActivityData.cleanBatch(spark)) // staged on sql_wap
      assert(spark.sql("SELECT count(*) FROM graft.finance.activity")
        .collect().head.getLong(0) === 60) // 45 + 15 staged, visible in-session
    } finally {
      spark.conf.unset("spark.graft.wap.branch")
      t.dropBranch("sql_wap")
    }
    assert(spark.sql("SELECT count(*) FROM graft.finance.activity")
      .collect().head.getLong(0) === 45) // staged rows never reached main
  }

  test("CALL system procedures mirror the reference maintenance surface") {
    warehouse
    spark.sql(
      """CREATE TABLE graft.finance.proc (k STRING, v DOUBLE)
         USING parquet PARTITIONED BY (k)""")
    try {
      val t = GraftTable.load(spark, s"$warehouse/finance/proc")
      spark.sql("INSERT INTO graft.finance.proc (k, v) VALUES ('a', 1.0), ('b', 2.0)")
      spark.sql("INSERT INTO graft.finance.proc (k, v) VALUES ('a', 3.0)")
      spark.sql("INSERT INTO graft.finance.proc (k, v) VALUES ('c', 4.0)")

      // rewrite_data_files with the reference's named-arg sort_order
      val rw = spark.sql(
        """CALL graft.system.rewrite_data_files(table => 'finance.proc',
             strategy => 'sort', sort_order => 'k ASC NULLS LAST, v DESC NULLS FIRST')""").collect()
      assert(rw.head.getInt(0) >= 1 && rw.head.getInt(1) >= 1)
      assert(t.toDF.count() === 4)

      // zorder(...) sort_order routes to the z-order rewrite
      val zw = spark.sql(
        """CALL graft.system.rewrite_data_files(table => 'finance.proc',
             strategy => 'sort', sort_order => 'zorder(v, v)')""").collect()
      assert(zw.head.getInt(1) >= 1 && t.toDF.count() === 4)

      // expire_snapshots(named): everything but the last 2, branch pins kept
      val before = t.snapshotsDF.count()
      val exp = spark.sql(
        s"""CALL graft.system.expire_snapshots(table => 'finance.proc',
              older_than => TIMESTAMP '2030-01-01 00:00:00', retain_last => 2)""").collect()
      assert(exp.nonEmpty && t.snapshotsDF.count() < before)

      // remove_orphan_files dry run then real (reference :158,:163)
      val dry = spark.sql(
        "CALL graft.system.remove_orphan_files(table => 'finance.proc', dry_run => true, older_than => TIMESTAMP '2030-01-01 00:00:00')").collect()
      val real = spark.sql(
        "CALL graft.system.remove_orphan_files(table => 'finance.proc', older_than => TIMESTAMP '2030-01-01 00:00:00')").collect()
      assert(dry.map(_.getString(0)).toSet === real.map(_.getString(0)).toSet)
      assert(t.toDF.count() === 4) // live data untouched

      // rewrite_manifests positional (reference :160)
      assert(spark.sql("CALL graft.system.rewrite_manifests('finance.proc')")
        .collect().head.getLong(0) >= 1L)

      // fast_forward positional (reference WapIceberg.scala:81)
      t.createOrReplaceBranch("main_pin")
      spark.sql("INSERT INTO graft.finance.proc (k, v) VALUES ('d', 5.0)")
      t.createOrReplaceBranch("feature2")
      val ff = spark.sql(
        "CALL graft.system.fast_forward('finance.proc', 'main_pin', 'feature2')").collect()
      assert(ff.head.getString(0) === "main_pin")
      assert(t.meta.refs("main_pin") === t.meta.refs("feature2"))

      // ancestors_of: the current head's RETAINED lineage, newest first
      // (an expired parent id dangles in ancestry() but has no snapshot
      // row to report — Iceberg's procedure likewise lists only ancestors
      // that still exist in the metadata)
      val anc = spark.sql(
        "CALL graft.system.ancestors_of(table => 'finance.proc')").collect()
      val headId = t.meta.currentSnapshotId.get
      assert(anc.head.getLong(0) === headId)
      assert(anc.map(_.getLong(0)).toSeq ===
        t.meta.ancestry(headId).filter(id => t.meta.snapshot(id).isDefined))
      // explicit snapshot_id: lineage of an older snapshot
      val mid = anc.last.getLong(0)
      val anc2 = spark.sql(
        s"CALL graft.system.ancestors_of(table => 'finance.proc', snapshot_id => $mid)").collect()
      assert(anc2.map(_.getLong(0)).toSeq ===
        t.meta.ancestry(mid).filter(id => t.meta.snapshot(id).isDefined))

      // cherrypick_snapshot: publish a branch-staged append after main moved
      t.createOrReplaceBranch("stage3")
      val staged = t.append(
        spark.range(1).selectExpr("'z' AS k", "9.0 AS v"), branch = Some("stage3"))
      spark.sql("INSERT INTO graft.finance.proc (k, v) VALUES ('e', 6.0)")
      val n = t.toDF.count()
      val cp = spark.sql(
        s"CALL graft.system.cherrypick_snapshot('finance.proc', ${staged.id}L)").collect()
      assert(cp.head.getLong(0) === staged.id)
      assert(t.toDF.count() === n + 1)
      assert(t.toDF.filter(col("k") === "z").count() === 1)

      // rewrite_position_delete_files: dangle a pos delete via binpack,
      // then compact — one file left, the dangling record reported removed
      val total = t.toDF.count()
      t.deleteWherePositional(col("k") === "z") // 1 entry
      t.rewriteDataFilesBinpack(minFileSizeBytes = Long.MaxValue)
      t.deleteWherePositional(col("k") === "e") // 1 live entry
      val pr = spark.sql(
        "CALL graft.system.rewrite_position_delete_files('finance.proc')").collect()
      assert(pr.head.getLong(0) === 2L, "two position files rewritten")
      assert(pr.head.getLong(1) === 1L, "compacted to one")
      assert(pr.head.getLong(2) === 1L, "the dangled entry dropped")
      assert(t.toDF.count() === total - 2)
    } finally spark.sql("DROP TABLE graft.finance.proc")
  }

  test("metadata tables read through SQL: t.history / t.snapshots / …") {
    warehouse
    val t = GraftTable.load(spark, s"$warehouse/finance/activity")
    // the reference's printTableMetadata shape (IcebergLoadActivityTask:84-97):
    // each SQL metadata table equals its DataFrame-API twin (the shared
    // fixture table accumulates commits from other tests, so compare, don't
    // hard-code)
    assert(spark.sql("SELECT * FROM graft.finance.activity.history").count()
      === t.history.count())
    assert(spark.sql("SELECT * FROM graft.finance.activity.metadata_log_entries").count()
      === t.metadataLogEntries.count())
    assert(spark.sql("SELECT * FROM graft.finance.activity.snapshots").count()
      === t.snapshotsDF.count())
    assert(spark.sql("SELECT sum(record_count) FROM graft.finance.activity.files")
      .collect().head.getLong(0) === t.toDF.count())
    assert(spark.sql("SELECT * FROM graft.finance.activity.manifests").count() >= 1)
    // all_files covers every retained snapshot, so it strictly contains
    // the current snapshot's live files and tags each with its adder
    val allFiles = spark.sql("SELECT * FROM graft.finance.activity.all_files")
    assert(allFiles.count() >= t.filesDF.count())
    assert(spark.sql("""SELECT count(DISTINCT snapshot_id)
                        FROM graft.finance.activity.all_files""")
      .collect().head.getLong(0) === t.snapshotsDF.count())
    assert(!allFiles.filter(col("data_sequence_number") <= 0).collect()
      .exists(_ => true))
    val refs = spark.sql(
      "SELECT name FROM graft.finance.activity.refs ORDER BY name").collect().map(_.getString(0))
    assert(refs.toSeq === t.meta.refs.keySet.toSeq.sorted)
    assert(refs.contains("main") && refs.contains("day1"))
    // a predicate over a metadata table works like any other table
    assert(spark.sql(
      """SELECT count(*) FROM graft.finance.activity.snapshots
         WHERE operation = 'merge'""").collect().head.getLong(0) === 3)
  }

  test("ALTER TABLE evolves schema and properties as metadata commits") {
    warehouse
    spark.sql("CREATE TABLE graft.finance.alt (k STRING, v DOUBLE) USING parquet")
    try {
      spark.sql("INSERT INTO graft.finance.alt (k, v) VALUES ('a', 1.0)")
      val t = GraftTable.load(spark, s"$warehouse/finance/alt")
      val filesBefore = t.meta.currentSnapshot.get.files.map(_.path).toSet
      spark.sql("ALTER TABLE graft.finance.alt ADD COLUMNS (score INT COMMENT 'quality')")
      // existing rows read NULL for the new column; no file was rewritten
      val r = spark.sql("SELECT k, v, score FROM graft.finance.alt").collect().head
      assert(r.getString(0) === "a" && r.isNullAt(2))
      assert(t.meta.currentSnapshot.get.files.map(_.path).toSet === filesBefore)
      // writes through the evolved schema round-trip
      spark.sql("INSERT INTO graft.finance.alt (k, v, score) VALUES ('b', 2.0, 9)")
      assert(spark.sql("SELECT score FROM graft.finance.alt WHERE k = 'b'")
        .collect().head.getInt(0) === 9)
      spark.sql("ALTER TABLE graft.finance.alt SET TBLPROPERTIES ('write.wap.enabled' = 'true')")
      assert(t.meta.props("write.wap.enabled") === "true")
      spark.sql("ALTER TABLE graft.finance.alt UNSET TBLPROPERTIES ('write.wap.enabled')")
      assert(!t.meta.props.contains("write.wap.enabled"))
      // drop/rename are metadata-only commits (SchemaEvolutionSpec covers
      // the era semantics); only Iceberg's SAFE promotions are accepted —
      // a lossy retype (double -> string) is rejected
      // (TypePromotionSpec covers the allowed set)
      spark.sql("ALTER TABLE graft.finance.alt DROP COLUMN score")
      assert(!spark.table("graft.finance.alt").columns.contains("score"))
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE graft.finance.alt ALTER COLUMN v TYPE STRING") }
      assert(e.getMessage.contains("Unsupported type change"), e.getMessage)
    } finally spark.sql("DROP TABLE graft.finance.alt")
  }

  test("DDL via the catalog: CREATE TABLE / list / DROP") {
    warehouse
    spark.sql(
      """CREATE TABLE graft.finance.scratch (k STRING, v DOUBLE)
         USING parquet PARTITIONED BY (k)""")
    assert(spark.sql("SHOW TABLES IN graft.finance").collect()
      .map(_.getString(1)).toSet === Set("activity", "scratch"))
    // written through the API, readable through SQL
    import spark.implicits._
    GraftTable.load(spark, s"$warehouse/finance/scratch")
      .append(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    assert(spark.sql("SELECT count(*) FROM graft.finance.scratch")
      .collect().head.getLong(0) === 2)
    spark.sql("DROP TABLE graft.finance.scratch")
    assert(!GraftTable.exists(spark, s"$warehouse/finance/scratch"))
  }

  test("unfiltered COUNT(*) is a metadata-only local scan; filters fall back") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.finance.cnt (k STRING, v DOUBLE) USING graft")
    val t = GraftTable.load(spark, s"$warehouse/finance/cnt")
    t.append((0 until 500).map(i => (s"k$i", i * 1.0)).toDF("k", "v"))
    t.append((500 until 800).map(i => (s"k$i", i * 1.0)).toDF("k", "v"))
    val q = spark.sql("SELECT count(*) FROM graft.finance.cnt")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("FileScan")
      && !plan.contains("BatchScan"),
      s"unfiltered COUNT(*) must come from the snapshot log:\n$plan")
    assert(q.collect().head.getLong(0) === 800L)
    // time travel counts from the pinned snapshot's metadata
    val firstSnap = t.meta.snapshots.map(_.id).min
    assert(spark.sql(
      s"SELECT count(*) FROM graft.finance.cnt VERSION AS OF $firstSnap")
      .collect().head.getLong(0) === 500L)
    // any filter disables the metadata answer (rows would be removed)
    val f = spark.sql("SELECT count(*) FROM graft.finance.cnt WHERE v < 100")
    assert(!f.queryExecution.executedPlan.toString.contains("GraftMetaCountScan"))
    assert(f.collect().head.getLong(0) === 100L)
    // grouped aggregates are never served from metadata
    val g = spark.sql("SELECT k, count(*) FROM graft.finance.cnt GROUP BY k")
    assert(!g.queryExecution.executedPlan.toString.contains("GraftMetaCountScan"))
    assert(g.count() === 800L)
    spark.sql("DROP TABLE graft.finance.cnt")
  }

  test("ALTER TABLE RENAME TO moves a physical table; reads, time travel, and the old name all follow") {
    warehouse
    val loc = s"$warehouse/finance/rn_a"
    val t = GraftTable.create(spark, loc, "finance.rn_a",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
    import spark.implicits._
    t.append((0L until 5L).map(i => (i, i * 2)).toDF("id", "v"))
    val snap1 = t.meta.currentSnapshot.get.id
    t.append((5L until 8L).map(i => (i, i * 2)).toDF("id", "v"))
    spark.sql("ALTER TABLE graft.finance.rn_a RENAME TO finance.rn_b")
    assert(spark.sql("SELECT count(*) FROM graft.finance.rn_b")
      .collect().head.getLong(0) === 8L)
    // history moved with the directory: time travel to the pre-rename snapshot
    assert(spark.sql(
      s"SELECT count(*) FROM graft.finance.rn_b VERSION AS OF $snap1")
      .collect().head.getLong(0) === 5L)
    // the old name is gone
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft.finance.rn_a").collect() }
    assert(err.getMessage.contains("rn_a"))
    // display name followed the move
    assert(GraftTable.load(spark, s"$warehouse/finance/rn_b")
      .meta.name === "finance.rn_b")
    spark.sql("DROP TABLE graft.finance.rn_b")
  }

  test("RENAME TO of a registered pointer re-points the slot; the target table is never touched") {
    warehouse
    val srcLoc = s"$warehouse/finance/rn_src_real"
    val src = GraftTable.create(spark, srcLoc, "finance.rn_src_real",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    import spark.implicits._
    src.append((0L until 4L).map(i => Tuple1(i)).toDF("id"))
    spark.sql(s"CALL graft.system.register_table('finance.rn_ptr', '$srcLoc')")
    assert(spark.sql("SELECT count(*) FROM graft.finance.rn_ptr")
      .collect().head.getLong(0) === 4L)
    spark.sql("ALTER TABLE graft.finance.rn_ptr RENAME TO finance.rn_ptr2")
    assert(spark.sql("SELECT count(*) FROM graft.finance.rn_ptr2")
      .collect().head.getLong(0) === 4L)
    intercept[Exception] { spark.sql("SELECT * FROM graft.finance.rn_ptr").collect() }
    // the pointed-at table itself never moved
    assert(GraftTable.load(spark, srcLoc).toDF.count() === 4L)
    // dropping the renamed pointer unregisters only
    spark.sql("DROP TABLE graft.finance.rn_ptr2")
    assert(GraftTable.load(spark, srcLoc).toDF.count() === 4L)
  }

  test("RENAME TO refuses an occupied destination and a missing source") {
    warehouse
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE graft.finance.activity RENAME TO finance.activity") }
    assert(err.getMessage.contains("already exists"))
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.finance.rn_nope RENAME TO finance.rn_x") }
  }

  test("CALL rollback_to_timestamp / set_current_snapshot / publish_changes") {
    warehouse
    spark.sql("""CREATE TABLE graft.finance.proc2 (id BIGINT) USING parquet
                 TBLPROPERTIES ('write.wap.enabled'='true')""")
    spark.sql("INSERT INTO graft.finance.proc2 SELECT id FROM range(5)")
    val t = GraftTable.load(spark, s"$warehouse/finance/proc2")
    val s1 = t.meta.refs("main")
    Thread.sleep(15)
    val ts1 = System.currentTimeMillis()
    Thread.sleep(15)
    spark.sql("INSERT INTO graft.finance.proc2 SELECT id + 5 FROM range(5)")
    val s2 = t.meta.refs("main")
    def count() = spark.sql("SELECT count(*) FROM graft.finance.proc2")
      .collect().head.getLong(0)
    assert(count() === 10L)
    // rewind to the snapshot current at ts1 (between the two appends)
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ts1))
    val rb = spark.sql(s"""CALL graft.system.rollback_to_timestamp(
        table => 'finance.proc2', timestamp => TIMESTAMP '$lit')""")
      .collect().head
    assert(rb.getLong(0) === s2 && rb.getLong(1) === s1)
    assert(count() === 5L)
    // jump forward again: s2 is NOT an ancestor of main anymore? it IS a
    // descendant — rollback refuses forward moves, set_current_snapshot
    // does not care either way
    spark.sql(s"CALL graft.system.set_current_snapshot('finance.proc2', ${s2}L)")
    assert(count() === 10L)
    // WAP: stage an append under an id (no ref moves), then publish it
    spark.conf.set("spark.wap.id", "batch42")
    try {
      spark.sql("INSERT INTO graft.finance.proc2 SELECT id + 100 FROM range(3)")
      assert(count() === 10L, "staged-by-id commit must not move main")
    } finally spark.conf.unset("spark.wap.id")
    val staged = t.snapshotForWapId("batch42")
    assert(staged.isDefined)
    val pub = spark.sql(
      "CALL graft.system.publish_changes('finance.proc2', 'batch42')")
      .collect().head
    assert(pub.getLong(0) === staged.get.id)
    assert(count() === 13L)
    // unknown and double publish both refuse
    intercept[Exception] { spark.sql(
      "CALL graft.system.publish_changes('finance.proc2', 'nope')").collect() }
    intercept[Exception] { spark.sql(
      "CALL graft.system.publish_changes('finance.proc2', 'batch42')").collect() }
    spark.sql("DROP TABLE graft.finance.proc2")
  }

  test("TRUNCATE TABLE commits a versioned delete; history survives") {
    warehouse
    spark.sql("CREATE TABLE graft.finance.trc (id BIGINT) USING parquet")
    spark.sql("INSERT INTO graft.finance.trc SELECT id FROM range(9)")
    val t = GraftTable.load(spark, s"$warehouse/finance/trc")
    val before = t.meta.refs("main")
    spark.sql("TRUNCATE TABLE graft.finance.trc")
    assert(spark.sql("SELECT count(*) FROM graft.finance.trc")
      .collect().head.getLong(0) === 0L)
    // versioned, not destructive: the pre-truncate snapshot still reads
    assert(spark.sql(
      s"SELECT count(*) FROM graft.finance.trc VERSION AS OF $before")
      .collect().head.getLong(0) === 9L)
    spark.sql("DROP TABLE graft.finance.trc")
  }
}
