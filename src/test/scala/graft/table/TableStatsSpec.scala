package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Column-level NDV statistics (round 14): `compute_table_stats` persists
  * per-column HLL-sketch NDV + exact null counts pinned to a snapshot,
  * the DSv2 scan serves them through Spark's `Statistics`, and CBO uses
  * them — spec-pinned by an actual join-strategy flip. */
class TableStatsSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("grp", StringType),
    StructField("v", StringType)))

  private def mkTable(name: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(name), name, schema)
    // 20k rows, grp has exactly 100 distinct values, some nulls in v
    t.append((0 until 20000).map(i => (i.toLong, s"g${i % 100}",
      if (i % 10 == 0) null else s"val-$i-${"x" * 20}")).toDF("k", "grp", "v"))
    t
  }

  test("computeTableStats: exact null counts and ~exact NDV, snapshot-pinned") {
    val t = mkTable("stats-basic")
    val rec = t.computeTableStats()
    assert(rec.rowCount === 20000L)
    assert(rec.snapshotId === t.meta.currentSnapshotId.get)
    assert(rec.cols("v").nullCount === 2000L)
    assert(rec.cols("k").nullCount === 0L)
    // HLL at default lgK is near-exact at these cardinalities
    assert(math.abs(rec.cols("grp").ndv - 100L) <= 5,
      s"grp ndv ${rec.cols("grp").ndv}")
    val kNdv = rec.cols("k").ndv.toDouble
    assert(math.abs(kNdv / 20000.0 - 1.0) < 0.05, s"k ndv $kNdv")
    // persisted: a fresh load serves the same record
    val again = GraftTable.load(spark, t.location).meta.columnStats.get
    assert(again === rec)
  }

  test("scan Statistics: rowCount + NDV served only for the pinned snapshot") {
    val t = mkTable("stats-scan")
    t.computeTableStats()
    val cat = {
      val wh = new java.io.File(t.location).getParent
      spark.conf.set("spark.sql.catalog.statcat",
        "graft.table.catalog.GraftSparkCatalog")
      spark.conf.set("spark.sql.catalog.statcat.warehouse", wh)
      spark.sql(s"CALL statcat.system.register_table('stats_scan_t', '${t.location}')")
      "statcat"
    }
    def relStats = spark.table(s"$cat.stats_scan_t")
      .queryExecution.optimizedPlan.stats
    val st = relStats
    assert(st.rowCount === Some(BigInt(20000)))
    assert(st.attributeStats.nonEmpty, "column stats must reach the plan")
    val grpStat = st.attributeStats.find(_._1.name == "grp").map(_._2)
    assert(grpStat.exists(_.distinctCount.exists(d =>
      (d - 100).abs <= 5)), s"grp stat $grpStat")
    // an append WITHOUT incremental maintenance makes the stats stale for
    // the new snapshot: the scan must stop serving them, never lie
    import spark.implicits._
    t.append(Seq((90000L, "gX", "v")).toDF("k", "grp", "v"))
    assert(relStats.rowCount.isEmpty,
      "stale stats must not be served for a later snapshot")
  }

  test("partition-pruned scans suppress whole-table stats; DPP still applies (round 15)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("stats-part"), "statspart", schema,
      partitionCols = Seq("grp"))
    t.append((0 until 4000).map(i => (i.toLong, s"g${i % 8}", s"v$i"))
      .toDF("k", "grp", "v"))
    t.computeTableStats()
    val wh = new java.io.File(t.location).getParent
    spark.conf.set("spark.sql.catalog.statpcat",
      "graft.table.catalog.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.statpcat.warehouse", wh)
    spark.sql(s"CALL statpcat.system.register_table('stats_part_t', '${t.location}')")
    // unfiltered: the stored whole-table rowCount serves
    val full = spark.table("statpcat.stats_part_t")
      .queryExecution.optimizedPlan.stats
    assert(full.rowCount === Some(BigInt(4000)))
    // partition filter consumed by the scan, no compensating Filter node:
    // the whole-table rowCount must NOT be served (it would overstate 8x)
    val pruned = spark.table("statpcat.stats_part_t").filter(col("grp") === "g3")
      .queryExecution.optimizedPlan.stats
    assert(!pruned.rowCount.contains(BigInt(4000)),
      s"partition-pruned scan served whole-table rowCount: $pruned")

    // runtime (DPP) filtering: a selective dim joined on the partition
    // column prunes partitions before tasks launch
    val dimDir = tmpDir("stats-dpp-dim")
    (0L until 8L).map(i => (s"g$i", if (i == 3) "hot" else s"l$i"))
      .toDF("grp", "label").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("__stats_dim")
    org.apache.spark.sql.graft.GraftStatsScan.lastPlannedFiles.set(-1)
    val totalFiles = t.meta.currentSnapshot.get.files.size
    val j = spark.sql(
      """SELECT count(*) FROM statpcat.stats_part_t f
         JOIN __stats_dim d ON f.grp = d.grp WHERE d.label = 'hot'""")
    assert(j.collect().head.getLong(0) === 500L)
    val planned = org.apache.spark.sql.graft.GraftStatsScan.lastPlannedFiles.get()
    assert(planned >= 1 && planned < totalFiles,
      s"runtime filter should prune partitions: planned=$planned of $totalFiles")
  }

  test("write.stats.ndv.enabled: appends advance the sketches O(delta)") {
    import spark.implicits._
    val t = mkTable("stats-incr")
    t.setProperties(Map("write.stats.ndv.enabled" -> "true"))
    t.computeTableStats()
    // delta introduces 50 NEW grp values and 1000 new rows, 100 new v nulls
    t.append((0 until 1000).map(i => (100000L + i, s"h${i % 50}",
      if (i % 10 == 0) null else s"nv-$i")).toDF("k", "grp", "v"))
    val rec = t.meta.columnStats.get
    assert(rec.snapshotId === t.meta.currentSnapshotId.get,
      "incremental maintenance must re-pin stats to the new head")
    assert(rec.rowCount === 21000L)
    assert(rec.cols("v").nullCount === 2100L)
    assert(math.abs(rec.cols("grp").ndv - 150L) <= 8,
      s"unioned grp ndv ${rec.cols("grp").ndv}")
  }

  test("ANALYZE TABLE ... COMPUTE STATISTICS routes to compute_table_stats") {
    val t = mkTable("stats-analyze")
    val wh = new java.io.File(t.location).getParent
    spark.conf.set("spark.sql.catalog.acat", "graft.table.catalog.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.acat.warehouse", wh)
    spark.sql(s"CALL acat.system.register_table('analyze_t', '${t.location}')")
    assert(t.meta.columnStats.isEmpty)
    spark.sql("ANALYZE TABLE acat.analyze_t COMPUTE STATISTICS FOR ALL COLUMNS")
    val rec = GraftTable.load(spark, t.location).meta.columnStats.get
    assert(rec.rowCount === 20000L)
    assert(rec.cols.contains("grp"))
  }

  test("the stats flip a join strategy: CBO shrinks a selective filter below the broadcast bar") {
    import spark.implicits._
    val big = mkTable("stats-join-big")
    val probe = (0 until 2000).map(i => (i.toLong % 100, s"p$i"))
      .toDF("pk", "payload")
    val wh = new java.io.File(big.location).getParent
    spark.conf.set("spark.sql.catalog.jcat", "graft.table.catalog.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.jcat.warehouse", wh)
    spark.sql(s"CALL jcat.system.register_table('join_big', '${big.location}')")
    probe.createOrReplaceTempView("probe_side")

    def joinPlan: String = spark.sql(
      """SELECT /*+ MERGE(p) */ b.grp, count(*)
         FROM jcat.join_big b JOIN probe_side p ON b.k = p.pk
         WHERE b.grp = 'g7' GROUP BY b.grp""").queryExecution.sparkPlan.toString

    val flipConfs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      // between: the pruned raw-scan estimate of the filtered side
      // (~24.5 KB measured) and the NDV-estimated g7 slice
      // (20k/100 = 200 rows → 7.2 KB)
      "spark.sql.autoBroadcastJoinThreshold" -> 10000.toString)
    val saved = flipConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      flipConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      // plan BEFORE stats: the filtered side's size is the raw scan
      // estimate — too big to broadcast
      val before = spark.sql(
        """SELECT b.grp, count(*) FROM jcat.join_big b
           JOIN probe_side p ON b.k = p.pk
           WHERE b.grp = 'g7' GROUP BY b.grp""")
        .queryExecution.sparkPlan.toString
      assert(!before.contains("BroadcastHashJoin"),
        s"pre-stats plan must not broadcast the big side:\n$before")
      // compute stats → CBO's FilterEstimation uses grp's NDV (~100) to
      // shrink the g7 slice to ~1% → under the bar → broadcast
      spark.sql("CALL jcat.system.compute_table_stats('join_big')")
      val after = spark.sql(
        """SELECT b.grp, count(*) FROM jcat.join_big b
           JOIN probe_side p ON b.k = p.pk
           WHERE b.grp = 'g7' GROUP BY b.grp""")
        .queryExecution.sparkPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"post-stats plan must broadcast the NDV-shrunk side:\n$after")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
