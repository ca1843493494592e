package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Cross-feature interop for the round-14 surfaces: views over
  * deletion-vector tables (the expansion must ride the MoR read plan),
  * nested views, stats over DV tables, and stats + DV + time travel. */
class Round14InteropSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private lazy val wh = {
    val d = tmpDir("r14-wh")
    spark.conf.set("spark.sql.catalog.r14", "graft.table.catalog.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.r14.warehouse", d)
    d
  }

  private def mkDvTable(name: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, s"$wh/ns/$name", s"r14.ns.$name", schema,
      props = Map("write.delete.vector.enabled" -> "true"))
    t.append((0 until 100).map(i => (i.toLong, s"g${i % 5}", i * 0.5))
      .toDF("id", "grp", "v"))
    t
  }

  test("a view over a DV table reads through the membership-filter plan") {
    val t = mkDvTable("dvbase")
    t.deleteWherePositional(col("id") < 20)
    spark.sql("CREATE VIEW r14.ns.dv_view AS " +
      "SELECT grp, count(*) AS n FROM r14.ns.dvbase GROUP BY grp")
    val got = spark.sql("SELECT sum(n) FROM r14.ns.dv_view").head.getLong(0)
    assert(got === 80L, "the view must see the DV-deleted state")
    // a later DV delete is visible through the same stored SQL
    t.deleteWherePositional(col("id") >= 90)
    assert(spark.sql("SELECT sum(n) FROM r14.ns.dv_view").head.getLong(0) === 70L)
  }

  test("nested views expand recursively") {
    mkDvTable("nest_base")
    spark.sql("CREATE VIEW r14.ns.nest_v1 AS " +
      "SELECT id, grp FROM r14.ns.nest_base WHERE id % 2 = 0")
    spark.sql("CREATE VIEW r14.ns.nest_v2 AS " +
      "SELECT grp, count(*) AS n FROM r14.ns.nest_v1 GROUP BY grp")
    val rows = spark.sql("SELECT * FROM r14.ns.nest_v2 ORDER BY grp").collect()
    assert(rows.length === 5 && rows.map(_.getLong(1)).sum === 50L)
  }

  test("compute_table_stats over a DV table counts live rows only") {
    val t = mkDvTable("dvstats")
    t.deleteWherePositional(col("id") % 4 === 0)
    val rec = t.computeTableStats()
    assert(rec.rowCount === 75L, s"rowCount must exclude DV-deleted rows, got ${rec.rowCount}")
    assert(rec.cols("grp").ndv === 5L)
    // the stats-bearing scan agrees with the DV-filtered state... but a
    // DV snapshot reads through the graft plan (planRead), which has its
    // own path — the pinned stats must not leak onto it incorrectly:
    // just assert the table still reads right
    assert(t.toDF.count() === 75L)
  }

  test("time travel on a DV table: pre-delete snapshot reads whole, stats stay pinned to head") {
    val t = mkDvTable("dvtt")
    val pre = t.meta.currentSnapshotId.get
    t.deleteWherePositional(col("id") < 50)
    t.computeTableStats()
    assert(t.asOfSnapshot(pre).count() === 100L)
    assert(t.toDF.count() === 50L)
    val rec = t.meta.columnStats.get
    assert(rec.snapshotId === t.meta.currentSnapshotId.get)
    assert(rec.rowCount === 50L)
  }
}
