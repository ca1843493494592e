package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Iceberg reserved metadata columns (`_file`, `_pos`, `_partition`) on
 * both API surfaces: `GraftTable.metadataDF` / `metadataAsOf` and SQL
 * through the DSv2 catalog (`SupportsMetadataColumns` +
 * `GraftMetadataColumnRule`).
 */
class MetadataColumnsSpec extends SparkTestBase {

  private def makeTable(prefix: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(prefix), prefix,
      StructType(Seq(StructField("id", LongType), StructField("k", StringType),
        StructField("cat", StringType))),
      partitionCols = Seq("cat"))
    t.append(Seq.tabulate(6)(i => (i.toLong, s"v$i", if (i < 3) "a" else "b"))
      .toDF("id", "k", "cat").repartition(1))
    t.append(Seq.tabulate(4)(i => (10L + i, s"w$i", "a"))
      .toDF("id", "k", "cat").repartition(1))
    t
  }

  test("metadataDF: _file matches files.file_path; _pos is the on-file row index; _partition renders the dir tuple") {
    val t = makeTable("metacols")
    val md = t.metadataDF
    assert(md.columns.toSeq ===
      Seq("id", "k", "cat", "_file", "_pos", "_partition",
        "_row_id", "_last_updated_sequence_number"))
    assert(md.count() === 10)

    val filePaths = t.filesDF.select("file_path").collect().map(_.getString(0)).toSet
    val seen = md.select("_file").distinct().collect().map(_.getString(0)).toSet
    assert(seen === filePaths, "every _file is a live data file and vice versa")

    // _pos counts 0..n-1 within each file (parquet row index)
    val perFile = md.groupBy("_file")
      .agg(count(lit(1)).as("n"), min("_pos").as("lo"), max("_pos").as("hi"))
      .collect()
    perFile.foreach { r =>
      assert(r.getLong(2) === 0L, s"${r.getString(0)} min _pos")
      assert(r.getLong(3) === r.getLong(1) - 1, s"${r.getString(0)} max _pos")
    }

    // _partition agrees with the row's own partition column value
    assert(md.filter(col("_partition") =!= concat(lit("{cat="), col("cat"), lit("}")))
      .count() === 0)
  }

  test("metadataDF under merge-on-read deletes: dropped rows vanish, survivors keep ON-FILE positions") {
    import spark.implicits._
    val t = makeTable("metacols-mor")
    // delete the middle row of the first file by key — as a MoR equality
    // delete, so the data file is untouched and positions must show a gap
    t.deleteWhereMoR(col("id") === 1L, Seq("id"))
    val md = t.metadataDF
    assert(md.count() === 9)
    assert(md.filter(col("id") === 1L).count() === 0)
    val firstFilePos = md.filter(col("id").isin(0L, 2L))
      .select("_pos").as[Long].collect().toSet
    assert(firstFilePos === Set(0L, 2L), "survivors keep parquet row indexes (gap at 1)")
  }

  test("SQL: metadata columns resolve through the catalog; SELECT * stays metadata-free") {
    val wh = java.nio.file.Files.createTempDirectory("graft-metacols-wh").toString
    spark.conf.set("spark.sql.catalog.graft_mc",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mc.warehouse", wh)
    import spark.implicits._
    val t = GraftTable.create(spark, s"$wh/ns/mt", "ns.mt",
      StructType(Seq(StructField("id", LongType), StructField("cat", StringType))),
      partitionCols = Seq("cat"))
    t.append(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "cat").repartition(1))

    val rows = spark.sql(
      """SELECT id, _file, _pos, _partition FROM graft_mc.ns.mt
         ORDER BY id""").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    assert(rows.map(_.getString(3)).toSeq.sorted === Seq("{cat=a}", "{cat=a}", "{cat=b}"))
    // per-partition counts via the metadata column == plain group-by
    val byPart = spark.sql(
      """SELECT _partition, count(*) AS n FROM graft_mc.ns.mt
         GROUP BY _partition ORDER BY _partition""").collect()
    assert(byPart.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("{cat=a}", 2L), ("{cat=b}", 1L)))

    // SELECT * must NOT surface the metadata columns
    assert(spark.sql("SELECT * FROM graft_mc.ns.mt").columns.toSeq ===
      Seq("id", "cat"))

    // time travel keeps the surface: VERSION AS OF serves _file too
    assert(spark.sql(
      "SELECT _file FROM graft_mc.ns.mt VERSION AS OF '1'").collect().length === 3)
  }

  test("SQL: metadata read applies merge-on-read deletes (delete-correct substitution)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-metacols-wh2").toString
    spark.conf.set("spark.sql.catalog.graft_mc2",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mc2.warehouse", wh)
    import spark.implicits._
    val t = GraftTable.create(spark, s"$wh/ns/mt2", "ns.mt2",
      StructType(Seq(StructField("id", LongType), StructField("cat", StringType))),
      partitionCols = Seq("cat"))
    t.append(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "cat").repartition(1))
    t.deleteWhereMoR(col("id") === 2L, Seq("id"))
    val got = spark.sql(
      "SELECT id, _pos FROM graft_mc2.ns.mt2 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 0L), (3L, 0L)), "id=2 dropped; survivors keep file positions")
  }

  test("metadata column inside a subquery expression is served (rule descends into subqueries)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-metacols-wh4").toString
    spark.conf.set("spark.sql.catalog.graft_mc4",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mc4.warehouse", wh)
    import spark.implicits._
    val t = GraftTable.create(spark, s"$wh/ns/mt4", "ns.mt4",
      StructType(Seq(StructField("id", LongType), StructField("cat", StringType))),
      partitionCols = Seq("cat"))
    t.append(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "cat").repartition(1))
    // _pos referenced ONLY inside the IN-subquery: first row of each file
    val got = spark.sql(
      """SELECT id FROM graft_mc4.ns.mt4
         WHERE id IN (SELECT id FROM graft_mc4.ns.mt4 WHERE _pos = 0)
         ORDER BY id""").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 3L))
  }

  test("a DATA column named _file keeps plain-column semantics (no silent reroute)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-metacols-wh5").toString
    spark.conf.set("spark.sql.catalog.graft_mc5",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mc5.warehouse", wh)
    import spark.implicits._
    val t = GraftTable.create(spark, s"$wh/ns/mt5", "ns.mt5",
      StructType(Seq(StructField("id", LongType), StructField("_file", StringType))))
    t.append(Seq((1L, "user-value-a"), (2L, "user-value-b")).toDF("id", "_file"))
    val got = spark.sql("SELECT id, _file FROM graft_mc5.ns.mt5 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "user-value-a"), (2L, "user-value-b")))
  }

  test("merge-on-read deleted rows do not resurrect through a subquery (plan-read rule descends too)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-metacols-wh6").toString
    spark.conf.set("spark.sql.catalog.graft_mc6",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mc6.warehouse", wh)
    import spark.implicits._
    val t = GraftTable.create(spark, s"$wh/ns/mt6", "ns.mt6",
      StructType(Seq(StructField("id", LongType), StructField("cat", StringType))))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "cat"))
    t.deleteWhereMoR(col("id") === 2L, Seq("id"))
    import org.apache.spark.sql.Row
    val probe = Seq(1L, 2L, 3L).toDF("k")
    probe.createOrReplaceTempView("__mc6_probe")
    // the MoR table appears ONLY inside the subquery; a positionless
    // parquet scan there would surface the deleted id=2
    val got = spark.sql(
      """SELECT k FROM __mc6_probe
         WHERE k IN (SELECT id FROM graft_mc6.ns.mt6) ORDER BY k""")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 3L))
    spark.catalog.dropTempView("__mc6_probe")
  }

  test("empty table: metadata columns resolve to zero rows") {
    val wh = java.nio.file.Files.createTempDirectory("graft-metacols-wh3").toString
    spark.conf.set("spark.sql.catalog.graft_mc3",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mc3.warehouse", wh)
    GraftTable.create(spark, s"$wh/ns/mt3", "ns.mt3",
      StructType(Seq(StructField("id", LongType))))
    assert(spark.sql("SELECT id, _file, _pos FROM graft_mc3.ns.mt3")
      .collect().isEmpty)
  }
}
