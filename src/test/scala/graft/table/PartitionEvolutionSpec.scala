package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Partition-spec evolution: future writes take the new layout, existing
  * files keep theirs, reads/pruning span both, compaction migrates. */
class PartitionEvolutionSpec extends SparkTestBase {

  private def mk(name: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(s"pevo-$name"), name,
      StructType(Seq(
        StructField("k", LongType), StructField("grp", StringType),
        StructField("d", DateType), StructField("v", DoubleType))),
      partitionCols = Seq("d"))
    for (day <- 1 to 2) {
      val df = (0 until 50).map(i => (day * 100L + i, s"g${i % 2}",
        java.sql.Date.valueOf(f"2024-01-0$day"), i * 1.0))
        .toDF("k", "grp", "d", "v")
      t.append(df.coalesce(1))
    }
    t
  }

  test("reads span files written under old and new specs") {
    val t = mk("read")
    t.updatePartitionSpec(Seq("grp"))
    import spark.implicits._
    t.append((0 until 50).map(i => (300L + i, s"g${i % 2}",
      java.sql.Date.valueOf("2024-01-03"), i * 1.0))
      .toDF("k", "grp", "d", "v").coalesce(1))
    assert(t.toDF.count() === 150)
    // values that only exist in the file layout (not the data pages) are
    // still correct on both sides of the evolution
    assert(t.toDF.filter(col("d") === lit("2024-01-01").cast("date")).count() === 50)
    assert(t.toDF.filter(col("grp") === "g1").count() === 75)
    // layouts on disk really differ
    val layouts = t.meta.currentSnapshot.get.files
      .map(_.path.split("/").dropRight(1).mkString("/").replaceAll("=[^/]*", "")).toSet
    assert(layouts === Set("d", "grp"))
  }

  test("scanWhere prunes per file: partition value on one spec, stats on the other") {
    val t = mk("prune")
    t.updatePartitionSpec(Seq("grp"))
    import spark.implicits._
    t.append((0 until 50).map(i => (300L + i, s"g${i % 2}",
      java.sql.Date.valueOf("2024-01-03"), i * 1.0))
      .toDF("k", "grp", "d", "v").coalesce(1))
    // d: partition value for the 2 old files, footer stats for the 2 new
    val byDate = t.scanWhere(col("d") === lit("2024-01-01").cast("date"))
    assert(byDate.inputFiles.length === 1)
    assert(byDate.count() === 50)
    // grp: stats for old files (g0..g1 ranges overlap -> both kept), but
    // partition values prune the new files exactly
    val byGrp = t.scanWhere(col("grp") === "g0")
    assert(byGrp.count() === 75)
    assert(byGrp.inputFiles.length === 3) // 2 old (stats can't split) + 1 new
  }

  test("compaction migrates everything into the current spec") {
    val t = mk("compact")
    t.updatePartitionSpec(Seq("grp"))
    t.rewriteDataFilesSorted(Seq(asc_nulls_last("k")))
    val files = t.meta.currentSnapshot.get.files
    assert(files.nonEmpty)
    assert(files.forall(_.path.startsWith("grp=")))
    assert(t.toDF.count() === 100)
    // post-migration pruning on the new partition column is exact
    assert(t.scanWhere(col("grp") === "g0").inputFiles.length === 1)
  }

  test("evolving to unpartitioned and back; validation rejects unknown columns") {
    val t = mk("unpart")
    t.updatePartitionSpec(Seq.empty)
    import spark.implicits._
    t.append(Seq((999L, "gX", java.sql.Date.valueOf("2024-01-09"), 1.0))
      .toDF("k", "grp", "d", "v"))
    assert(t.toDF.count() === 101)
    assert(t.toDF.filter(col("k") === 999L).count() === 1)
    val e = intercept[IllegalArgumentException] {
      t.updatePartitionSpec(Seq("nope"))
    }
    assert(e.getMessage.contains("not in schema"))
  }

  test("merge-on-read deletes apply across mixed layouts") {
    val t = mk("mor")
    t.updatePartitionSpec(Seq("grp"))
    import spark.implicits._
    t.append(Seq((900L, "g0", java.sql.Date.valueOf("2024-01-05"), 5.0))
      .toDF("k", "grp", "d", "v"))
    // deletes one row from an old-layout file and one from the new one
    t.deleteWhereMoR(col("k").isin(101L, 900L), Seq("k"))
    assert(t.toDF.count() === 99)
    assert(t.toDF.filter(col("k").isin(101L, 900L)).count() === 0)
  }

  test("CALL set_partition_spec evolves through SQL") {
    val wh = java.nio.file.Files.createTempDirectory("pevo-wh").toString
    spark.conf.set("spark.sql.catalog.pevo",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.pevo.warehouse", wh)
    spark.sql("""CREATE TABLE pevo.fin.t (k BIGINT, grp STRING, v DOUBLE)
                 USING parquet PARTITIONED BY (grp)""")
    try {
      spark.sql("INSERT INTO pevo.fin.t (k, grp, v) VALUES (1, 'a', 1.0)")
      val r = spark.sql(
        "CALL pevo.system.set_partition_spec('fin.t', partition_by => '')")
        .collect().head
      assert(r.getString(0) === "grp" && r.getString(1) === "")
      spark.sql("INSERT INTO pevo.fin.t (k, grp, v) VALUES (2, 'b', 2.0)")
      assert(spark.sql("SELECT count(*) FROM pevo.fin.t").collect().head.getLong(0) === 2)
      val t = GraftTable.load(spark, s"$wh/fin/t")
      assert(t.meta.partitionCols.isEmpty)
      val layouts = t.meta.currentSnapshot.get.files.map(_.partitionValues.keySet).toSet
      assert(layouts === Set(Set("grp"), Set.empty[String]))
    } finally spark.sql("DROP TABLE pevo.fin.t")
  }
}
