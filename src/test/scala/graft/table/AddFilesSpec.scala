package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** `add_files` — zero-copy onboarding of existing parquet into a graft
  * table: hard-linked references, footer stats, strict compatibility
  * checks (referenced files are never cast or rewritten). */
class AddFilesSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType),
    StructField("v", DoubleType)))

  test("unpartitioned import: contents, stats pruning, and true hard links") {
    import spark.implicits._
    val src = tmpDir("af-src")
    (1L to 100L).map(i => (s"k${i % 7}", i, i * 1.5)).toDF("k", "n", "v")
      .repartition(3).write.mode("overwrite").parquet(src)
    val t = GraftTable.create(spark, tmpDir("af-t"), "af", schema)
    val snap = t.addFiles(src)
    assert(snap.operation === "append")
    assert(t.toDF.count() === 100)
    assert(t.toDF.agg(sum("n")).head.getLong(0) === 5050L)
    // footer stats captured: a selective filter prunes imported files
    assert(t.scanWhere(col("n") === 1L).inputFiles.length
      < t.toDF.inputFiles.length)
    // zero-copy: table file and source file share an inode
    val tableFile = new java.io.File(t.location + "/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val srcFiles = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toPath)
    def ino(p: java.nio.file.Path) =
      java.nio.file.Files.readAttributes(p,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    assert(srcFiles.map(ino).contains(ino(tableFile)))
    // deleting the table's link never destroys the source bytes
    t.append(Seq(("x", 1000L, 1.0)).toDF("k", "n", "v"))
    t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    t.removeOrphanFiles(dryRun = false)
    assert(spark.read.parquet(src).count() === 100)
  }

  test("identity-partitioned import from a hive layout") {
    import spark.implicits._
    val src = tmpDir("af-hsrc")
    (1L to 60L).map(i => (s"p${i % 3}", i, i * 0.5)).toDF("k", "n", "v")
      .write.partitionBy("k").mode("overwrite").parquet(src)
    val t = GraftTable.create(spark, tmpDir("af-ht"), "afh", schema,
      partitionCols = Seq("k"))
    t.addFiles(src)
    assert(t.toDF.count() === 60)
    assert(t.toDF.filter(col("k") === "p1").count() === 20)
    // partition pruning works on the imported layout
    val plan = t.toDF.filter(col("k") === "p1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("compatibility rejections") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("af-rej"), "afr", schema)
    // missing column
    val miss = tmpDir("af-miss")
    Seq(("a", 1L)).toDF("k", "n").write.mode("overwrite").parquet(miss)
    assert(intercept[Exception](t.addFiles(miss))
      .getMessage.contains("lacks column"))
    // type mismatch is rejected, never cast
    val wrong = tmpDir("af-wrong")
    Seq(("a", 1, 1.0)).toDF("k", "n", "v").write.mode("overwrite").parquet(wrong)
    assert(intercept[Exception](t.addFiles(wrong))
      .getMessage.contains("cannot be cast"))
    // partitioned table demands hive dirs in the source
    val tp = GraftTable.create(spark, tmpDir("af-rejp"), "afrp", schema,
      partitionCols = Seq("k"))
    val flat = tmpDir("af-flat")
    Seq(("a", 1L, 1.0)).toDF("k", "n", "v").write.mode("overwrite").parquet(flat)
    assert(intercept[Exception](tp.addFiles(flat))
      .getMessage.contains("carries partition dirs"))
    // transform specs cannot be imported
    val tt = GraftTable.create(spark, tmpDir("af-rejt"), "afrt", schema,
      partitionCols = Seq("bucket(4,n)"))
    assert(intercept[Exception](tt.addFiles(flat))
      .getMessage.contains("identity partition specs only"))
  }

  test("CALL system.add_files routes through the catalog") {
    import spark.implicits._
    val wh = tmpDir("af-cat")
    spark.conf.set("spark.sql.catalog.afcat",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.afcat.warehouse", wh)
    spark.sql("CREATE TABLE afcat.ns.t (k STRING, n BIGINT, v DOUBLE) USING parquet")
    try {
      val src = tmpDir("af-csrc")
      (1L to 10L).map(i => (s"k$i", i, i * 2.0)).toDF("k", "n", "v")
        .coalesce(2).write.mode("overwrite").parquet(src)
      val r = spark.sql(
        s"CALL afcat.system.add_files(table => 'ns.t', source_dir => '$src')")
        .collect().head
      assert(r.getInt(0) >= 1 && r.getLong(1) === 10L)
      assert(spark.sql("SELECT sum(n) FROM afcat.ns.t").head.getLong(0) === 55L)
    } finally spark.sql("DROP TABLE afcat.ns.t")
  }
}
