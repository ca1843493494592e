package graft.tools

import org.apache.spark.sql.SparkSession

import graft.table.GraftTable

/** Scratch probe: SQL reads over mixed partition layouts. */
object PevoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("pevo-wh").toString
    spark.conf.set("spark.sql.catalog.pv",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.pv.warehouse", wh)
    spark.sql("""CREATE TABLE pv.fin.t (k BIGINT, grp STRING, v DOUBLE)
                 USING parquet PARTITIONED BY (grp)""")
    spark.sql("INSERT INTO pv.fin.t (k, grp, v) VALUES (1, 'a', 1.0)")
    val t = GraftTable.load(spark, s"$wh/fin/t")
    t.updatePartitionSpec(Seq.empty)
    spark.sql("INSERT INTO pv.fin.t (k, grp, v) VALUES (2, 'b', 2.0)")
    println("files=" + t.meta.currentSnapshot.get.files.map(_.path).mkString(", "))
    println("api-count=" + t.toDF.count())
    println("api-rows=" + t.toDF.collect().map(_.toString).mkString(" "))
    val sqlDf = spark.sql("SELECT * FROM pv.fin.t")
    println("sql-count=" + sqlDf.count())
    println("sql-rows=" + sqlDf.collect().map(_.toString).mkString(" "))
    println("sql-files=" + sqlDf.inputFiles.mkString(", "))
    spark.stop()
  }
}
