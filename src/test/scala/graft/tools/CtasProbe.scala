package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: does V2 CTAS (+ REPLACE) work through GraftSparkCatalog? */
object CtasProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("ctas-wh").toString
    spark.conf.set("spark.sql.catalog.cp",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.cp.warehouse", wh)
    spark.sql("CREATE TABLE cp.fin.src (k STRING, v DOUBLE) USING parquet")
    spark.sql("INSERT INTO cp.fin.src VALUES ('a', 1.0), ('b', 2.0)")
    try {
      spark.sql("CREATE TABLE cp.fin.dst AS SELECT * FROM cp.fin.src")
      println("CTAS count=" + spark.sql("SELECT count(*) FROM cp.fin.dst").collect().head.getLong(0))
    } catch { case e: Throwable => println(s"CTAS failed: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    try {
      spark.sql("CREATE TABLE cp.fin.clone AS SELECT * FROM cp.fin.src LIMIT 0")
      println("CTAS-limit0 count=" + spark.sql("SELECT count(*) FROM cp.fin.clone").collect().head.getLong(0))
    } catch { case e: Throwable => println(s"CTAS limit0 failed: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    try {
      spark.sql("CREATE OR REPLACE TABLE cp.fin.dst AS SELECT k FROM cp.fin.src WHERE k = 'a'")
      println("CORTAS count=" + spark.sql("SELECT count(*) FROM cp.fin.dst").collect().head.getLong(0))
    } catch { case e: Throwable => println(s"CORTAS failed: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    spark.stop()
  }
}
