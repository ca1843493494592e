package graft.tools

import org.apache.spark.sql.SparkSession

import graft.table.{GraftTable, RestCommitGuard}

/** Child JVM for RestCommitGuardSpec: like [[ConcurrentAppender]], but
  * every commit claims its version slot through the REST catalog service
  * at `args(3)` — a TRUE multi-process catalog-service CAS race. */
object RestCommitAppender {
  def main(args: Array[String]): Unit = {
    val Array(loc, writer, appends, catalogUrl) = args
    RestCommitGuard.installGlobally(catalogUrl)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"rest-appender-$writer")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val t = new GraftTable(spark, loc)
      (0 until appends.toInt).foreach { i =>
        t.append(Seq.tabulate(10)(j => (writer.toInt, i * 10L + j))
          .toDF("writer", "v"))
      }
      println(s"rest-appender-$writer-done")
    } finally spark.stop()
  }
}
