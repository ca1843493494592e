package graft.tools

import org.apache.spark.sql.SparkSession

import graft.table.GraftTable

/** Child JVM for CrossProcessCommitSpec: opens the table at `args(0)` and
  * performs `args(2)` appends of 10 rows each, tagged with writer id
  * `args(1)`. Runs in its OWN process, so GraftTable's per-table in-JVM
  * commit lock cannot serialize it against the parent — every commit races
  * other processes through the filesystem CAS and must retry on conflict.
  */
object ConcurrentAppender {
  def main(args: Array[String]): Unit = {
    val Array(loc, writer, appends) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"concurrent-appender-$writer")
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
      println(s"appender-$writer-done")
    } finally spark.stop()
  }
}
