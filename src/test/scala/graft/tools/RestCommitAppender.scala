package graft.tools

import org.apache.spark.sql.SparkSession

import graft.table.{GraftTable, RestCommitGuard}

/** Child JVM for RestCommitGuardSpec: like [[ConcurrentAppender]], but
  * every commit claims its version slot through the REST catalog service
  * at `args(3)` — a TRUE multi-process catalog-service CAS race.
  *
  * Optional `args(4)` = crash probability: each claim-WINNING commit then
  * halts the whole JVM with that probability BEFORE installing (the
  * [[graft.table.CommitGuard.maybeCrashAfterClaim]] injection window) —
  * the crash-fuzz campaign of CommitGuardCrashFuzzSpec. A crashing child
  * leaves a claimed-but-uninstalled version for the survivors to heal;
  * per-append failures that are NOT the halt (e.g. exhausted retries
  * under heavy contention) are survivable and the child moves on. */
object RestCommitAppender {
  def main(args: Array[String]): Unit = {
    val loc = args(0); val writer = args(1); val appends = args(2)
    val catalogUrl = args(3)
    if (args.length > 4 && args(4).toDouble > 0) {
      sys.props("graft.test.crashAfterClaim") = args(4)
      sys.props("graft.test.crashAfterClaim.mode") = "halt"
    }
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
        try {
          t.append(Seq.tabulate(10)(j => (writer.toInt, i * 10L + j))
            .toDF("writer", "v"))
          println(s"rest-appender-$writer-committed-$i")
        } catch {
          case e: Throwable =>
            System.err.println(s"rest-appender-$writer append $i failed: $e")
        }
      }
      println(s"rest-appender-$writer-done")
    } finally spark.stop()
  }
}
