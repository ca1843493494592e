package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage profiler for SparkEntry queries (optimization-round tooling).
  *
  * Usage: Test/runMain graft.tools.ProfileQ <query1,query2,...> [runs]
  *   - Builds the same session shape as graft.Bench (local[N], N shuffle
  *     partitions, AQE on).
  *   - Times each query `runs` times (min reported), and on the LAST run
  *     records every completed stage's wall duration, task count, input
  *     bytes, shuffle read/write bytes, executor run/CPU time — the
  *     guide-§1 "where does the time actually go" attribution local mode
  *     can't get from a disabled UI.
  *   - SPARK_GRAFT_PLAN_DIR=/path writes <query>.txt explain("formatted")
  *     dumps for each profiled query.
  */
object ProfileQ {
  private case class StageRow(id: Int, attempt: Int, name: String,
      tasks: Int, durMs: Long, runMs: Long, cpuMs: Long,
      inBytes: Long, shReadB: Long, shWriteB: Long, spillB: Long)

  def main(args: Array[String]): Unit = {
    val qs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // mirror the bench session's two env-parameterised configs (r18:
      // profiling in a different AQE regime than the driver's bench made
      // the r17 fanOut A/Bs unrepresentative at 32 cores)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"))
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "1024"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer.empty[StageRow]
    var capture = false
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val dur = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(-1L)
          stages.synchronized {
            stages += StageRow(si.stageId, si.attemptNumber(),
              si.name.split("\n")(0).take(90), si.numTasks, dur,
              m.executorRunTime, m.executorCpuTime / 1000000,
              m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten, m.diskBytesSpilled)
          }
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup like Bench
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      Seq("orders", "customer", "nation", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$dir/$t.parquet").count())
    } catch { case e: Throwable => System.err.println(s"warmup: $e") }
    // t_/st_ queries need the bench fixture tables; opt-in (slow)
    if (sys.env.contains("SPARK_GRAFT_PROFILE_FIXTURES")) {
      val fx = graft.queries.TableFixtures
      try {
        fx.ordersVersioned(spark, dir); fx.lineitemMerged(spark, dir)
        fx.wapAccepted(spark, dir); fx.wapRejected(spark, dir)
        fx.ordersMaintained(spark, dir); fx.ordersZOrdered(spark, dir)
        fx.ordersDeleted(spark, dir); fx.ordersUpdated(spark, dir)
        fx.ordersMorDeleted(spark, dir); fx.ordersPosDeleted(spark, dir)
        fx.ordersRolledBack(spark, dir); fx.ordersChangelog(spark, dir)
        fx.ordersChangelogMor(spark, dir); fx.ordersEvolved(spark, dir)
        fx.ordersRenamed(spark, dir); fx.ordersMergeDeleted(spark, dir)
        fx.ordersHashFiles(spark, dir); fx.ordersMetaCols(spark, dir)
        fx.activityCsvIngested(spark); fx.bucketedTables(spark, dir)
        fx.ordersCloned(spark, dir); fx.ordersPosRewritten(spark, dir)
        fx.ordersStats(spark, dir); fx.ordersView(spark, dir)
        fx.pqServing(spark, dir); fx.ivfRefreshed(spark, dir)
        fx.ordersMergeConditional(spark, dir)
        fx.ordersMergeConditionalMor(spark, dir)
        fx.ordersMergeNmbs(spark, dir); fx.ordersWapId(spark, dir)
        fx.ordersRefRetention(spark, dir); fx.ordersWriteOrdered(spark, dir)
        fx.ordersCorrelatedDeleted(spark, dir)
        fx.ordersCorrelatedUpdated(spark, dir)
        fx.ordersCorrelatedSetUpdated(spark, dir)
        fx.ordersCorrelatedMerged(spark, dir)
        fx.ordersSchemaEvolvedMerged(spark, dir)
        fx.ordersDefaulted(spark, dir)
      } catch { case e: Throwable => System.err.println(s"fixtures: $e") }
    }

    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val times = (1 to runs).map { i =>
        val last = i == runs
        if (last) { stages.synchronized(stages.clear()); capture = true }
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (last) {
          // listener events are async; let the bus drain
          Thread.sleep(300)
          capture = false
        }
        println(f"[$q] run$i: $dt%.3f s rows=$n")
        dt
      }
      println(f"[$q] min=${times.min}%.3f s")
      val snap = stages.synchronized(stages.toVector).sortBy(-_.durMs)
      val totDur = snap.map(_.durMs).sum
      println(f"[$q] stages=${snap.size} sumStageWallMs=$totDur")
      snap.take(25).foreach { s =>
        println(f"  stage ${s.id}%4d dur=${s.durMs}%6d ms tasks=${s.tasks}%3d " +
          f"run=${s.runMs}%6d cpu=${s.cpuMs}%6d in=${s.inBytes / 1024}%8d KiB " +
          f"shR=${s.shReadB / 1024}%7d KiB shW=${s.shWriteB / 1024}%7d KiB " +
          f"spill=${s.spillB / 1024}%6d KiB  ${s.name}")
      }
      planDir.foreach { pd =>
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(pd, s"$q.txt"),
          plan.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
