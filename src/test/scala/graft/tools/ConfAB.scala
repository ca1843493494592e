package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B of a runtime SQL conf over SparkEntry queries:
  * for each query, alternate conf value A and B run-by-run (3 each, min
  * reported per arm) so ambient contention hits both arms equally — the
  * AB_r16.json methodology, in-process.
  *
  * Usage: Test/runMain graft.tools.ConfAB <confKey> <valA> <valB> <q1,q2,...>
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val Array(key, va, vb, qcsv) = args.take(4)
    val runs = if (args.length > 4) args(4).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // mirror the bench session's two env-parameterised configs (r18:
      // A/Bs must run in the driver's AQE regime — see ProfileQ)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"))
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "1024"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    var totA = 0.0
    var totB = 0.0
    qcsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      def run(v: String): Double = {
        spark.conf.set(key, v)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // one untimed warm run per query, then interleave
      run(va)
      val (as, bs) = (1 to runs).map(_ => (run(va), run(vb))).unzip
      totA += as.min; totB += bs.min
      println(f"$q%-26s A=${as.min}%6.3f B=${bs.min}%6.3f (B-A=${bs.min - as.min}%+6.3f)")
    }
    println(f"TOTAL A=$totA%7.3f B=$totB%7.3f (B-A=${totB - totA}%+7.3f)  [$key A=$va B=$vb]")
    spark.stop()
  }
}
