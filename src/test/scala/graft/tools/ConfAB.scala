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
