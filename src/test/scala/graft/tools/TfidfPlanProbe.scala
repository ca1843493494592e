package graft.tools

import org.apache.spark.sql.SparkSession

object TfidfPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries("d_tfidf_cosine")(spark, "/root/testdata/sf0.01")
    val t0 = System.nanoTime(); q.collect(); val t1 = System.nanoTime()
    val plan = q.queryExecution.executedPlan.toString // final AQE plan
    println("ReusedExchange count: " + plan.linesIterator.count(_.contains("ReusedExchange")))
    println("Exchange count: " + plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused")))
    println("Generate (explode) count: " + plan.linesIterator.count(_.contains("Generate")))
    println(f"exec ${((t1-t0)/1e9)}%.2f s")
    val t2 = System.nanoTime(); q.collect(); val t3 = System.nanoTime()
    println(f"exec2 ${((t3-t2)/1e9)}%.2f s")
    spark.stop()
  }
}
