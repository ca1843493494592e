package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: per-query operator counts (Generate / Exchange / Window)
  * in the INITIAL executed plan — flags repeated-subtree work (multiple
  * Generates usually mean a corpus explode planned more than once). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val g = plan.linesIterator.count(_.contains("Generate"))
        val e = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
        val w = plan.linesIterator.count(_.contains("Window"))
        if (g >= 2 || e >= 10) Some((name, g, e, w)) else None
      } catch { case ex: Throwable => println(s"SKIP $name: ${ex.getMessage.take(80)}"); None }
    }
    rows.sortBy(-_._2).foreach { case (n, g, e, w) =>
      println(f"$n%-24s generates=$g exchanges=$e windows=$w")
    }
    spark.stop()
  }
}
