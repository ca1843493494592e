package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: stage-by-stage timing of e_triangles — edge builder vs
  * triangle counting — to locate the dominant cost at sf0.1. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      println(s"--- round $i")
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
      val edges = timed("edges-build+count") {
        val e = graft.ops.Graph.coOccurrenceEdges(ev, "user_id",
          Seq("event_type", "hr"), minCells = 3, maxCellSize = 1000)
        println(s"  edges=${e.count()}")
        e
      }
      timed("triangles") {
        println("  tri-rows=" + graft.ops.Graph.triangleCount(edges, "u", "v",
          assumeCanonical = true, broadcastDegrees = true).count())
      }
      // decomposition inside the edge builder
      timed("  distinct-occ") {
        println("  occ=" + ev.select(col("user_id"), col("event_type"), col("hr"))
          .distinct().count())
      }
      val d = ev.select(col("user_id").as("__u"), col("event_type"), col("hr"))
        .distinct().localCheckpoint()
      val sizes = d.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c").between(2L, 1000L)).drop("__c")
      val grouped = d.join(sizes, Seq("event_type", "hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(array_sort(collect_list(col("__u"))).as("__us"))
        .localCheckpoint()
      timed("  pair-emit (HOF)") {
        println("  pairs=" + grouped.select(explode(expr(
          "flatten(transform(__us, (x, i) -> " +
            "transform(slice(__us, i + 2, size(__us) - i - 1), " +
            "y -> struct(x AS u, y AS v))))")).as("__p"))
          .groupBy(col("__p.u").as("u"), col("__p.v").as("v"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") >= 3).count())
      }
      timed("  pair-emit (native)") {
        println("  pairs=" + grouped.select(explode(
            graft.functions.GraftFunctions.sorted_pairs(col("__us"))).as("__p"))
          .groupBy(col("__p.u").as("u"), col("__p.v").as("v"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") >= 3).count())
      }
    }
    spark.stop()
  }
}
