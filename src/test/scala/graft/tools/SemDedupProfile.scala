package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Scratch profiler for s_semdedup's stages (round 10). Not a test. */
object SemDedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"n=${e.count()} dim=${e.select(size(col("embedding"))).first().getInt(0)}")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }
    }
    val cents = e.filter(col("vec_id") < 8)
    time("assign") {
      Similarity.assignToCentroids(e, cents).count()
    }
    val assigned = Similarity.assignToCentroids(e, cents)
    time("pairs") {
      Similarity.semDedupPairs(assigned, 0.35).count()
    }
    val pairs = Similarity.semDedupPairs(assigned, 0.35)
    time("cc") {
      Dedup.connectedComponents(pairs, "id_a", "id_b").count()
    }
    time("full") {
      Similarity.semDedup(e, cents, 0.35).count()
    }
    spark.stop()
  }
}
