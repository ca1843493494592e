package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Scratch perf probe: is the per-lambda-element re-evaluation of split()
  * inside shingles() the x_top_ngrams bottleneck? */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
      }.minBy(_._1)
      println(f"$label%-28s ${best._1}%8.1f ms  (n=${best._2})")
    }
    time("explode(shingles(text,2))") {
      docs.select(explode(TextAnalysis.shingles(col("text"), 2))).count()
    }
    time("project toks, then shingle") {
      docs.select(TextAnalysis.tokens(col("text")).as("__toks"))
        .select(explode(TextAnalysis.shinglesOfTokens(col("__toks"), 2))).count()
    }
    time("tokens only") {
      docs.select(explode(TextAnalysis.tokens(col("text")))).count()
    }
    spark.stop()
  }
}
