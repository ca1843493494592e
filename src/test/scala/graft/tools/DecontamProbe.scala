package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Decontaminate

/** Scratch perf probe for the decontamination plan at sf0.1. */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val probes = docs.filter(col("doc_id") % 10 === 7)
    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
      }.minBy(_._1)
      println(f"$label%-28s ${best._1}%8.1f ms  (n=${best._2})")
    }
    val full = Decontaminate.ngramOverlap(corpus, probes, "text", "doc_id",
      n = 5, keepCols = Seq("lang"))
    time("full ngramOverlap")(full.count())
    full.explain("formatted")
    spark.stop()
  }
}
