package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: prints the nProbe=4 IVF recall@5 against exhaustive
  * truth at each test scale factor — the margin behind s_ann_ivf_probe's
  * in-query `recall_ok >= 0.5` bound. Run when regenerating testdata to
  * confirm the bound still clears with headroom. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 10)
      val ivf = graft.ops.Similarity.ivfSearch(q,
          graft.queries.TableFixtures.ivfIndex(spark, dir), k = 5, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"))
      val exact = graft.ops.Similarity.bruteForceTopK(q, e, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
      val tot = exact.count()
      println(f"RECALL $sf = ${hit.toDouble / tot}%.3f ($hit/$tot)")
    }
    spark.stop()
  }
}
