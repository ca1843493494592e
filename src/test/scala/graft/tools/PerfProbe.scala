package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("docs=" + docs.count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sigs = time("minhash sigs (k=32, sh=2)")(
      Dedup.minhashSignatures(docs, "text", "doc_id", 32, 2).cache())
    println("sig rows=" + sigs.count())
    val cands = time("lsh candidates b=16")(
      Dedup.lshCandidatePairs(sigs, "doc_id", 16, 32).count())
    println("candidates=" + cands)
    val cands8 = time("lsh candidates b=8 r=4")(
      Dedup.lshCandidatePairs(sigs, "doc_id", 8, 32).count())
    println("candidates b=8=" + cands8)
    time("full minhashNearDups current params")(
      println("pairs=" + Dedup.minhashNearDups(docs, "text", "doc_id", 0.4, 32, 16, 2).count()))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    println("emb=" + e.count())
    time("ann lsh topk")(
      println("annrows=" + Similarity.lshTopK(e.filter(col("vec_id") < 10), e, 5, 64).count()))
    time("ann brute topk all queries=10")(
      println("rows=" + Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, 5).count()))
    spark.stop()
  }
}
