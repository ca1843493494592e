package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** A/B probe for the round-17 scan-fan-out hypothesis: sf testdata ships
  * single-row-group parquet files, so every scan is ONE task and per-row
  * heavy work (tokenize/shingle/vector math) runs serially until the first
  * exchange. Measures each heavy operator as-is vs with the input
  * repartitioned to cluster parallelism first. */
object FanOutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val docsFan = docs.repartition(32, col("doc_id"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val embFan = emb.repartition(32, col("vec_id"))
    docs.count(); emb.count() // warm

    def best[T](label: String, n: Int = 3)(f: => Long): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"$label%-40s min=${ts.map(_._1).min}%.3f s rows=${ts.head._2}")
    }

    best("tfidf base")(Dedup.tfidfCosinePairs(docs, "text", "doc_id", 0.2, 3, 20L).count())
    best("tfidf fanout")(Dedup.tfidfCosinePairs(docsFan, "text", "doc_id", 0.2, 3, 20L).count())
    best("jaccard base")(Dedup.jaccardPrefixJoin(docs, "text", "doc_id", 0.8, 3).count())
    best("jaccard fanout")(Dedup.jaccardPrefixJoin(docsFan, "text", "doc_id", 0.8, 3).count())
    best("minhash base")(Dedup.minhashNearDups(docs, "text", "doc_id", 0.4, 32, 16, 2).count())
    best("minhash fanout")(Dedup.minhashNearDups(docsFan, "text", "doc_id", 0.4, 32, 16, 2).count())
    best("simhash base")(Dedup.simhashNearDups(docs, "text", "doc_id", 3, tokenHash = Dedup.reproducibleTokenHash).count())
    best("simhash fanout")(Dedup.simhashNearDups(docsFan, "text", "doc_id", 3, tokenHash = Dedup.reproducibleTokenHash).count())
    best("brute topk base")(Similarity.bruteForceTopK(emb.filter(col("vec_id") % 101 === 0), emb, 10).count())
    best("brute topk fanout")(Similarity.bruteForceTopK(embFan.filter(col("vec_id") % 101 === 0), embFan, 10).count())
    spark.stop()
  }
}
