package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warmup
    docs.count()
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 32, 2)
    time("sigs compute+collect")(sigs.count())
    val sigsC = sigs.cache(); sigsC.count()
    // banded without cap
    val rowsPerBand = 2
    val banded = sigsC.select(col("doc_id"), col("minhash_sig"),
      posexplode(array((0 until 16).map(b =>
        xxhash64(concat_ws(",", (0 until 2).map(r => col("minhash_sig")(b*2+r)): _*))): _*))
        .as(Seq("band","band_hash")))
    val a = banded.select(col("doc_id").as("id_a"), col("minhash_sig").as("__sig_a"), col("band"), col("band_hash"))
    val b = banded.select(col("doc_id").as("id_b"), col("minhash_sig").as("__sig_b"), col("band"), col("band_hash"))
    val est = a.join(b, Seq("band","band_hash"))
      .filter(col("id_a") < col("id_b") &&
        Dedup.sigEstimate(col("__sig_a"), col("__sig_b"), 32) >= 0.25)
      .select("id_a","id_b").distinct()
    time("band-join + est + distinct (r1)")(println("estpairs=" + est.count()))
    time("band-join + est + distinct (r2)")(est.count())
    val sets = docs.select(col("doc_id"), array_distinct(graft.ops.TextAnalysis.shingles(col("text"), 2)).as("__set"))
    val verified = est
      .join(sets.select(col("doc_id").as("id_a"), col("__set").as("__set_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("__set").as("__set_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(Dedup.jaccard(col("__set_a"), col("__set_b")), 4).as("j"))
      .filter(col("j") >= 0.4)
    time("verify join")(println("pairs=" + verified.count()))
    time("full pipeline r1")(Dedup.minhashNearDups(docs, "text", "doc_id", 0.4, 32, 16, 2).count())
    time("full pipeline r2")(Dedup.minhashNearDups(docs, "text", "doc_id", 0.4, 32, 16, 2).count())
    spark.stop()
  }
}
