package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BloomSpec extends SparkTestBase {

  private def docs(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    // texts repeat with period 150, so (i, i+150) are in-batch duplicates;
    // the corpus (multiples of 3) covers only a third of the residues
    ids.map(i => (i, s"document body number ${i % 150}")).toDF("doc_id", "text")
  }

  test("antiJoinKeys equals the plain left anti join") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 500).map(i => (i.toLong, rnd.between(0L, 300L))).toDF("id", "k")
    val right = (1 to 200).map(_ => rnd.between(0L, 300L)).map(Tuple1(_)).toDF("rk")
    val got = Bloom.antiJoinKeys(left, right, "k", "rk", expectedItems = 200)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = left.join(right, col("k") === col("rk"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("empty build side keeps every probe row") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 20L)).toDF("id", "k")
    val right = Seq.empty[Tuple1[Long]].toDF("rk")
    assert(Bloom.antiJoinKeys(left, right, "k", "rk", 10).count() === 2)
  }

  test("mightContain is complete: no false negatives over inserted keys") {
    import spark.implicits._
    val keys = (1L to 1000L).map(Tuple1(_)).toDF("k")
    val filter = Bloom.buildKeyFilter(keys, col("k"), expectedItems = 1000)
    val misses = keys.filter(!Bloom.mightContain(filter, col("k"))).count()
    assert(misses === 0L)
  }

  test("filter is selective: most absent keys are rejected") {
    import spark.implicits._
    val keys = (1L to 1000L).map(Tuple1(_)).toDF("k")
    val filter = Bloom.buildKeyFilter(keys, col("k"), expectedItems = 1000, fpp = 0.01)
    val absent = (100001L to 101000L).map(Tuple1(_)).toDF("k")
    val falsePositives = absent.filter(Bloom.mightContain(filter, col("k"))).count()
    assert(falsePositives < 100, s"fpp blew past 10x the target: $falsePositives/1000")
  }

  test("incrementalDedupBloom output equals incrementalDedup exactly") {
    val incoming = docs(1L to 300L)
    val existing = docs((1L to 300L).filter(_ % 3 == 0))
    val bloomy = Dedup.incrementalDedupBloom(incoming, existing,
      "text", "doc_id", expectedItems = 100)
      .collect().map(_.toSeq).toSet
    val plain = Dedup.incrementalDedup(incoming, existing, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(bloomy === plain)
    assert(bloomy.nonEmpty)
  }

  test("optimalNumBits is clamped and monotone") {
    assert(Bloom.optimalNumBits(1, 0.5) >= 64L)
    assert(Bloom.optimalNumBits(Long.MaxValue / 4, 0.0001) === 67108864L)
    assert(Bloom.optimalNumBits(1000, 0.01) < Bloom.optimalNumBits(10000, 0.01))
    intercept[IllegalArgumentException](Bloom.optimalNumBits(0, 0.01))
    intercept[IllegalArgumentException](Bloom.optimalNumBits(10, 1.5))
  }
}
