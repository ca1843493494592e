package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bit-parity of the native [[TokenShingleHashes]] against the
  * interpreted `transform(tokens, xxhash64)` |> shingleHashCol HOF chain
  * it replaced in the minhash family — the DuckDB oracle replays the
  * exact hash arithmetic, so not one bit may move. */
class ShingleHashSpec extends SparkTestBase {

  // mixConst(1000+j), duplicated from Dedup (private there): splitmix64
  private def mixConst(i: Int): (Long, Long) = {
    def sm(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (sm(i.toLong * 2 + 1) | 1L, sm(i.toLong * 2 + 2))
  }

  private def hofShingles(tokens: org.apache.spark.sql.Column, n: Int) = {
    val th = transform(tokens, t => xxhash64(t))
    when(size(th) >= n,
      transform(sequence(lit(0), size(th) - lit(n)), i =>
        (0 until n).map { j =>
          val (a, b) = mixConst(1000 + j)
          GraftFunctions.wrapping_affine(element_at(th, i + lit(j + 1)), a, b)
        }.reduce((x, y) => x.bitwiseXOR(y))))
      .otherwise(array().cast("array<long>"))
  }

  test("token_shingle_hashes == xxhash64+affine-XOR HOF chain, bitwise") {
    import spark.implicits._
    val r = new scala.util.Random(29)
    val vocab = Seq("alpha", "beta", "Gamma", "ünïcode", "x", "", "123", "a-b")
    val docs = (1 to 80).map { i =>
      (i.toLong, Seq.fill(r.nextInt(10))(vocab(r.nextInt(vocab.size))))
    }.toDF("id", "__toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val (as, bs) = (0 until n).map(j => mixConst(1000 + j)).unzip
      val rows = docs.select(col("id"),
        hofShingles(col("__toks"), n).as("h"),
        coalesce(GraftFunctions.token_shingle_hashes(col("__toks"), as, bs),
          typedlit(Seq.empty[Long])).as("nv")).collect()
      rows.foreach { row =>
        assert(row.getSeq[Long](1) === row.getSeq[Long](2),
          s"id=${row.getLong(0)} n=$n")
      }
    }
  }

  test("null tokens coalesce to the empty array, like the when/otherwise") {
    import spark.implicits._
    val (as, bs) = (0 until 3).map(j => mixConst(1000 + j)).unzip
    val df = Seq((1L, Option.empty[Seq[String]])).toDF("id", "__toks")
      .select(coalesce(GraftFunctions.token_shingle_hashes(col("__toks"), as, bs),
        typedlit(Seq.empty[Long])).as("s"))
    assert(df.head.getSeq[Long](0) === Seq.empty)
  }
}
