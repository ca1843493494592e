package graft.ops

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {

  /** Independent driver-side BPE trainer: vector-of-symbols words, pair
    * counts over ALL adjacent positions (overlap included, the classic
    * get_stats), leftmost non-overlapping merge fold. */
  private def refBpe(words: Map[String, Long],
      k: Int): Seq[(Int, String, String, Long)] = {
    var dict = words.toSeq.map { case (w, c) =>
      (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), f) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((step, a, b, f))
        dict = dict.map { case (syms, c) =>
          val bld = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              bld += (a + b); i += 2
            } else { bld += syms(i); i += 1 }
          }
          (bld.result(), c)
        }
        step += 1
      }
    }
    out.result()
  }

  private def collectMerges(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("step").collect().map(r => (r.getInt(0), r.getString(1),
      r.getString(2), r.getLong(3))).toSeq

  test("hand-traced corpus: merge order, tie-breaks, and fold semantics") {
    import spark.implicits._
    val docs = Seq("aaab aaab", "banana").toDF("text")
    val got = collectMerges(Bpe.bpeTrain(docs, "text", merges = 4))
    // r1: (a,a)=4. r2 tie at 2 → (a,b) by (left, right) order.
    // r3: (a,n)=2 beats (aa,ab) lexically. r4: (aa,ab)=2.
    assert(got === Seq((1, "a", "a", 4L), (2, "a", "b", 2L),
      (3, "a", "n", 2L), (4, "aa", "ab", 2L)))
  }

  test("back-to-back pair occurrences both merge (abab → two ab tokens)") {
    import spark.implicits._
    // 'abab' must contribute (ab,ab) after merge 1 — a shared-separator
    // packing would merge only the first occurrence
    val docs = Seq("abab abab abab").toDF("text")
    val got = collectMerges(Bpe.bpeTrain(docs, "text", merges = 2))
    assert(got(0) === ((1, "a", "b", 6L)))
    assert(got(1) === ((2, "ab", "ab", 3L)))
  }

  test("overlapping identical pairs count with overlap but fold left-to-right") {
    import spark.implicits._
    val docs = Seq("aaa aaa").toDF("text")
    val got = collectMerges(Bpe.bpeTrain(docs, "text", merges = 2))
    // get_stats counts (a,a) at both positions: freq 4; the fold then
    // packs aaa as [aa, a], so round 2 sees (aa, a) = 2
    assert(got === Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("matches the independent reference on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 40).map(_ =>
      (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString)
    val docs = (1 to 150).map(_ =>
      (1 to (3 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")).toDF("text")
    val words = docs.collect().map(_.getString(0))
      .flatMap(_.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val got = collectMerges(Bpe.bpeTrain(docs, "text", merges = 8))
    assert(got === refBpe(words, 8))
  }

  test("encodeTokenCounts applies merges in order; counts match by hand") {
    import spark.implicits._
    val docs = Seq((1L, "aaab banana"), (2L, "ab ab aaab"), (3L, "..!!.."))
      .toDF("doc_id", "text")
    // merges learned on the hand-traced corpus: aa, then ab
    val got = Bpe.encodeTokenCounts(docs, "doc_id", "text",
        Seq(("a", "a"), ("a", "b")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // aaab → [aa, ab] (2 tokens); banana → 6; ab → [ab] (1)
    assert(got.toSeq === Seq((1L, 2L, 8L), (2L, 3L, 4L)))
    // doc 3 has no [a-z] words and drops out entirely
    assert(!got.exists(_._1 == 3L))
  }

  test("batched rounds replay sequential greedy exactly at K=80, in fewer rounds") {
    import spark.implicits._
    // larger random corpus with a wider alphabet so 80 merges exist; the
    // batched trainer must be BIT-EXACT vs the sequential driver-side
    // reference (merge order, tie-breaks, recorded freqs) while issuing
    // strictly fewer distributed rounds than merges
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 300).map(_ =>
      (1 to (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(12)).toChar)
        .mkString)
    val docs = (1 to 400).map(_ =>
      (1 to (4 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")).toDF("text")
    val words = docs.collect().map(_.getString(0))
      .flatMap(_.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    Bpe.probeRounds.set(0L)
    try {
      val got = collectMerges(Bpe.bpeTrain(docs, "text", merges = 80))
      val rounds = Bpe.probeRounds.get()
      assert(got === refBpe(words, 80))
      assert(got.size === 80)
      assert(rounds < 80,
        s"batching should compress 80 merges into < 80 rounds, got $rounds")
    } finally Bpe.probeRounds.set(-1L)
  }

  test("early exhaustion: single-letter corpus stops after zero merges") {
    import spark.implicits._
    val docs = Seq("a a a b b").toDF("text")
    // only 1-symbol words — no pairs at all
    assert(Bpe.bpeTrain(docs, "text", merges = 3).count() === 0L)
  }
}
