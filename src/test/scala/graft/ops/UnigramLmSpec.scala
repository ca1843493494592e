package graft.ops

import graft.SparkTestBase

/** Pins [[UnigramLm.train]] against an independent driver-side sequential
  * reference of the same EM (plain loops, word-ordered sums): the
  * quantized trajectory must be engine/order-independent — the property
  * the DuckDB oracle replay (x_unigram_lm) relies on. */
class UnigramLmSpec extends SparkTestBase {

  private def q(v: Double, dp: Int): Double =
    math.max(
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(1).bigDecimal.movePointLeft(dp).doubleValue)

  /** Sequential soft-EM reference: identical seed rule, lattice
    * recurrences, quantization, and prune rule — but computed one word at
    * a time with plain loops and word-ordered accumulation. */
  private def reference(wordFreq: Seq[(String, Long)], vocabSize: Int,
      rounds: Int, maxPieceLen: Int, seedMultis: Int,
      dp: Int): Map[String, Double] = {
    val cnt = collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wordFreq; s <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - s)) {
      val p = w.substring(s, s + l)
      cnt(p) = cnt.getOrElse(p, 0L) + f
    }
    val singles = cnt.filter(_._1.length == 1).toSeq
    val multis = cnt.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMultis)
    val sel = (singles ++ multis).sortBy(_._1)
    val total = sel.map(_._2).sum.toDouble
    var vocab = sel.map { case (p, c) => p -> q(c.toDouble / total, dp) }.toMap
    for (_ <- 1 to rounds) {
      val e = collection.mutable.Map.empty[String, Double]
      for ((w, f) <- wordFreq.sortBy(_._1)) {
        val n = w.length
        val fwd = Array.fill(n + 1)(0.0); fwd(0) = 1.0
        for (i <- 1 to n) {
          var s = 0.0
          for (l <- 1 to math.min(maxPieceLen, i))
            s += fwd(i - l) * vocab.getOrElse(w.substring(i - l, i), 0.0)
          fwd(i) = s
        }
        val bwd = Array.fill(n + 1)(0.0); bwd(n) = 1.0
        for (i <- (n - 1) to 0 by -1) {
          var s = 0.0
          for (l <- 1 to math.min(maxPieceLen, n - i))
            s += vocab.getOrElse(w.substring(i, i + l), 0.0) * bwd(i + l)
          bwd(i) = s
        }
        for (s0 <- 0 until n; l <- 1 to math.min(maxPieceLen, n - s0)) {
          val piece = w.substring(s0, s0 + l)
          val p = vocab.getOrElse(piece, 0.0)
          val contrib = f * ((fwd(s0) * p * bwd(s0 + l)) / fwd(n))
          if (contrib > 0) e(piece) = e.getOrElse(piece, 0.0) + contrib
        }
      }
      val sorted = e.toSeq.sortBy(_._1)
      // the round-14 order-independent normalizer: expected counts
      // quantized to integer 1e-6 quanta, summed exactly in Long space
      val eq = sorted.map { case (p, ev) => (p, math.round(ev * 1e6)) }
      val tot = eq.map(_._2).sum
      val probs = eq.map { case (p, v) => (p, q(v.toDouble / tot.toDouble, dp)) }
      val nS = probs.count(_._1.length == 1)
      vocab = (probs.filter(_._1.length == 1) ++
        probs.filter(_._1.length > 1).sortBy { case (p, pr) => (-pr, p) }
          .take(math.max(0, vocabSize - nS))).toMap
    }
    vocab
  }

  test("train matches the sequential soft-EM reference (pieces exact, probs to 1e-9)") {
    import spark.implicits._
    val sentences = Seq(
      "the fast table scan beats the slow table scan",
      "the query plan joins the big table to the small table",
      "fast hash join beats slow sort merge join",
      "the the the scanner scans tables fast",
      "small batch big batch fast batch")
    val docs = sentences.toDF("text")
    val out = UnigramLm.train(docs, "text", vocabSize = 30, rounds = 3,
        maxPieceLen = 4, maxWordLen = 12, seedMultis = 40)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val wordFreq = sentences
      .flatMap(_.toLowerCase.split("[^a-z]+")).filter(w => w.nonEmpty && w.length <= 12)
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    val want = reference(wordFreq, vocabSize = 30, rounds = 3,
      maxPieceLen = 4, seedMultis = 40, dp = 9)

    assert(out.keySet === want.keySet,
      s"piece sets differ: extra=${out.keySet -- want.keySet}, missing=${want.keySet -- out.keySet}")
    out.foreach { case (p, pr) =>
      assert(math.abs(pr - want(p)) < 1e-9, s"piece '$p': $pr vs ${want(p)}")
    }
    // structural invariants: coverage floor + target size + useful merges
    val chars = sentences.flatMap(_.toLowerCase.filter(_.isLetter)).toSet
    chars.foreach(c => assert(out.contains(c.toString), s"single '$c' must survive"))
    assert(out.size <= 30 + 0) // singles < 30 here, so the cap binds exactly
    assert(out.size === 30)
    assert(out.keys.exists(_.length > 1), "EM must retain multi-char pieces")
    assert(out.values.forall(p => p > 0.0 && p <= 1.0))
  }

  test("encodeTokenCounts matches a sequential Viterbi reference") {
    import spark.implicits._
    val sentences = Seq(
      (1L, "the fast table scan beats the slow table scan"),
      (2L, "fast hash join beats slow sort merge join"),
      (3L, "the scanner scans the tables fast and faster"))
    val docs = sentences.toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 25, rounds = 2,
        maxPieceLen = 4, maxWordLen = 12, seedMultis = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    def viterbi(w: String): Option[Int] = {
      // (prob, count), ties prefer fewer pieces then smaller l (first wins)
      val n = w.length
      val dp = Array.fill(n + 1)((0.0, 0)); dp(0) = (1.0, 0)
      for (i <- 1 to n) {
        var best = (-1.0, 0)
        for (l <- 1 to math.min(4, i)) {
          val c = (dp(i - l)._1 * vocab.getOrElse(w.substring(i - l, i), 0.0),
            dp(i - l)._2 + 1)
          if (c._1 > best._1 || (c._1 == best._1 && c._2 < best._2)) best = c
        }
        dp(i) = best
      }
      if (dp(n)._1 > 0.0) Some(dp(n)._2) else None
    }
    val want = sentences.map { case (id, text) =>
      val ws = text.toLowerCase.split("[^a-z]+").filter(w => w.nonEmpty && w.length <= 12)
        .flatMap(w => viterbi(w).map(t => (1L, t.toLong)))
      id -> (ws.map(_._1).sum, ws.map(_._2).sum)
    }.toMap

    val got = UnigramLm.encodeTokenCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    // singles always cover, so every word segments and tokens >= words
    got.foreach { case (_, (w, t)) => assert(t >= w && w > 0) }
  }

  test("quantized trajectory is partition-order independent") {
    import spark.implicits._
    val docs = (1 to 50).map(i => s"stream window state store $i th batch")
      .toDF("text")
    val a = UnigramLm.train(docs.repartition(1), "text", vocabSize = 25,
      rounds = 2).collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val b = UnigramLm.train(docs.repartition(13), "text", vocabSize = 25,
      rounds = 2).collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(a === b, "different partitionings must quantize to one trajectory")
  }
}
