package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed unigram-language-model tokenizer training (Kudo 2018,
 * "Subword Regularization" — the SentencePiece unigram algorithm behind
 * T5/ALBERT/XLNet vocabularies; public literature. Reference scope: the
 * reference ships no tokenizer ops — this is part of the mandated
 * LLM-pipeline surface, the probabilistic-segmentation companion of
 * [[Bpe]]).
 *
 * Algorithm (full soft EM over the segmentation lattice, not the Viterbi
 * hard-EM shortcut):
 *
 *  - ONE corpus pass collapses the text into a word-frequency dictionary
 *    (the [[Bpe.bpeTrain]] pattern — every round after runs against the
 *    dictionary, never the corpus).
 *  - Seed vocabulary: every substring of length <= `maxPieceLen` of
 *    every dictionary word, frequency-weighted; ALL single characters
 *    (the coverage floor — never pruned, so every word always has at
 *    least its character segmentation and the lattice total is never 0)
 *    plus the `seedMultis` highest-count multi-character pieces
 *    (count desc, piece asc).
 *  - E-step: per word, forward/backward lattice sums over ALL
 *    segmentations — `fwd_i = Σ_{l=1..maxPieceLen} fwd_{i-l} ·
 *    p(w[i-l+1..i])`, fixed l-ascending left-associated fold — computed
 *    as a NARROW MAP over the dictionary with the current vocabulary as
 *    one broadcast map literal (no shuffle, no join). The expected count
 *    of the piece occurrence `[s, s+l)` is the Baum-Welch posterior
 *    `fwd_{s-1} · p · bwd_{s+l-1} / fwd_n` — closed-form from the two
 *    lattices, no per-path enumeration, no backtracking.
 *  - M-step: one piece-keyed aggregate of the frequency-weighted
 *    expected counts (map-side combined; the |vocab|-bounded result is
 *    the only thing that reaches the driver — the kmeans/logreg/bpe sync
 *    pattern), normalize, QUANTIZE to `roundDp` decimals, prune to the
 *    `vocabSize` best (single characters always survive; ties break
 *    piece-ascending).
 *
 * Determinism (the x_logreg_train pattern): per-word lattice values are
 * pure fixed-order IEEE double arithmetic over already-quantized
 * probabilities — identical in any engine. The only engine-ordered
 * operations are the expected-count sums, whose ~1e-15 relative drift
 * the post-normalization `roundDp` quantization absorbs; the seed
 * probabilities are exact integer-count divisions. The whole EM
 * trajectory is therefore engine-independent and the DuckDB oracle
 * replays every round verbatim (x_unigram_lm).
 *
 * Scale shape: one corpus-sized word aggregate; per round, one narrow
 * dictionary map (lattices), one bounded explode (<= maxWordLen ·
 * maxPieceLen occurrence rows per word), one piece-keyed partial-
 * aggregated sum, and O(vocab) driver state. 100 TB of text changes only
 * the first aggregate; EM cost is dictionary-sized.
 */
object UnigramLm {

  /** Quantize with a floor of one quantum: a live piece must never round
    * to probability 0 — a 0-prob single character would zero a word's
    * whole lattice total (0/0 posteriors), and a 0-prob piece can never
    * re-earn mass. The floor is part of the replayable definition
    * (oracle: `greatest(round(x, dp), 1e-dp)`). */
  private def q(v: Double, dp: Int): Double =
    math.max(
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(1).bigDecimal.movePointLeft(dp).doubleValue)

  /** Train and return the final vocabulary, one row per piece:
    * `(piece, prob)`, ordered by piece. `prob` is the quantized unigram
    * probability from the last EM round's M-step (unnormalized-over-kept:
    * pruning does not re-normalize, matching the quantized trajectory the
    * oracle replays). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 45,
      rounds: Int = 2, maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedMultis: Int = 60, roundDp: Int = 9): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val spark = docs.sparkSession
    import spark.implicits._

    // the ONLY corpus-sized pass: lowercase [a-z]+ word frequencies
    // (words beyond maxWordLen are excluded — SentencePiece likewise caps
    // lattice length; the cap is part of the replayable definition)
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint()

    // seed candidates: frequency-weighted substring occurrence counts
    val cand = words
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), s ->
            transform(sequence(1, least($maxPieceLen, length(w) - s + 1)),
              l -> substring(w, s, l))))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val singles = cand.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    require(singles.nonEmpty, "unigramLmTrain: no [a-z]+ words in the corpus")
    val multis = cand.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedMultis)
      .as[(String, Long)].collect()
    val sel = (singles ++ multis).sortBy(_._1)
    val total = sel.map(_._2).sum.toDouble
    var vocab: Map[String, Double] =
      sel.map { case (p, c) => p -> q(c.toDouble / total, roundDp) }.toMap

    (1 to rounds).foreach { _ =>
      // forward lattice: fArr[i+1] = fwd_i (1-based array, fArr[1] = 1)
      val fTerms = (1 to maxPieceLen).map(l =>
        s"""(CASE WHEN i >= $l THEN element_at(acc, i - $l + 1) *
            coalesce(try_element_at(V, substring(w, i - $l + 1, $l)), 0.0D)
            ELSE 0.0D END)""").mkString(" + ")
      // backward lattice, built from the word's end: bArr[j+1] = bwd_{n-j}
      val bTerms = (1 to maxPieceLen).map(l =>
        s"""(CASE WHEN j >= $l THEN
            coalesce(try_element_at(V, substring(w, length(w) - j + 1, $l)), 0.0D)
            * element_at(acc, j - $l + 1) ELSE 0.0D END)""").mkString(" + ")
      val expected = words
        .withColumn("V", typedlit(vocab))
        .withColumn("fArr", expr(s"""aggregate(sequence(1, length(w)),
            array(1.0D), (acc, i) -> concat(acc, array($fTerms)))"""))
        .withColumn("bArr", expr(s"""aggregate(sequence(1, length(w)),
            array(1.0D), (acc, j) -> concat(acc, array($bTerms)))"""))
        // Baum-Welch posterior per occurrence [s, s+l):
        //   fwd_{s-1} * p * bwd_{s+l-1} / fwd_n
        .select(col("freq"), explode(expr(
          s"""flatten(transform(sequence(1, length(w)), s ->
              transform(sequence(1, least($maxPieceLen, length(w) - s + 1)), l ->
                struct(substring(w, s, l) AS piece,
                  element_at(fArr, s)
                    * coalesce(try_element_at(V, substring(w, s, l)), 0.0D)
                    * element_at(bArr, length(w) - s - l + 2)
                    / element_at(fArr, length(w) + 1) AS e))))""")).as("o"))
        .select(col("o.piece").as("piece"),
          (col("freq") * col("o.e")).as("contrib"))
        .filter(col("contrib") > 0.0)
        .groupBy(col("piece")).agg(sum(col("contrib")).as("E"))
        .as[(String, Double)].collect()
        .sortBy(_._1)
      // Quantize each expected count to an integer number of 1e-6 quanta
      // BEFORE normalizing: the total then sums exactly (Long arithmetic
      // is associative), so the normalizer is independent of summation
      // order — the DuckDB replay's arbitrary-order sum(eq) lands on the
      // same Long bit-for-bit, where a float sum over ~vocab terms could
      // drift a value sitting near a rounding boundary across a quantum.
      // Scale bound: eq ≤ corpus-occurrences × 1e6, far under 2^63.
      val expectedQ = expected.map { case (p, e) => (p, math.round(e * 1e6)) }
      val eTotal = expectedQ.map(_._2).sum
      val probs = expectedQ.map { case (p, eq) =>
        (p, q(eq.toDouble / eTotal.toDouble, roundDp)) }
      val nSingles = probs.count(_._1.length == 1)
      val keptMultis = probs.filter(_._1.length > 1)
        .sortBy { case (p, pr) => (-pr, p) }
        .take(math.max(0, vocabSize - nSingles))
      vocab = (probs.filter(_._1.length == 1) ++ keptMultis).toMap
    }
    vocab.toSeq.sortBy(_._1).toDF("piece", "prob")
  }

  /**
   * Viterbi encoding with a trained vocabulary — SentencePiece's default
   * decode: segment each word into the maximum-probability piece
   * sequence and return per-document token counts
   * (`idCol`, `n_words`, `n_tokens`), the [[Bpe.encodeTokenCounts]]
   * companion. Ties (equal path probability — exact IEEE products of the
   * quantized piece probs, so cross-engine comparisons are exact) prefer
   * FEWER pieces, then the shorter candidate piece at the boundary
   * (l-ascending first-wins) — a total, replayable order. Words longer
   * than `maxWordLen` or with an unsegmentable character are excluded
   * (training saw every character of its own corpus, so self-encoding
   * always covers).
   *
   * Scale shape: the Viterbi lattice runs over the DISTINCT-word
   * dictionary as a narrow map (vocab as one broadcast map literal, no
   * shuffle); per-doc counts are one (doc, word) aggregate joined
   * word-keyed against the dictionary's token counts — AQE picks
   * broadcast vs shuffle by vocabulary size.
   */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Double], maxPieceLen: Int = 4,
      maxWordLen: Int = 12): DataFrame = {
    require(vocab.nonEmpty, "encodeTokenCounts: empty vocabulary")
    // pinned WHEN LARGE (r18): `occ` feeds the dictionary distinct (via
    // the eager checkpoint below) AND the final per-doc join — without a
    // pin the corpus explode+aggregate runs once per consumer at scale
    val occ = Dedup.pinIfLarge(docs, docs
      .select(col(idCol), explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("__occ")))
    // dp[i+1] = best (prob-max, then piece-count-min, then first-l) path
    // over positions; candidates fold l = 1..maxPieceLen with a strict
    // replace rule, so ties keep the smallest l — replayed verbatim by
    // the oracle's generated pick chain. The fold is a NESTED aggregate
    // with l as a lambda variable, not an unrolled pick chain: an
    // unrolled reduce duplicates each candidate subtree ~3× per level
    // (exponential in maxPieceLen), which ballooned driver-side plan
    // optimization to ~40 s per run before this shape
    val cand =
      s"""named_struct(
            'pr', (element_at(acc, i - l + 1)).pr *
              coalesce(try_element_at(V, substring(w, i - l + 1, l)), 0.0D),
            'cnt', (element_at(acc, i - l + 1)).cnt + 1)"""
    val best =
      s"""aggregate(sequence(1, $maxPieceLen),
          named_struct('pr', -1.0D, 'cnt', 0),
          (bst, l) -> CASE
            WHEN l > i THEN bst
            WHEN ($cand).pr > bst.pr OR
                 (($cand).pr = bst.pr AND ($cand).cnt < bst.cnt) THEN $cand
            ELSE bst END)"""
    // the checkpoint is load-bearing: without the lineage break the
    // optimizer pushes the __pr filter (and the whole lattice projection
    // with it) BELOW the distinct, evaluating the per-word DP once per
    // corpus occurrence instead of once per dictionary word (measured
    // ~25x on sf0.1)
    val words = occ.select(col("w")).distinct().localCheckpoint()
      .withColumn("V", typedlit(vocab))
      .withColumn("__dp", expr(
        s"""aggregate(sequence(1, length(w)),
            array(named_struct('pr', 1.0D, 'cnt', 0)),
            (acc, i) -> concat(acc, array($best)))"""))
      .select(col("w"),
        expr("(element_at(__dp, length(w) + 1)).pr").as("__pr"),
        expr("(element_at(__dp, length(w) + 1)).cnt").cast("long").as("__wtok"))
      .filter(col("__pr") > 0.0)
      .select(col("w"), col("__wtok"))
    occ.join(words, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("__occ")).as("n_words"),
        sum(col("__occ") * col("__wtok")).as("n_tokens"))
  }
}
