package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Test-set decontamination: flag corpus documents that share word n-grams
 * with a benchmark/eval probe set — the standard overlap check run before
 * training (GPT-3 App. C / PaLM App. F style: a document is contaminated
 * when any length-n token window also appears in an eval document).
 *
 * Scale shape (100 TB corpus, MB-scale benchmark suite): the probe n-gram
 * set is distinct-ed and BROADCAST, so the corpus side — the expensive
 * side — never shuffles for the join; its only shuffle is the final
 * per-document aggregation, which operates on the (rare) hits alone.
 * Tokenization happens in its own projection so the interpreted shingle
 * lambda slices a bound array (see [[TextAnalysis.shinglesOfTokens]]).
 *
 * Not in the reference (its surface is the versioned-table layer); this is
 * one of the mandated LLM-pipeline extensions alongside [[Dedup]] and
 * [[Corpus]].
 */
object Decontaminate {

  /**
   * Per-document n-gram overlap report against `probes`.
   *
   * Returns one row per CONTAMINATED corpus document (at least one shared
   * n-gram): `(idCol, keepCols*, n_grams, n_hits)` where `n_grams` is the
   * document's distinct n-gram count and `n_hits` how many of those also
   * occur anywhere in the probe set. Clean documents are absent — at scale
   * the report is the (small) kill-list joined back for filtering, not a
   * full-corpus annotation.
   *
   * @param corpus  documents to scan
   * @param probes  benchmark/eval documents providing the n-grams to match
   * @param n       token-window length (13 is the common production value;
   *                tests use smaller n so synthetic fixtures collide)
   */
  def ngramOverlap(corpus: DataFrame, probes: DataFrame,
      textCol: String, idCol: String, n: Int,
      keepCols: Seq[String] = Seq.empty): DataFrame = {
    require(n >= 1, s"n-gram length must be positive, got $n")
    val probeGrams = probes
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(explode(array_distinct(
        TextAnalysis.shinglesOfTokens(col("__toks"), n))).as("__gram"))
      .distinct()
    val carried = col(idCol) +: keepCols.map(col)
    def gramsOfToks: Column =
      array_distinct(TextAnalysis.shinglesOfTokens(col("__toks"), n))
    // the generator child must stay a raw EXPRESSION, not a materialized
    // alias: over an alias, InferFiltersFromGenerate adds size(alias) > 0
    // and predicate pushdown inlines the whole interpreted shingle pipeline
    // into a pre-Generate filter, re-shingling every row once more per
    // predicate. n_grams is therefore recomputed AFTER the join instead —
    // on the (rare) hit rows only, from the carried token array.
    val corpusGrams = Par.fanOut(corpus, col(idCol))
      .select((carried :+ TextAnalysis.tokens(col(textCol)).as("__toks")): _*)
      .select((carried :+ col("__toks")
        :+ explode(gramsOfToks).as("__gram")): _*)
    corpusGrams
      .join(broadcast(probeGrams), "__gram")
      .select((carried :+ size(gramsOfToks).as("n_grams")): _*)
      // grams are distinct per document, so the hit count needs no
      // per-group distinct state — a plain count after the semi-match
      .groupBy((carried :+ col("n_grams")): _*)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The filtering counterpart: corpus rows whose document shares NO
    * n-gram with the probe set. The probe-gram join inside
    * [[ngramOverlap]] stays broadcast (benchmark suites are MB-scale by
    * contract); the kill-list anti-join here carries no hint — a heavily
    * contaminated corpus can make the hit list arbitrarily large, so the
    * strategy is left to AQE's measured-size decision. */
  def removeContaminated(corpus: DataFrame, probes: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val hits = ngramOverlap(corpus, probes, textCol, idCol, n)
      .select(col(idCol))
    corpus.join(hits, Seq(idCol), "left_anti")
  }
}
