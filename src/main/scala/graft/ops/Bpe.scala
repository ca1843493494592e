package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding merge training (Sennrich et al. 2016 —
 * the subword tokenizer behind most LLM vocabularies; public literature.
 * Reference scope: the reference ships no tokenizer ops — this is part of
 * the mandated LLM-pipeline surface).
 *
 * Scale shape: the corpus collapses ONCE into a word-frequency dictionary
 * (one token-keyed aggregate — the only pass over raw text). Every merge
 * round then runs against the dictionary, not the corpus: one
 * dictionary-keyed pair-count aggregate (map-side combined), a
 * distributed top-1 (`orderBy.limit(1)` lowers to TakeOrderedAndProject —
 * never a global sort), and a per-row literal replace over the
 * dictionary. Only the K winning pairs ever reach the driver (the
 * kmeans/logreg sync pattern, O(K) driver state); the dictionary pins per
 * round (localCheckpoint) so lineage stays flat across rounds.
 *
 * Symbol packing: each symbol is individually bracketed — `cat` packs as
 * `(c)(a)(t)` — so a pair occurrence `(a)(b)` NEVER shares characters
 * with the next occurrence, and a plain (non-regex) replace applies the
 * merge with exactly BPE's leftmost non-overlapping fold semantics. A
 * shared single-separator packing would consume the boundary and silently
 * skip back-to-back occurrences (`abab` would merge once, not twice) —
 * and RE2 (the oracle engine's regex) has no lookahead to patch that.
 *
 * Determinism: words are lowercase [a-z]+ tokens, ties rank
 * (count desc, left asc, right asc) over exact integer counts — the
 * trajectory is engine-independent and the DuckDB oracle unrolls the
 * same rounds verbatim.
 */
object Bpe {

  /**
   * Learn the first `merges` BPE merges from the corpus. Returns one row
   * per merge: (step, left, right, freq) — step is 1-based rank, freq the
   * weighted pair count that won the round. Stops early if the
   * dictionary runs out of pairs (tiny corpora).
   */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._

    // the ONLY corpus-sized pass: lowercase [a-z]+ word frequencies,
    // each word packed as (c)(a)(t)
    var dict = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", "($1)").as("sym"), col("cnt"))
      .localCheckpoint()

    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      // adjacent symbol pairs, weighted by word frequency: one
      // dictionary-keyed aggregate, then a distributed top-1
      val best = dict
        .select(split(expr("substring(sym, 2, length(sym) - 2)"), "\\)\\(")
          .as("l"), col("cnt"))
        .filter(size(col("l")) > 1)
        .select(explode(expr(
          "transform(sequence(1, size(l) - 1), i -> " +
            "struct(element_at(l, i) AS a, element_at(l, i + 1) AS b))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, f) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        out += ((step, a, b, f))
        // literal replace — bracketed occurrences never share characters,
        // so "replace all" IS the BPE leftmost non-overlapping fold
        dict = dict
          .withColumn("sym", replace(col("sym"),
            lit(s"($a)($b)"), lit(s"($a$b)")))
          .localCheckpoint()
        step += 1
      }
    }
    out.result().toDF("step", "left", "right", "freq")
  }

  /**
   * Apply an ordered merge list and return per-document BPE token counts:
   * (`idCol`, `n_words`, `n_tokens`). Documents with no [a-z]+ word drop
   * out (nothing to tokenize).
   *
   * Scale shape: the merge chain runs over the DISTINCT-word dictionary
   * (K narrow per-row replaces, no shuffle), never the corpus; per-doc
   * counts come from one (doc, word)-keyed aggregate joined word-keyed
   * against the dictionary's token counts — the join strategy is left to
   * AQE (broadcast for pipeline-sized vocabularies, shuffle join at
   * web-corpus vocab sizes).
   */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val occ = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("__occ"))
    val packed = merges.foldLeft(
      occ.select(col("w")).distinct()
        .withColumn("sym", regexp_replace(col("w"), "(.)", "($1)"))) {
      case (d, (a, b)) =>
        d.withColumn("sym", replace(col("sym"),
          lit(s"($a)($b)"), lit(s"($a$b)")))
    }
    val toks = packed.select(col("w"),
      size(split(expr("substring(sym, 2, length(sym) - 2)"), "\\)\\("))
        .cast("long").as("__wtok"))
    occ.join(toks, "w")
      .groupBy(col(idCol))
      .agg(sum(col("__occ")).as("n_words"),
        sum(col("__occ") * col("__wtok")).as("n_tokens"))
  }
}
