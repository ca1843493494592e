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

  /** Local-mode test probe: when set >= 0, [[bpeTrain]] adds one per
    * distributed round — so a spec can pin that batching actually
    * compresses K merges into far fewer blocking rounds. */
  private[ops] val probeRounds =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  /**
   * Learn the first `merges` BPE merges from the corpus. Returns one row
   * per merge: (step, left, right, freq) — step is 1-based rank, freq the
   * weighted pair count that won the round. Stops early if the
   * dictionary runs out of pairs (tiny corpora).
   *
   * Round batching (round-12 scale fix — a realistic tokenizer is
   * 30-50 k merges, and one blocking Spark round PER merge would mean
   * 30-50 k jobs + checkpoint materializations): each distributed round
   * collects the top-256 ranked pairs and accepts the longest ranked
   * prefix that provably replays sequential greedy BPE EXACTLY:
   *
   *  - the accepted pairs must be pairwise SYMBOL-DISJOINT: merging
   *    (a,b) cannot change the count of any pair touching neither a nor
   *    b (the merged token ab still sits between its neighbours), so
   *    every accepted pair's recorded count is its true count at its own
   *    sequential sub-round;
   *  - every accepted pair after the first must have count STRICTLY
   *    above the first non-accepted count (`bound`): non-accepted
   *    existing pairs only lose count, and any NEW pair created by an
   *    earlier accepted merge (x,ab) satisfies count(x,ab) <=
   *    count(x,a), where (x,a) shares symbol a and is therefore
   *    non-accepted — so everything outside the accepted prefix stays
   *    <= bound < the accepted counts, and sequential greedy (including
   *    its count-desc/left-asc/right-asc tiebreak, which only matters on
   *    EQUAL counts) must pick the accepted pairs in exactly this order.
   *
   * Natural-language corpora accept a handful of merges early (top pairs
   * share letters) and long runs later (longer tokens rarely collide),
   * so driver rounds drop from K to a small multiple of the collision
   * chains — with bit-exact output (spec-pinned against a driver-side
   * sequential reference at K=80).
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

    val topT = 256
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      if (probeRounds.get() >= 0L) probeRounds.incrementAndGet()
      // adjacent symbol pairs, weighted by word frequency: one
      // dictionary-keyed aggregate, then a distributed top-T (lowers to
      // TakeOrderedAndProject — never a global sort)
      val top = dict
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
        .limit(topT)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // longest ranked prefix that is pairwise symbol-disjoint (the
        // round winner is always safe); `bound` = the count of the first
        // item left out, the ceiling on everything non-accepted
        val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        val symbols = scala.collection.mutable.HashSet[String]()
        var i = 0
        var stopped = false
        val room = merges - step + 1
        while (i < top.length && !stopped && accepted.length < room) {
          val (a, b, f) = top(i)
          if (i == 0 || (!symbols.contains(a) && !symbols.contains(b))) {
            accepted += ((a, b, f)); symbols += a; symbols += b
          } else stopped = true
          i += 1
        }
        val bound: Long =
          if (stopped) top(i - 1)._3 // the sharing item that ended the scan
          else if (i < top.length) top(i)._3 // room cap: first item left out
          else if (top.length == topT) top.last._3 // truncated: unseen <= last
          else Long.MinValue // list exhausted: nothing exists outside
        // strict-dominance shrink: drop trailing accepted pairs whose
        // count does not strictly beat the outside ceiling (ties could
        // let a newly-created pair win the sequential tiebreak)
        while (accepted.length > 1 && accepted.last._3 <= bound)
          accepted.dropRightInPlace(1)
        accepted.foreach { case (a, b, f) =>
          out += ((step, a, b, f))
          step += 1
        }
        // literal replaces — bracketed occurrences never share characters,
        // so "replace all" IS the BPE leftmost non-overlapping fold; the
        // batch applies in accepted order (disjointness makes the order
        // irrelevant to the outcome) with ONE checkpoint per round
        dict = dict
          .withColumn("sym", accepted.foldLeft(col("sym")) {
            case (c, (a, b, _)) =>
              replace(c, lit(s"($a)($b)"), lit(s"($a$b)"))
          })
          .localCheckpoint()
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
