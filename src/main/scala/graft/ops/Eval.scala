package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Retrieval-quality evaluation — the metrics a training-data pipeline
 * computes over its own retrieval stages (hard-negative mining audits,
 * embedding-model regression gates, BM25-vs-dense comparisons): per-query
 * reciprocal rank, nDCG@k, precision@k and recall@k against a relevance
 * set, from any ranked result (bruteForceTopK / ivfSearch / bm25TopK all
 * emit the (query, doc, rank) shape this consumes).
 *
 * Scale shape: the ranked input is already |queries|·k rows (the expensive
 * part happened upstream); metrics add one (query,doc)-keyed equi-join
 * against the relevance pairs and one query-keyed aggregate — both
 * shuffle-bounded by the RANKED set, never the corpus. The relevance side
 * is a labeled eval set (qrels), bounded by annotation budget, so AQE
 * broadcasts it in practice. Determinism: DCG folds over the per-query hit
 * ranks in ASCENDING order (sorted array, sequential fold), and IDCG over
 * `1..min(k, n_rel)` — both replayable fold-for-fold in the DuckDB oracle,
 * so doubles match bit-exactly, not just approximately.
 */
object Eval {

  /**
   * Per-query retrieval metrics at cutoff `k`.
   *
   * @param ranked (queryCol, docCol, rankCol) rows, rank 1-based; rows
   *               with rank > k contribute nothing to the metrics but DO
   *               keep their query in the output (hits 0, rr 0, ndcg 0) —
   *               a query whose results all rank beyond the cutoff is a
   *               zero-quality query, not an absent one, and dropping it
   *               would inflate every macro-average downstream
   * @param truth  (queryCol, docCol) relevant pairs; duplicates tolerated
   * @return one row per query appearing in `ranked`: `n_rel` (relevant
   *         universe size, 0 when the query has no qrels), `hits` (@k),
   *         `rr` (1/rank of first hit, 0 when none), `ndcg` (binary-gain
   *         nDCG@k, 0 when idcg is 0), `precision_k`, `recall_k`
   */
  def retrievalMetrics(ranked: DataFrame, truth: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "neighbor_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val t = truth.select(col(queryCol).as("__q"), col(docCol).as("__d")).distinct()
    val nRel = t.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    // the cutoff rides the JOIN condition, not a pre-filter: a query with
    // only beyond-k rows must still group into a zero-metrics output row
    val perQuery = ranked
      .join(t, col(queryCol) === col("__q") && col(docCol) === col("__d") &&
        col(rankCol) <= k, "left")
      .groupBy(col(queryCol))
      .agg(
        count(col("__d")).as("hits"),
        coalesce(max(when(col("__d").isNotNull,
          lit(1.0) / col(rankCol).cast("double"))), lit(0.0)).as("rr"),
        // hit ranks ascending; DCG folds sequentially over that order so
        // the sum is reproducible (and oracle-replayable) bit-for-bit
        array_sort(collect_list(when(col("__d").isNotNull,
          col(rankCol).cast("double")))).as("__hit_ranks"))
      .withColumn("__dcg", aggregate(col("__hit_ranks"), lit(0.0),
        (acc, r) => acc + lit(1.0) / log2(r + 1)))
    perQuery
      .join(nRel, perQuery(queryCol) === nRel("__q"), "left")
      .drop("__q")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      // sequence(1, 0) would produce a DESCENDING [1, 0] — guard n_rel = 0
      .withColumn("__idcg", when(col("n_rel") >= 1,
        aggregate(sequence(lit(1), least(lit(k), col("n_rel")).cast("int")),
          lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1)))
        .otherwise(lit(0.0)))
      .select(col(queryCol), col("n_rel"), col("hits"),
        round(col("rr"), 4).as("rr"),
        round(when(col("__idcg") > 0, col("__dcg") / col("__idcg"))
          .otherwise(lit(0.0)), 4).as("ndcg"),
        round(col("hits").cast("double") / k, 4).as("precision_k"),
        round(when(col("n_rel") > 0, col("hits").cast("double") / col("n_rel"))
          .otherwise(lit(0.0)), 4).as("recall_k"))
  }
}
