package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EvalSpec extends SparkTestBase {

  test("retrievalMetrics: hand-computed RR/nDCG/P/R, missed-truth and no-truth queries") {
    import spark.implicits._
    val ranked = Seq(
      // q1: hits at ranks 2 and 3; truth member z never retrieved
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      // q2: has qrels but retrieved none of them
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      // q3: no qrels at all
      (3L, 30L, 1), (3L, 31L, 2)
    ).toDF("query_id", "neighbor_id", "rank")
    val truth = Seq(
      (1L, 11L), (1L, 12L), (1L, 99L),
      (2L, 88L)
    ).toDF("query_id", "neighbor_id")
    val m = Eval.retrievalMetrics(ranked, truth, k = 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // q1: n_rel=3 hits=2 rr=1/2
    //     dcg  = 1/log2(3) + 1/log2(4)     = 0.63093 + 0.5 = 1.13093
    //     idcg = 1 + 1/log2(3) + 1/log2(4) = 2.13093 -> ndcg = 0.5307
    assert(m(0) === ((1L, 3L, 2L, 0.5, 0.5307, 0.6667, 0.6667)))
    // q2: qrels exist (idcg > 0) but zero hits -> everything 0 except n_rel
    assert(m(1) === ((2L, 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
    // q3: no qrels -> n_rel 0; recall and ndcg defined as 0, not NaN
    assert(m(2) === ((3L, 0L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("retrievalMetrics: perfect ranking gives ndcg 1; rank cutoff respected; duplicate qrels collapse") {
    import spark.implicits._
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4)
    ).toDF("query_id", "neighbor_id", "rank")
    // duplicates in truth must not double-count; the rank-4 hit is beyond k
    val truth = Seq((1L, 10L), (1L, 10L), (1L, 11L), (1L, 13L))
      .toDF("query_id", "neighbor_id")
    val r = Eval.retrievalMetrics(ranked, truth, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).head
    // n_rel=3, hits@3 = {10,11}: dcg = 1 + 1/log2(3) = 1.63093
    // idcg(min(3, 3)) = 1 + 1/log2(3) + 1/log2(4) = 2.13093 -> 0.7654
    assert(r === ((3L, 2L, 1.0, 0.7654, 0.6667, 0.6667)))
  }
}
