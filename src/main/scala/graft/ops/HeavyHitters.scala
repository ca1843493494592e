package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftAggregates.misra_gries

/**
 * Exact heavy hitters at scale — the standard two-pass pattern over the
 * [[graft.functions.MisraGries]] summary aggregate:
 *
 *  1. one pass builds a k-entry Misra-Gries candidate summary
 *     (map-side partials, only k-entry summaries ride the shuffle — the
 *     full item vocabulary never aggregates);
 *  2. one pass exact-counts ONLY the candidates (a broadcast-able k-row
 *     semi-join prunes the count to candidate rows) and applies the
 *     support threshold in exact integer arithmetic.
 *
 * With `k >= supportDenom`, the MG guarantee (any item with frequency
 * > n/(k+1) survives the summary) makes the candidate set a SUPERSET of
 * every item over the threshold `n / supportDenom` — so the two-pass
 * result equals the full exact GROUP BY + HAVING, at a fraction of its
 * shuffle: the exact pass aggregates at most k items instead of the
 * vocabulary. `k` defaults to `2 * supportDenom` for slack.
 */
object HeavyHitters {

  /** Items of `itemCol` with `count * supportDenom > n` (frequency
    * strictly above `1/supportDenom` of all non-null rows), with exact
    * counts: `(item, cnt)`. Deterministic — identical to the brute-force
    * GROUP BY + HAVING — while only MG summaries and candidate rows
    * shuffle. */
  def heavyHitters(df: DataFrame, itemCol: String,
      supportDenom: Int, k: Int = 0): DataFrame = {
    require(supportDenom >= 2, s"supportDenom must be >= 2, got $supportDenom")
    val kk = if (k > 0) k else 2 * supportDenom
    require(kk + 1 > supportDenom,
      s"k=$kk cannot guarantee recall at support 1/$supportDenom (need k+1 > denom)")
    val items = df.select(col(itemCol).as("item")).filter(col("item").isNotNull)
    val cands = items
      .agg(misra_gries(col("item"), kk).as("__s"))
      .select(explode(col("__s")).as("__e"))
      .select(col("__e.item").as("item"))
    val total = items.agg(count(lit(1)).as("__n"))
    items
      .join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * supportDenom > col("__n"))
      .select(col("item"), col("cnt"))
  }
}
