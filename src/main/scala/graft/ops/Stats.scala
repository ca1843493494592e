package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-shaping operators for feature pipelines.
 *
 * Scale shapes here follow one pattern: the per-group statistics are a
 * |groups|-row aggregate computed with mergeable partial aggregation,
 * broadcast back onto the corpus, and applied as narrow codegen'd map
 * work — the corpus itself is never shuffled.
 */
object Stats {

  /**
   * Per-group winsorization: clip `valueCol` into the exact
   * [pLo, pHi] quantile range of its group — the outlier-taming step
   * before averaging/regression over heavy-tailed metrics. Adds
   * `<value>_clipped` plus `clipped_low` / `clipped_high` flags;
   * all input columns pass through.
   *
   * Uses EXACT percentiles (`percentile`, linear interpolation — the
   * semantics DuckDB's `quantile_cont` mirrors); swap in
   * `approx_percentile` at scales where the exact sort-based aggregate
   * is too hot — the operator shape is unchanged.
   */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi,
      s"need 0 <= pLo <= pHi <= 1, got ($pLo, $pHi)")
    val v = col(valueCol)
    val bounds =
      if (groupCols.nonEmpty)
        df.groupBy(groupCols.map(col): _*)
          .agg(expr(s"percentile($valueCol, $pLo)").as("__lo"),
            expr(s"percentile($valueCol, $pHi)").as("__hi"))
      else
        df.agg(expr(s"percentile($valueCol, $pLo)").as("__lo"),
          expr(s"percentile($valueCol, $pHi)").as("__hi"))
    val joined =
      if (groupCols.nonEmpty) df.join(broadcast(bounds), groupCols)
      else df.crossJoin(broadcast(bounds))
    // greatest/least skip nulls (a null metric would silently clamp to the
    // low bound) — null values stay null and are flagged unclipped
    joined
      .withColumn(s"${valueCol}_clipped",
        when(v.isNull, lit(null))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .withColumn("clipped_low",
        v.isNotNull && coalesce(v < col("__lo"), lit(false)))
      .withColumn("clipped_high",
        v.isNotNull && coalesce(v > col("__hi"), lit(false)))
      .drop("__lo", "__hi")
  }
}
