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

  /** Consistency constant making MAD estimate sigma under normality. */
  val madSigma = 1.4826

  /**
   * Robust per-group outlier detection via MAD (median absolute
   * deviation): `robust_z = |v - median| / (1.4826 · MAD)`, flagged when
   * above `k` — the monitoring/data-quality filter that, unlike
   * mean/stddev z-scores, is not itself dragged by the outliers it is
   * hunting. Adds `robust_z` (null when the value is null or the group's
   * MAD is 0) and `is_outlier` (false in those cases); all input columns
   * pass through.
   *
   * Scale shape: two |groups|-row exact-percentile aggregates (median,
   * then MAD against the broadcast median), each broadcast back onto a
   * corpus scan — three scans total, never a corpus shuffle. The stat
   * joins are NULL-SAFE on the group keys, so rows in a null group keep
   * flowing through (flagged against the null group's own stats) instead
   * of silently vanishing from an inner equi-join.
   */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "madOutliers needs at least one group column")
    val v = col(valueCol)
    // null-safe broadcast attach of a stats frame keyed by the group cols
    def attach(base: DataFrame, stats: DataFrame, statCol: String): DataFrame = {
      val aliased = stats.select(
        (groupCols.map(c => col(c).as(s"__g_$c")) :+ col(statCol)): _*)
      val cond = groupCols.map(c => base(c) <=> aliased(s"__g_$c")).reduce(_ && _)
      base.join(broadcast(aliased), cond, "left")
        .drop(groupCols.map(c => s"__g_$c"): _*)
    }
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, 0.5)").as("__med"))
    val withMed = attach(df, med, "__med")
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(abs(`$valueCol` - __med), 0.5)").as("__mad"))
    attach(withMed, mad, "__mad")
      .withColumn("robust_z",
        when(v.isNotNull && col("__mad") > 0,
          abs(v - col("__med")) / (lit(madSigma) * col("__mad"))))
      .withColumn("is_outlier", coalesce(col("robust_z") > k, lit(false)))
      .drop("__med", "__mad")
  }

  /**
   * Population Stability Index — the standard production drift monitor
   * between a reference and a current slice of a metric: bucket both by
   * the REFERENCE deciles (equi-depth on ref, so a stable distribution
   * puts ~1/buckets mass everywhere), then
   * `PSI = Σ (p_i - q_i) · ln(p_i / q_i)`. Returns one row per bucket
   * with counts and the PSI term (sum the column for the headline number;
   * <0.1 stable, >0.25 action). Laplace smoothing (+0.5 per bucket)
   * keeps empty current-side buckets finite and fully deterministic —
   * no epsilon clamps that an oracle can't mirror.
   *
   * Scale shape: one |cuts|-row exact-percentile aggregate on the
   * reference, broadcast onto BOTH slices as a per-row array search
   * (narrow); each slice collapses map-side to a `buckets`-row count
   * table; everything after runs on 2·buckets rows. Null values land in
   * bucket 0 of their slice — filter them first if that skews the story.
   */
  def populationStability(ref: DataFrame, cur: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val cuts = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = ref.agg(
      expr(s"percentile(`$valueCol`, array(${cuts.mkString(", ")}))").as("__b"))
    def bucketCounts(df: DataFrame, outCol: String): DataFrame =
      df.crossJoin(broadcast(bounds))
        .select(size(filter(col("__b"), b => b <= col(valueCol))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(outCol))
    val scaffold = ref.sparkSession.range(0, buckets)
      .select(col("id").cast("int").as("bucket"))
    val joined = scaffold
      .join(bucketCounts(ref, "ref_n"), Seq("bucket"), "left")
      .join(bucketCounts(cur, "cur_n"), Seq("bucket"), "left")
      .na.fill(0L, Seq("ref_n", "cur_n"))
    val tot = joined.agg(sum(col("ref_n")).as("__rt"), sum(col("cur_n")).as("__ct"))
    val half = lit(0.5)
    val smoothTot = half * buckets
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        round(((col("ref_n") + half) / (col("__rt") + smoothTot)
          - (col("cur_n") + half) / (col("__ct") + smoothTot))
          * log(((col("ref_n") + half) / (col("__rt") + smoothTot))
            / ((col("cur_n") + half) / (col("__ct") + smoothTot))), 6)
          .as("psi_term"))
  }

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
          .agg(expr(s"percentile(`$valueCol`, $pLo)").as("__lo"),
            expr(s"percentile(`$valueCol`, $pHi)").as("__hi"))
      else
        df.agg(expr(s"percentile(`$valueCol`, $pLo)").as("__lo"),
          expr(s"percentile(`$valueCol`, $pHi)").as("__hi"))
    // null-safe attach, the madOutliers contract: a null group's rows
    // clamp against the null group's own bounds instead of silently
    // vanishing from an inner equi-join
    val joined =
      if (groupCols.nonEmpty) {
        val aliased = bounds.select(
          (groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__lo") :+ col("__hi")): _*)
        val cond = groupCols.map(c => df(c) <=> aliased(s"__g_$c")).reduce(_ && _)
        df.join(broadcast(aliased), cond, "left")
          .drop(groupCols.map(c => s"__g_$c"): _*)
      } else df.crossJoin(broadcast(bounds))
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

  /**
   * A/B experiment readout with CUPED variance reduction (Deng et al.,
   * WSDM'13): per-unit metric `y` over the experiment period, pre-period
   * covariate `x`, adjustment `y_cuped = y - theta * (x - mean(x))` with
   * `theta = cov(y, x) / var(x)` estimated on the pooled population, and a
   * Welch t statistic on the adjusted means. The pre-period covariate is
   * unaffected by treatment, so the adjustment removes the between-user
   * variance it explains without biasing the treatment delta.
   *
   * Input `perUnit` must carry one row per experiment unit with columns
   * `variantCol` (two distinct values, compared in ascending order),
   * `yCol` and `xCol` (nulls treated as 0 upstream by the caller).
   * Returns one row per variant — `variant, n_units, mean_y, mean_cuped,
   * var_y, var_cuped` — plus the pooled scalars `theta`,
   * `var_reduction_pct` and `t_cuped` repeated on each row.
   *
   * Scale shape: the unit table is already the |units|-row reduction of
   * the raw event log (caller aggregates); this adds one scalar aggregate
   * (theta / mean — mergeable partials), a broadcast of that single row
   * back onto the unit table, and a 2-row variant aggregate. The event
   * corpus is never shuffled here.
   */
  def cupedAbTest(perUnit: DataFrame, variantCol: String, yCol: String,
      xCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val x = col(xCol).cast("double")
    // a constant covariate carries no information: theta degrades to 0
    // (no adjustment) instead of an ANSI divide-by-zero
    val pooled = perUnit.agg(
      when(var_pop(x) === 0d, lit(0d))
        .otherwise(covar_pop(y, x) / var_pop(x)).as("__theta"),
      avg(x).as("__x_mean"))
    val adjusted = perUnit.crossJoin(broadcast(pooled))
      .withColumn("__y_adj",
        y - col("__theta") * (x - col("__x_mean")))
    val byVariant = adjusted
      .groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n_units"),
        avg(y).as("__mean_y"), variance(y).as("__var_y"),
        avg(col("__y_adj")).as("__mean_adj"),
        variance(col("__y_adj")).as("__var_adj"),
        first(col("__theta")).as("__theta"))
    // Welch t on the adjusted means: 2-row self-aggregate, driver-free.
    // Zero pooled standard error (the covariate explains the outcome
    // exactly) leaves t undefined — null, not a division error
    val t = {
      // sum() SKIPS nulls: var_samp of a single-unit variant is null, and
      // silently dropping that term would report a confident t built from
      // only the other variant's variance — strict null propagation via
      // a null-sensitive per-term sum keeps t null instead
      val se = sqrt(sum(when(col("__var_adj").isNull, lit(null))
        .otherwise(col("__var_adj") / col("n_units"))) +
        when(max(col("__var_adj").isNull.cast("int")) === 1, lit(null))
          .otherwise(lit(0d)))
      val diff =
        max(struct(col("variant"), col("__mean_adj"))).getField("__mean_adj") -
        min(struct(col("variant"), col("__mean_adj"))).getField("__mean_adj")
      // the documented contract is exactly two variants; with 3+ the
      // max-mean minus min-mean Welch t would silently pool var/n over
      // ALL groups — a statistically meaningless number. Enforce inside
      // the same 2-row aggregate (no extra driver job): raise, don't pool
      byVariant.agg(
        when(count(lit(1)) =!= 2, raise_error(concat(
            lit(s"cupedAbTest: '$variantCol' must have exactly 2 distinct " +
              "values, got "), count(lit(1)).cast("string"))))
          .otherwise(when(se === 0d, lit(null)).otherwise(diff / se))
          .as("__t_cuped"))
    }
    byVariant.crossJoin(broadcast(t))
      .select(col("variant"), col("n_units"),
        round(col("__mean_y"), 6).as("mean_y"),
        round(col("__mean_adj"), 6).as("mean_cuped"),
        round(col("__var_y"), 6).as("var_y"),
        round(col("__var_adj"), 6).as("var_cuped"),
        round(col("__theta"), 6).as("theta"),
        round(when(col("__var_y") === 0d, lit(null))
          .otherwise((lit(1.0) - col("__var_adj") / col("__var_y")) * 100), 4)
          .as("var_reduction_pct"),
        round(col("__t_cuped"), 4).as("t_cuped"))
      .orderBy("variant")
  }
}
