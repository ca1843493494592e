package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over the `events` table: a session closes after
 * `gapMs` of inactivity per user. Classic lag + cumulative-sum window —
 * one shuffle on user_id, then linear window work per user; scales by
 * user-key partitioning (skewed power users would get salted in a real
 * deployment; AQE skew handling covers the join side).
 *
 * Millisecond arithmetic (`unix_millis`) keeps the semantics identical to
 * the DuckDB oracle's `epoch_ms` regardless of parquet timestamp precision.
 */
object Sessionize {

  /** Assign `session_id` (per-user ordinal) to each event. */
  def sessionize(events: DataFrame, gapMs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      tieBreak: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val ms = unix_millis(col(tsCol))
    events
      .withColumn("__prev_ms", lag(ms, 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ms").isNull || (ms - col("__prev_ms")) > gapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ms", "__new_session")
  }

  /**
   * Drop consecutive duplicate events per key — run-length compression
   * of an event stream (repeated sensor readings, redundant state
   * pings): an event survives iff any of `dedupCols` differs from the
   * previous event of the SAME key in `tsCol` order (the first event of
   * each key always survives). Null-safe comparison (`<=>`), so
   * null-to-null counts as equal and null-to-value as a change.
   *
   * Scale shape: one user-keyed shuffle (the `lag` window — the same
   * single exchange every per-user op here pays) and a narrow filter;
   * output order and all columns preserved. At 100 TB this is the
   * standard pre-aggregation compressor: it runs BEFORE sessionize /
   * rolling stats so the expensive windows see runs, not repeats.
   */
  def dedupConsecutive(events: DataFrame, dedupCols: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      tieBreak: String = "event_id"): DataFrame = {
    require(dedupCols.nonEmpty, "at least one dedup column required")
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val changed = dedupCols.map(c =>
      !(col(c) <=> lag(col(c), 1).over(byUser)))
    val isFirst = row_number().over(byUser) === 1
    events
      .withColumn("__keep", isFirst || changed.reduce(_ || _))
      .filter(col("__keep"))
      .drop("__keep")
  }

  /**
   * First-order Markov transition matrix over per-user event sequences —
   * the "what happens after X" behavioral-analytics primitive (journey
   * mining, anomaly baselines, next-event prediction features): for every
   * ordered pair of consecutive events of the same user, count
   * `(prev_type, next_type)` and normalize by the `prev_type` row total.
   *
   * Scale shape: one user-keyed shuffle (the `lag` window) collapses
   * map-side into a |types|²-row aggregate; the row normalization is a
   * window over that tiny aggregate, never the corpus.
   */
  def transitionMatrix(events: DataFrame,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", tieBreak: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val counts = events
      .withColumn("__prev", lag(col(typeCol), 1).over(byUser))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    counts.withColumn("p", round(col("n") / sum(col("n")).over(byPrev), 4))
  }

  /**
   * Top session journeys — the "most common user paths" product-analytics
   * rollup: sessionize, take each session's first `pathLen` event types
   * in time order, and count identical paths, returning the `topN` most
   * frequent (ties broken by path asc — deterministic cut).
   *
   * Scale shape: the sessionizer's one user-keyed shuffle, a per-session
   * aggregate whose `collect_list` is bounded by session length (and the
   * path by `pathLen`), then a path-keyed count that collapses map-side
   * to the distinct-path dictionary before one small exchange. The top-N
   * sorts only that dictionary.
   */
  def topPaths(events: DataFrame, gapMs: Long, pathLen: Int, topN: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", tieBreak: String = "event_id"): DataFrame = {
    require(pathLen >= 1, s"pathLen must be positive, got $pathLen")
    require(topN >= 1, s"topN must be positive, got $topN")
    val sess = sessionize(events, gapMs, userCol, tsCol, tieBreak)
    val paths = sess
      .groupBy(col(userCol), col("session_id"))
      .agg(array_join(
        transform(
          slice(sort_array(collect_list(struct(
            col(tsCol), col(tieBreak), col(typeCol).as("__ty")))), 1, pathLen),
          e => e.getField("__ty")),
        " > ").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topN)
  }

  /** Per-session rollup: events, span, value sum. */
  def sessionStats(events: DataFrame, gapMs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val s = sessionize(events, gapMs, userCol, tsCol)
    // total_value only when the value column exists: the per-user rollup
    // (userSessionSummary) never reads it, and a value-less events table
    // must not fail analysis over an aggregate nothing consumes
    val base = Seq(
      count(lit(1)).as("n_events"),
      (max(unix_millis(col(tsCol))) - min(unix_millis(col(tsCol)))).as("duration_ms"))
    val aggs =
      if (events.columns.contains(valueCol))
        base :+ round(sum(col(valueCol)), 2).as("total_value")
      else base
    s.groupBy(col(userCol), col("session_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Spark-native variant: `session_window` (gap-merging event-time windows)
   * — same session boundaries as [[sessionize]] for a given gap, usable in
   * both batch and streaming with watermarks. One aggregation, no explicit
   * lag/cumsum plumbing.
   */
  def sessionWindowStats(events: DataFrame, gap: String,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("total_value"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Per-user rollup across sessions. */
  def userSessionSummary(events: DataFrame, gapMs: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val s = sessionStats(events, gapMs, userCol, tsCol)
    s.groupBy(col(userCol))
      .agg(
        max(col("session_id")).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"),
        max(col("duration_ms")).as("max_session_ms"))
  }

  /**
   * Ordered-funnel analysis: for each user, build the time-ordered event
   * path and count users whose path contains each funnel prefix as an
   * ordered (not necessarily adjacent) subsequence — `Seq("view", "click",
   * "purchase")` counts view-reachers, view→click-reachers and full
   * converters. One shuffle (the per-user collect). The subsequence test
   * is a regex over the comma-wrapped path string whose steps match only
   * complete comma-delimited tokens (`,step,` with `([^,]*,)*` between
   * steps), so event types that merely CONTAIN a step name (e.g.
   * 'preview' vs 'view') never count, and step names are regex-quoted.
   * Deterministic given a unique `tieBreak`.
   *
   * The comma is the path delimiter, so neither step names nor the
   * `typeCol` values may contain one — a comma inside an event type would
   * split it into two phantom tokens and silently mis-count. Steps are
   * checked eagerly here; event-type values are the caller's contract.
   */
  def funnelCounts(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      tieBreak: String = "event_id"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.forall(!_.contains(",")),
      s"step names must not contain the ',' path delimiter: " +
        steps.filter(_.contains(",")).mkString("[", ", ", "]"))
    // array_sort on (ts, tieBreak, type) structs orders by fields in
    // declaration order — the same (ts, tie) ordering the oracle's
    // ORDER BY inside string_agg applies
    val paths = events
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(
        struct(col(tsCol), col(tieBreak), col(typeCol)))).as("__seq"))
      .withColumn("__path",
        concat(lit(","),
          // getField, not a string-interpolated expr: a hyphenated or
          // reserved-word typeCol would otherwise parse as arithmetic
          concat_ws(",", transform(col("__seq"), x => x.getField(typeCol))),
          lit(",")))
    val stepCols = steps.inits.toSeq.reverse.drop(1).map { prefix =>
      // ,s1,([^,]*,)*s2,… — boundary-anchored ordered-subsequence match
      // over the wrapped path; avoids lookaround so the same pattern runs
      // under both Java regex (Spark) and RE2 (the DuckDB oracle)
      val pattern = prefix.map(java.util.regex.Pattern.quote)
        .mkString(",", ",([^,]*,)*", ",")
      sum(when(col("__path").rlike(pattern), 1).otherwise(0))
        .as(s"users_${prefix.mkString("_")}")
    }
    paths.agg(count(lit(1)).as("n_users"), stepCols: _*)
  }

  /**
   * Cohort retention: assign each user to the calendar-day cohort of their
   * first event, then count distinct active users per (cohort, day-offset).
   * The classic product-analytics retention triangle.
   *
   * Scale: one shuffle keyed on the user column computes BOTH the cohort
   * min and the distinct activity days (a self-join on user_id would
   * shuffle the events twice); the (cohort, offset) rollup then aggregates
   * the already-distinct user-day pairs.
   */
  def retentionCohorts(events: DataFrame,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val day = to_date(col(tsCol))
    val perUser = events
      .groupBy(col(userCol))
      .agg(min(day).as("cohort"),
        collect_set(day).as("__days"))
    perUser
      .select(col("cohort"),
        explode(col("__days")).as("__day"))
      .withColumn("offset_days", datediff(col("__day"), col("cohort")))
      .groupBy(col("cohort"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }
}
