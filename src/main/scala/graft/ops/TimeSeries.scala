package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Regular-grid time-series repair over event streams: aggregate to a daily
 * grid per key, materialize the missing days, and carry the last observed
 * value forward (LOCF — the standard gap-fill for metric dashboards and
 * feature pipelines that expect one row per key per day).
 *
 * Scale shape: the raw events shuffle exactly ONCE — into the (key, day)
 * daily aggregate; every later stage (span bounds, grid join, LOCF
 * window) operates on that aggregate, whose size is bounded by
 * keys × active days, typically orders of magnitude below the event
 * count. Those stages do re-exchange the small grid (key vs (key, day)
 * partitionings differ), which is the right trade — the alternative of
 * pre-partitioning everything by key alone would forgo map-side partial
 * aggregation on the wide input. Grid materialization is `sequence()` +
 * `explode` on the span row — one output row per (key, day), never a
 * cross join against a calendar table.
 */
object TimeSeries {

  /**
   * One row per `keyCol` per day between that key's first and last active
   * day: `(keyCol, day, n, metric, metric_locf)` where `n`/`metric` are
   * null on gap days and `metric_locf` carries the last observed `metric`
   * forward (never null — day one is observed by construction).
   *
   * @param events  raw rows
   * @param keyCol  grid key (user, device, document source, …)
   * @param tsCol   event-time timestamp column
   * @param metric  per-day aggregate to fill (applied inside the daily
   *                groupBy, e.g. `sum(value_cents)`)
   */
  def dailyLocf(events: DataFrame, keyCol: String, tsCol: String,
      metric: Column): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).cast("date").as("day"))
      .agg(count(lit(1)).as("n"), metric.as("metric"))
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val allDays = spans.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe on the key: a NULL-key group has its own daily aggregate
    // and span, and an equi-join would never match its grid rows back —
    // every observed day of the null key would read as a gap
    val aliased = daily.select(col(keyCol).as("__k"), col("day").as("__day"),
      col("n"), col("metric"))
    allDays.join(aliased,
        allDays(keyCol) <=> aliased("__k") && allDays("day") === aliased("__day"),
        "left")
      .drop("__k", "__day")
      .withColumn("metric_locf", last(col("metric"), ignoreNulls = true).over(w))
  }
}
