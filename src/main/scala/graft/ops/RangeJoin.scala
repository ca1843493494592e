package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: match each point row to every interval row whose
 * `[start, end]` contains the point — the "events inside promotion windows"
 * / "reading inside sensor-calibration period" shape. Spark has no
 * built-in range-join operator; the naive formulation is a cross join with
 * a theta filter, which is quadratic and unrunnable at scale.
 *
 * Implementation is the standard BINNING rewrite (the same technique the
 * Databricks range-join optimization and GeoSpark-style spatial joins
 * use): pick a bin width, replicate each interval into every bin it
 * overlaps (`sequence(floor(start/w), floor(end/w))` + explode), key each
 * point by its single bin, equi-join on the bin id, and apply the exact
 * containment predicate after the join. Cost = one hash shuffle of the
 * points + one of the (replicated) intervals, i.e. sort-merge-join shape;
 * the quadratic blowup is gone. Each matching (point, interval) pair
 * meets in EXACTLY one bin — the point's — so no distinct pass is needed.
 *
 * Bin-width trade: replication factor per interval is
 * `len/width + 1`, while the residual-filter selectivity per bin worsens
 * as width grows. Set `binWidth` near the median interval length (the
 * optimum for uniformly-sized intervals); the default guard rejects
 * non-positive widths.
 *
 * Not in the reference (its surface is the versioned-table layer); part
 * of the mandated LLM-pipeline/event extensions alongside [[AsOfJoin]].
 */
object RangeJoin {

  /**
   * Inner point-in-interval join on numeric (castable-to-long-safe
   * double/int/long/date-as-days) columns.
   *
   * Output columns: all of `points`' columns followed by all of
   * `intervals`' columns; the two sides must not share column names.
   *
   * @param points    point-side rows
   * @param intervals interval-side rows with `[startCol, endCol]` bounds
   *                  (inclusive both ends; rows with start > end match
   *                  nothing and are dropped by the bin generator)
   * @param pointCol  numeric column on `points`
   * @param startCol  numeric lower bound on `intervals`
   * @param endCol    numeric upper bound on `intervals`
   * @param binWidth  bin width in the shared numeric domain
   */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals must not share column names: ${overlap.mkString(", ")}")
    val w = lit(binWidth)
    val ivals = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / w).cast("long"),
        floor(col(endCol) / w).cast("long"))))
    val pts = points.withColumn("__bin",
      floor(col(pointCol) / w).cast("long"))
    pts.join(ivals, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
