package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the closest right row with the
 * same key on the required side of the left row's time — backward
 * (most recent right with time <= left.time, the classic point-in-time
 * join) or forward (earliest right with time >= left.time, the
 * "next event" join). An optional tolerance bounds the allowed staleness
 * (backward) / lookahead (forward), the pandas `merge_asof`
 * direction/tolerance surface. Spark has no built-in operator for any of
 * these.
 *
 * Implementation is the union + keyed-window technique, NOT a range cross
 * join: tag both sides, union on (key, time), and carry the nearest right
 * payload across with `last(..., ignoreNulls=true)` over an unbounded
 * preceding window (backward) or `first(...)` over an unbounded following
 * window (forward). Cost = one shuffle on the key + a per-key sort — the
 * same shape as a sort-merge join, and it scales linearly with input
 * instead of quadratically like an inequality-join. Skewed keys are
 * handled by AQE the same way any keyed window is (salting hook left to
 * callers with pathological keys). The tolerance check is a narrow
 * post-window projection: the matched right TIME rides along as one extra
 * carried column and payloads are nulled when it falls outside the bound
 * — no extra shuffle.
 *
 * Ties (right.time == left.time) match in both directions: rights order
 * before lefts at the same instant in the backward frame and inside the
 * following frame in the forward one.  Right side should be unique per
 * (key, time); pre-dedup with [[dedupRightPerInstant]] when it isn't.
 */
object AsOfJoin {

  /** Keep one right row per (key, time): the one with the highest tieBreak
    * column — makes as-of results deterministic for non-unique rights. */
  def dedupRightPerInstant(right: DataFrame, keyCol: String, timeCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(timeCol)).orderBy(col(tieBreak).desc)
    right.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * Backward (point-in-time) as-of join.
   *
   * @param left      event-side rows
   * @param right     state-side rows (unique per key+time)
   * @param leftKey   join key column name on the left
   * @param rightKey  join key column name on the right
   * @param leftTime  left event-time column
   * @param rightTime right event-time column
   * @param payload   right columns to attach (null when no match yet)
   * @param tolerance max allowed `left.time - right.time`, in the time
   *                  column's double-cast units (SECONDS for timestamps,
   *                  native units for numerics); None = unbounded
   */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tolerance: Option[Double] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      tolerance, forward = false)

  /**
   * Forward as-of join: earliest right row with time >= left.time.
   * Same parameters as [[asofBackward]]; `tolerance` bounds
   * `right.time - left.time`.
   */
  def asofForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tolerance: Option[Double] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      tolerance, forward = true)

  private def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tolerance: Option[Double],
      forward: Boolean): DataFrame = {
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val leftCols = left.columns.toSeq
    // at the same instant the RIGHT row must fall inside the left row's
    // frame: before it in the backward (preceding) frame, after it in the
    // forward (following) frame
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
    // ALL carried values (matched right time + every payload) ride in ONE
    // struct: the struct itself is non-null for every right row, so the
    // ignoreNulls carry always lands on the NEAREST right row — a null
    // payload VALUE stays null rather than falling through to a farther
    // row, and all payload columns come from the same matched row. The
    // matched-time field exists only when a tolerance needs it (date
    // right-times have no double cast and need none without one).
    val rt: Column =
      if (tolerance.isDefined) col(rightTime).cast("double")
      else lit(null).cast("double")
    val r = right
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(rightSide).as("__side"),
        struct((rt.as("__rt") +: payload.map(p => col(p).as(s"__p_$p"))): _*)
          .as("__pkg"))
    val pkgType = r.schema("__pkg").dataType
    // align schemas for the union
    val lAligned = l.select((Seq(col("__k"), col("__t"), col("__side"),
      lit(null).cast(pkgType).as("__pkg")) ++
      leftCols.map(col)): _*)
    val rAligned = r.select((Seq(col("__k"), col("__t"), col("__side"), col("__pkg")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val base = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried: Column =
      if (forward) first(col("__pkg"), ignoreNulls = true).over(w)
      else last(col("__pkg"), ignoreNulls = true).over(w)
    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(t) =>
        val matchedT = carried.getField("__rt")
        val diff =
          if (forward) matchedT - col("__t").cast("double")
          else col("__t").cast("double") - matchedT
        diff <= t
    }
    lAligned.unionByName(rAligned)
      .select((leftCols.map(col) ++ Seq(col("__side")) ++
        payload.map(p => when(withinTol, carried.getField(s"__p_$p"))
          .otherwise(lit(null)).as(p))): _*)
      .filter(col("__side") === leftSide)
      .drop("__side")
  }
}
