package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the most recent right row with the
 * same key whose time is <= the left row's time (classic point-in-time /
 * backward as-of join; Spark has no built-in operator for it).
 *
 * Implementation is the union + keyed-window technique, NOT a range cross
 * join: tag both sides, union on (key, time), and carry the latest right
 * payload forward with `last(..., ignoreNulls=true)` over an unbounded
 * preceding window. Cost = one shuffle on the key + a per-key sort — the
 * same shape as a sort-merge join, and it scales linearly with input
 * instead of quadratically like an inequality-join. Skewed keys are
 * handled by AQE the same way any keyed window is (salting hook left to
 * callers with pathological keys).
 *
 * Ties (right.time == left.time) match, with right rows ordered before
 * left rows at the same instant. Right side should be unique per
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
   * @param left      event-side rows
   * @param right     state-side rows (unique per key+time)
   * @param leftKey   join key column name on the left
   * @param rightKey  join key column name on the right
   * @param leftTime  left event-time column
   * @param rightTime right event-time column
   * @param payload   right columns to attach (null when no match yet)
   */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // events sort after states at the same instant
    val r = right
      .select((Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side")) ++ payload.map(p => col(p).as(s"__p_$p"))): _*)
    // align schemas for the union
    val lAligned = l.select((Seq(col("__k"), col("__t"), col("__side")) ++
      payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")) ++
      leftCols.map(col)): _*)
    val rAligned = r.select((Seq(col("__k"), col("__t"), col("__side")) ++
      payload.map(p => col(s"__p_$p")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .select((leftCols.map(col) ++ Seq(col("__side")) ++
        payload.map(p => last(col(s"__p_$p"), ignoreNulls = true).over(w).as(p))): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
