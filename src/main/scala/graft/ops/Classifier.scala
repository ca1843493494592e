package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed training of a linear quality classifier — batch-gradient
 * logistic regression, the model behind most "quality score" gates in
 * public training-data pipelines (e.g. the CCNet / GPT-3 Wikipedia-vs-web
 * linear classifiers described in Brown et al. 2020 §A and Wenzek et al.
 * 2020). Reference scope: the reference engine ships no ML ops; this is
 * part of the mandated LLM-pipeline surface.
 *
 * Training shape (the `kmeansTrain` pattern): each full-batch gradient
 * step is ONE distributed aggregate over the feature table — `d+1`
 * partial sums with map-side combine, no shuffle of the rows themselves —
 * and only the `d+1` gradient scalars ever reach the driver, which folds
 * them into the weight vector and ships the new weights back as plan
 * literals. Rank state on the driver is O(d), never O(rows), so the loop
 * scales to any corpus; iteration count is fixed so runs are replayable.
 *
 * Weights are quantized (`roundDp` decimals, default 6) after every
 * step: cross-engine float drift in the gradient sums is ~1e-12 relative,
 * so quantized training trajectories are bit-identical between Spark and
 * an independent replay (the DuckDB oracle unrolls the same steps), while
 * 6 decimals lose nothing a quality gate could notice.
 */
object Classifier {

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /**
   * Full-batch gradient-descent logistic fit. Rows with a NULL label or
   * any NULL feature are dropped (they contribute no gradient). Returns
   * the trained weights, intercept first: `w(0) + Σ w(j+1)·x_j`.
   */
  def logisticFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 3, lr: Double = 1.0, roundDp: Int = 6): Array[Double] =
    logisticFitCounted(df, featureCols, labelCol, iters, lr, roundDp)._1

  /** [[logisticFit]] plus the number of rows actually trained on, counted
    * off the checkpointed feature projection — free relative to a fresh
    * re-derivation scan, and structurally in sync with the fit. */
  def logisticFitCounted(df: DataFrame, featureCols: Seq[String],
      labelCol: String, iters: Int = 3, lr: Double = 1.0,
      roundDp: Int = 6): (Array[Double], Long) = {
    require(featureCols.nonEmpty, "at least one feature column required")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val d = featureCols.length
    // project once, drop incomplete rows, and pin: every iteration scans
    // this projection — without the pin the lazy lineage would re-run the
    // (possibly expensive) feature derivation `iters` times
    val data = df.select(
        (col(labelCol).cast("double").as("__y") +:
          featureCols.zipWithIndex.map { case (c, j) =>
            col(c).cast("double").as(s"__x$j") }): _*)
      .na.drop()
      .localCheckpoint()

    val w = Array.fill(d + 1)(0.0)
    def quantize(v: Double): Double =
      BigDecimal(v).setScale(roundDp, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    for (_ <- 1 to iters) {
      val z = (0 until d).foldLeft(lit(w(0)): Column) { (acc, j) =>
        acc + lit(w(j + 1)) * col(s"__x$j")
      }
      val err = sigmoid(z) - col("__y")
      val gradAggs = avg(err).as("__g0") +:
        (0 until d).map(j => avg(err * col(s"__x$j")).as(s"__g${j + 1}"))
      val g = data.agg(gradAggs.head, gradAggs.tail: _*).collect()(0)
      for (j <- 0 to d) w(j) = quantize(w(j) - lr * g.getDouble(j))
    }
    (w, data.count())
  }
}
