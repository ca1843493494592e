package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClassifierSpec extends SparkTestBase {

  test("logisticFit separates a linearly separable set") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // y = 1 iff x1 + x2 > 0, with a clear margin
    val rows = (1 to 400).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val m = x1 + x2
      if (math.abs(m) < 0.5) (0.0, x1, x2, false)
      else (if (m > 0) 1.0 else 0.0, x1, x2, true)
    }.filter(_._4).map(t => (t._1, t._2, t._3))
    val df = rows.toDF("y", "x1", "x2")
    val w = Classifier.logisticFit(df, Seq("x1", "x2"), "y",
      iters = 60, lr = 2.0)
    // both feature weights positive and dominant over the intercept
    assert(w(1) > 0.5 && w(2) > 0.5, s"weights ${w.toSeq}")
    // every training point with the clear margin classifies correctly
    val miss = rows.count { case (y, x1, x2) =>
      val p = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2)))
      (p >= 0.5) != (y == 1.0)
    }
    assert(miss.toDouble / rows.size < 0.02, s"$miss / ${rows.size} missed")
  }

  test("logisticFit equals an independent driver-side GD reference exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { _ =>
      val x1 = rnd.nextDouble() * 4 - 2; val x2 = rnd.nextDouble()
      val y = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-(x1 - x2)))) 1.0
        else 0.0
      (y, x1, x2)
    }
    val got = Classifier.logisticFit(rows.toDF("y", "x1", "x2"),
      Seq("x1", "x2"), "y", iters = 3, lr = 1.0, roundDp = 6)

    def q6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = Array(0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      var g0 = 0.0; var g1 = 0.0; var g2 = 0.0
      rows.foreach { case (y, x1, x2) =>
        val e = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2))) - y
        g0 += e; g1 += e * x1; g2 += e * x2
      }
      val n = rows.size
      w(0) = q6(w(0) - g0 / n); w(1) = q6(w(1) - g1 / n)
      w(2) = q6(w(2) - g2 / n)
    }
    // 6dp quantization after every step absorbs partial-sum order ulps:
    // trajectories are identical, not merely close
    assert(got.toSeq === w.toSeq)
  }

  test("logisticFit drops rows with null label or features") {
    import spark.implicits._
    val clean = Seq((1.0, 1.0, 0.5), (0.0, -1.0, 0.2), (1.0, 2.0, 0.9),
      (0.0, -2.0, 0.1))
    val dirty = clean.map { case (y, a, b) =>
      (Option(y), Option(a), Option(b)) } ++
      Seq((None, Some(1.0), Some(1.0)), (Some(1.0), None, Some(1.0)),
        (Some(0.0), Some(1.0), None))
    val wClean = Classifier.logisticFit(clean.toDF("y", "x1", "x2"),
      Seq("x1", "x2"), "y", iters = 2)
    val wDirty = Classifier.logisticFit(dirty.toDF("y", "x1", "x2"),
      Seq("x1", "x2"), "y", iters = 2)
    assert(wClean.toSeq === wDirty.toSeq)
  }

  test("logisticFit validates arguments") {
    import spark.implicits._
    val df = Seq((1.0, 1.0)).toDF("y", "x1")
    intercept[IllegalArgumentException] {
      Classifier.logisticFit(df, Seq.empty, "y")
    }
    intercept[IllegalArgumentException] {
      Classifier.logisticFit(df, Seq("x1"), "y", iters = 0)
    }
  }
}
