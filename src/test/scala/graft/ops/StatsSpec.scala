package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StatsSpec extends SparkTestBase {

  test("winsorize clips to exact per-group quantiles and flags the clipped rows") {
    import spark.implicits._
    // group a: values 0..10 — p0.1 = 1.0, p0.9 = 9.0 (integral positions)
    val df = ((0 to 10).map(i => ("a", i.toDouble)) :+ (("b", 100.0)))
      .toDF("g", "v")
    val out = Stats.winsorize(df, "v", Seq("g"), 0.1, 0.9)
      .filter(col("g") === "a")
      .select("v", "v_clipped", "clipped_low", "clipped_high")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.head === ((0.0, 1.0, true, false)))
    assert(out.last === ((10.0, 9.0, false, true)))
    assert(out(5) === ((5.0, 5.0, false, false)))
    // boundary values are inside the range: not flagged
    assert(out(1) === ((1.0, 1.0, false, false)))
    assert(out(9) === ((9.0, 9.0, false, false)))
    // single-value group: lo = hi = the value, nothing clipped
    val b = Stats.winsorize(df, "v", Seq("g"), 0.1, 0.9)
      .filter(col("g") === "b").select("v_clipped", "clipped_low", "clipped_high")
      .collect().head
    assert((b.getDouble(0), b.getBoolean(1), b.getBoolean(2)) === ((100.0, false, false)))
  }

  test("madOutliers flags by robust z; constant groups and nulls are never outliers") {
    import spark.implicits._
    val df = (Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", Some(100.0)),
      ("b", Some(5.0)), ("b", Some(5.0)), ("b", Some(5.0)),
      ("a", Option.empty[Double]))).toDF("g", "v")
    val out = Stats.madOutliers(df, "v", Seq("g"), k = 3.0)
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getBoolean(r.fieldIndex("is_outlier")))).toSeq
    // group a: median 2.5... percentile(0.5) of [1,2,3,4,100] = 3.0
    val aOut = out.filter(x => x._1 == "a" && x._3).map(_._2)
    assert(aOut === Seq(Some(100.0))) // only the planted outlier
    // constant group: mad 0 -> nothing flagged
    assert(out.filter(_._1 == "b").forall(!_._3))
    // null value: robust_z null, not an outlier
    assert(out.exists(x => x._1 == "a" && x._2.isEmpty && !x._3))
  }

  test("madOutliers keeps null-group rows, flagged against the null group's own stats") {
    import spark.implicits._
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None, 10.0), (None, 11.0), (None, 12.0), (None, 13.0), (None, 500.0))
      .toDF("g", "v")
    val out = Stats.madOutliers(df, "v", Seq("g"), k = 3.0).collect()
    assert(out.length === 8) // nothing silently dropped by the stat joins
    val nullGroup = out.filter(_.isNullAt(0))
      .map(r => r.getDouble(1) -> r.getBoolean(r.fieldIndex("is_outlier"))).toMap
    assert(nullGroup(500.0)) // flagged within the null group
    assert(!nullGroup(10.0) && !nullGroup(13.0))
  }

  test("winsorize leaves null values null and unflagged") {
    import spark.implicits._
    val df = (Seq.tabulate(10)(i => ("a", Some(i.toDouble))) :+ (("a", Option.empty[Double])))
      .toDF("g", "v")
    val out = Stats.winsorize(df, "v", Seq("g"), 0.1, 0.9)
      .filter(col("v").isNull)
      .select("v_clipped", "clipped_low", "clipped_high").collect().head
    assert(out.isNullAt(0)) // NOT clamped to the low bound
    assert(!out.getBoolean(1) && !out.getBoolean(2))
  }

  test("populationStability: zero on identical slices, large and finite under full shift") {
    import spark.implicits._
    val base = (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Stats.populationStability(base, base, "v", buckets = 10)
      .select("psi_term").as[Double].collect()
    assert(same.length === 10)
    assert(same.forall(_ === 0.0)) // p_i == q_i exactly -> every term 0
    // current shifted completely out of the reference range: all mass in
    // the top bucket; terms stay finite thanks to Laplace smoothing
    val shifted = (0 until 1000).map(i => 1000.0 + i).toDF("v")
    val drift = Stats.populationStability(base, shifted, "v", buckets = 10)
      .select("bucket", "ref_n", "cur_n", "psi_term").collect()
    assert(drift.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    val total = drift.map(_.getDouble(3)).sum
    assert(total > 1.0, s"full shift must scream (psi=$total)") // >>0.25 action bar
    // every current row landed in the last bucket
    assert(drift.filter(_.getInt(0) == 9).head.getLong(2) === 1000L)
    assert(drift.filter(_.getInt(0) < 9).forall(_.getLong(2) === 0L))
  }

  test("winsorize with no group columns clips against global quantiles") {
    import spark.implicits._
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val out = Stats.winsorize(df, "v", Seq.empty, 0.05, 0.95)
      .agg(sum(when(col("clipped_low"), 1).otherwise(0)).as("lo"),
        sum(when(col("clipped_high"), 1).otherwise(0)).as("hi"),
        max(col("v_clipped")).as("mx"), min(col("v_clipped")).as("mn"))
      .collect().head
    // p05 = 5.0, p95 = 95.0 over 0..100
    assert((out.getLong(0), out.getLong(1)) === ((5L, 5L)))
    assert((out.getDouble(3), out.getDouble(2)) === ((5.0, 95.0)))
  }

  test("cupedAbTest: pre-period covariate strips the between-unit variance; matches a driver-side reference") {
    import spark.implicits._
    // y = 2x + 5*variant + deterministic noise: almost all outcome variance
    // is the pre-period covariate, so CUPED should collapse it and the
    // Welch t should scream while the raw means barely separate
    val units = (0 until 100).map { i =>
      val x = i.toDouble
      val v = i % 2
      val noise = ((i * 7) % 13 - 6) * 0.5
      (v, x, 2.0 * x + 5.0 * v + noise)
    }.toDF("variant", "x_pre", "y_post")
    val got = Stats.cupedAbTest(units, "variant", "y_post", "x_pre")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    assert(got.map(_._1).toSeq === Seq(0, 1))
    val Array(v0, v1) = got
    // driver-side reference (python-checked): theta ≈ slope 2, adjusted
    // variance collapses from ~3.4e3 to ~3.5, t ≈ 13.58 on a true effect 5
    assert(math.abs(v0._7 - 2.002772) < 1e-4, s"theta ${v0._7}")
    assert(math.abs(v0._3 - 97.89) < 1e-6 && math.abs(v1._3 - 105.01) < 1e-6)
    assert(math.abs(v0._4 - 98.891386) < 1e-4 && math.abs(v1._4 - 104.008614) < 1e-4)
    assert(math.abs(v0._6 - 3.347289) < 1e-3 && math.abs(v1._6 - 3.753917) < 1e-3)
    assert(v0._8 > 99.0 && v1._8 > 99.0, "variance reduction must exceed 99%")
    assert(math.abs(v0._9 - 13.5786) < 1e-3, s"t ${v0._9}")
    assert(v0._9 === v1._9, "pooled t repeats on both rows")
    assert(v0._2 === 50L && v1._2 === 50L)
  }

  test("cupedAbTest degenerate inputs: constant covariate -> theta 0; exact fit -> null t, no ANSI error") {
    import spark.implicits._
    // constant x: no covariate information — theta 0, adjustment a no-op
    val constX = (0 until 20).map(i => (i % 2, 5.0, i.toDouble))
      .toDF("variant", "x_pre", "y_post")
    val c = Stats.cupedAbTest(constX, "variant", "y_post", "x_pre").collect()
    assert(c.forall(_.getDouble(6) === 0.0), "theta must be 0 for constant x")
    c.foreach(r => assert(r.getDouble(3) === r.getDouble(2),
      "no-op adjustment must keep the raw mean"))
    // perfect fit: y = 2x exactly — adjusted variance 0, t undefined (null)
    val exact = (0 until 20).map(i => (i % 2, i.toDouble, i * 2.0))
      .toDF("variant", "x_pre", "y_post")
    val e = Stats.cupedAbTest(exact, "variant", "y_post", "x_pre").collect()
    assert(e.forall(_.isNullAt(8)), "zero standard error must yield null t")
    assert(e.forall(_.getDouble(5) === 0.0), "adjusted variance must be 0")
  }

  test("cupedAbTest rejects 3+ variants instead of pooling a meaningless t") {
    import spark.implicits._
    val three = (0 until 30).map(i => (i % 3, i.toDouble, i * 2.0 + (i % 7)))
      .toDF("variant", "x_pre", "y_post")
    val e = intercept[Exception] {
      Stats.cupedAbTest(three, "variant", "y_post", "x_pre").collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("exactly 2 distinct") ||
        Option(e.getCause).exists(_.getMessage.contains("exactly 2 distinct"))),
      s"expected the 2-variant contract error, got: $e")
  }
}
