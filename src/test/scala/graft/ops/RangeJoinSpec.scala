package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  private lazy val points: DataFrame = {
    import spark.implicits._
    Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 30L), (5L, -2L))
      .toDF("p_id", "p")
  }

  private lazy val intervals: DataFrame = {
    import spark.implicits._
    Seq(
      (10L, 0L, 10L),   // catches 5, 10, -2? no: -2 < 0. catches 5, 10
      (11L, 10L, 16L),  // catches 10
      (12L, 18L, 25L),  // catches nothing (17 < 18, 30 > 25)
      (13L, -5L, -1L),  // catches -2 (negative domain)
      (14L, 29L, 29L),  // zero-length, catches nothing (30 != 29)
      (15L, 40L, 35L)   // inverted bounds: matches nothing
    ).toDF("i_id", "lo", "hi")
  }

  private def pairs(binWidth: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth)
      .select("p_id", "i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val expected = Set((1L, 10L), (2L, 10L), (2L, 11L), (5L, 13L))

  test("pointInInterval matches the cross-join ground truth") {
    val truth = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth === expected)
    assert(pairs(binWidth = 7L) === expected)
  }

  test("result is bin-width invariant (each pair meets in exactly one bin)") {
    for (w <- Seq(1L, 2L, 5L, 100L)) assert(pairs(w) === expected, s"width $w")
  }

  test("randomized: binned join equals cross join on arbitrary data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val ps = (1 to 200).map(i => (i.toLong, rnd.between(-50L, 200L))).toDF("p_id", "p")
    val is = (1 to 60).map { i =>
      val lo = rnd.between(-60L, 180L)
      (i.toLong, lo, lo + rnd.between(0L, 40L))
    }.toDF("i_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(ps, is, "p", "lo", "hi", binWidth = 16L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = ps.crossJoin(is)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth)
  }

  test("shared column names are rejected") {
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumnRenamed("p", "lo"),
        intervals, "lo", "lo", "hi", 10L)
    }
    assert(ex.getMessage.contains("share column names"))
  }
}
