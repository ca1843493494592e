package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def sky(pts: Seq[(Long, Long)], parts: Int = 3): Set[(Long, Long)] =
    Skyline.skyline2D(
        spark.createDataset(pts).toDF("x", "y").repartition(parts),
        "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Brute-force dominance check — the oracle definition. */
  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { p =>
      !pts.exists(q => q._1 >= p._1 && q._2 >= p._2 &&
        (q._1 > p._1 || q._2 > p._2))
    }.toSet

  test("simple frontier: dominated points drop, frontier survives") {
    val pts = Seq((1L, 9L), (3L, 7L), (5L, 5L), (2L, 2L), (4L, 4L), (5L, 4L))
    assert(sky(pts) == Set((1L, 9L), (3L, 7L), (5L, 5L)))
  }

  test("exact duplicates are mutually non-dominating: all survive") {
    val pts = Seq((3L, 3L), (3L, 3L), (1L, 5L))
    val out = Skyline.skyline2D(
      spark.createDataset(pts).toDF("x", "y").repartition(2), "x", "y")
    // both (3,3) copies and (1,5) are in the skyline
    assert(out.count() == 3)
  }

  test("ties on one axis: same x, only max y survives; same y, only max x") {
    val pts = Seq((3L, 9L), (3L, 5L), (7L, 2L), (5L, 2L))
    assert(sky(pts) == Set((3L, 9L), (7L, 2L)))
  }

  test("null-axis rows pass through (SQL dominance: never dominated, never dominating)") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 9L), (null, 99L), (99L, null), (5L, 5L), (2L, 2L))
      .toDF("x", "y")
    val out = Skyline.skyline2D(df, "x", "y").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    // (2,2) is dominated; the null-axis rows survive exactly as the
    // NOT EXISTS oracle would keep them, and (99, null) does NOT
    // dominate (5,5) despite its large x
    assert(out == Set(
      (Some(1L), Some(9L)), (Some(5L), Some(5L)),
      (None, Some(99L)), (Some(99L), None)))
  }

  test("extreme Long values: no negation overflow, no sentinel collision") {
    val pts = Seq(
      (Long.MinValue, 5L),  // min x must sort as SMALLEST x, not largest
      (1L, 4L),
      (2L, Long.MinValue),  // a real y equal to the old sentinel must be keepable
      (Long.MaxValue, Long.MinValue))
    assert(sky(pts) == brute(pts))
    // (2, MinValue) is dominated by (MaxValue, MinValue); the rest are
    // pairwise non-dominating
    assert(sky(pts) == Set(
      (Long.MinValue, 5L), (1L, 4L), (Long.MaxValue, Long.MinValue)))
    // a lone row whose y is Long.MinValue is still a skyline of itself
    assert(sky(Seq((7L, Long.MinValue))) == Set((7L, Long.MinValue)))
  }

  test("randomized equivalence vs brute-force dominance, across partitionings") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val n = 50 + rnd.nextInt(150)
      // small value range forces x-ties and exact duplicates
      val pts = Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      val parts = 1 + rnd.nextInt(6)
      assert(sky(pts, parts) == brute(pts), s"trial $trial parts=$parts")
    }
  }

  test("non-axis columns ride along unchanged") {
    val df = Seq(("a", 1L, 9L), ("b", 5L, 5L), ("c", 2L, 2L))
      .toDF("id", "x", "y")
    val out = Skyline.skyline2D(df, "x", "y")
      .select("id").as[String].collect().toSet
    assert(out == Set("a", "b"))
  }

  test("anti-correlated 1e5 rows: exact full frontier, bounded per-task materialization") {
    // fully anti-correlated axes — NOTHING is dominated, so phase 1 prunes
    // zero rows and the old repartition(1) finish would have materialized
    // all 100k candidates in one task. The grid finish must keep every
    // task's in-memory slice bounded by ~candidates/buckets.
    val n = 100000L
    val df = spark.range(n)
      .select(col("id").as("x"), (lit(n) - col("id")).as("y"))
      .repartition(16)
    Skyline.probeMaxTaskRows.set(0L)
    try {
      val out = Skyline.skyline2D(df, "x", "y", buckets = 64)
      assert(out.rdd.getNumPartitions > 1,
        "grid finish must not collapse to a single partition")
      assert(out.count() === n) // every point is on the frontier
      val maxTask = Skyline.probeMaxTaskRows.get()
      // phase 1: ~n/16 = 6250 per task; finish: ~n/64 per bucket, a few
      // buckets per hash partition — far below the full candidate set
      assert(maxTask <= 20000L,
        s"a task materialized $maxTask rows — the finish is not bounded")
    } finally Skyline.probeMaxTaskRows.set(-1L)
  }

  test("randomized equivalence across bucket counts (grid boundaries move, result never does)") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4; buckets <- Seq(2, 3, 8, 64)) {
      val n = 100 + rnd.nextInt(300)
      val pts = Seq.fill(n)((rnd.nextInt(40).toLong - 20, rnd.nextInt(40).toLong - 20))
      val out = Skyline.skyline2D(
          spark.createDataset(pts).toDF("x", "y").repartition(1 + rnd.nextInt(5)),
          "x", "y", buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == brute(pts), s"trial $trial buckets=$buckets")
    }
  }

  test("grid prefilter correctness under heavy x-ties and mixed dominance") {
    val rnd = new scala.util.Random(11)
    // few distinct x values force cut-point ties: equal x must never
    // straddle buckets, and prefix-max pruning must stay exact
    val pts = Seq.fill(2000)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    assert(sky(pts, parts = 8) == brute(pts))
    // buckets > distinct candidates: most buckets empty
    val tiny = Seq((1L, 9L), (3L, 7L), (2L, 2L))
    val out = Skyline.skyline2D(
      spark.createDataset(tiny).toDF("x", "y"), "x", "y", buckets = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 9L), (3L, 7L)))
  }

  test("non-bigint axes are rejected loudly") {
    val df = Seq((1, 2)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Skyline.skyline2D(df, "x", "y")
    }
    assert(e.getMessage.contains("bigint"))
  }
}
