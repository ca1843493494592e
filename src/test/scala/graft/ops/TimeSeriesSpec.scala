package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TimeSeriesSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: active Jan 1, 2, 5 (gaps 3-4); user 2: single day (no gaps)
  private lazy val events: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 50L),
      (1L, ts("2024-01-02 09:00:00"), 70L),
      (1L, ts("2024-01-05 08:00:00"), 30L),
      (2L, ts("2024-01-03 12:00:00"), 999L)
    ).toDF("user_id", "ts", "cents")
  }

  test("dailyLocf fills gaps and carries the metric forward") {
    val got = TimeSeries.dailyLocf(events, "user_id", "ts", sum(col("cents")))
      .orderBy("user_id", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01", 2L, 150L),
      (1L, "2024-01-02", 1L, 70L),
      (1L, "2024-01-03", -1L, 70L), // gap: LOCF from Jan 2
      (1L, "2024-01-04", -1L, 70L), // gap: still Jan 2's value
      (1L, "2024-01-05", 1L, 30L),
      (2L, "2024-01-03", 1L, 999L)
    ))
  }

  test("grid is exactly span-bounded: no days before first or after last") {
    val days = TimeSeries.dailyLocf(events, "user_id", "ts", sum(col("cents")))
      .groupBy("user_id").agg(count(lit(1)).as("n"), min("day").as("d0"), max("day").as("d1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.get(2).toString, r.get(3).toString)).toMap
    assert(days(1L) === ((5L, "2024-01-01", "2024-01-05")))
    assert(days(2L) === ((1L, "2024-01-03", "2024-01-03")))
  }

  test("metric_locf is never null (first grid day is observed)") {
    assert(TimeSeries.dailyLocf(events, "user_id", "ts", sum(col("cents")))
      .filter(col("metric_locf").isNull).count() === 0L)
  }

  test("randomized: grid and LOCF match an independent driver-side replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val base = java.time.LocalDate.of(2024, 2, 1)
    val raw = (1 to 400).map { _ =>
      val user = rnd.between(1L, 9L)
      val dt = base.plusDays(rnd.between(0, 40)).atTime(rnd.between(0, 24), 0)
      (user, Timestamp.valueOf(dt), rnd.between(1L, 500L))
    }
    val got = TimeSeries.dailyLocf(raw.toDF("user_id", "ts", "cents"),
        "user_id", "ts", sum(col("cents")))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        // columns: (user_id, day, n, metric, metric_locf)
        (if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))).toMap
    // driver-side reference: group, span, fill, carry forward
    val daily = raw.groupBy(e => (e._1, e._2.toLocalDateTime.toLocalDate))
      .map { case ((u, d), es) => (u, d) -> es.map(_._3).sum }
    val byUser = daily.keys.groupBy(_._1)
    val expected = byUser.flatMap { case (u, ks) =>
      val d0 = ks.map(_._2).min
      val d1 = ks.map(_._2).max
      var carry = 0L
      Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).map { d =>
        val obs = daily.get((u, d))
        obs.foreach(carry = _)
        (u, d.toString) -> ((obs.map(_ => daily((u, d))), carry))
      }.toSeq
    }
    assert(got.size === expected.size)
    expected.foreach { case (k, (obs, locf)) =>
      val (gotObs, gotLocf) = got(k)
      assert(gotObs.map(identity) === obs, s"observed metric at $k")
      assert(gotLocf === locf, s"locf at $k")
    }
  }
}
