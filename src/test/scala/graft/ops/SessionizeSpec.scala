package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: two sessions (gap 45 min); user 2: one session
  private lazy val events: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 10:10:00"), 2.0),
      (3L, 1L, ts("2024-01-01 10:55:00"), 3.0), // 45 min gap -> new session
      (4L, 1L, ts("2024-01-01 11:00:00"), 4.0),
      (5L, 2L, ts("2024-01-01 09:00:00"), 5.0),
      (6L, 2L, ts("2024-01-01 09:29:00"), 6.0) // 29 min gap -> same session
    ).toDF("event_id", "user_id", "ts", "value")
  }

  private val gap30m = 30 * 60 * 1000L

  test("sessionize assigns per-user session ordinals at gap boundaries") {
    val s = Sessionize.sessionize(events, gap30m)
      .select("event_id", "session_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) === 1 && s(2L) === 1)
    assert(s(3L) === 2 && s(4L) === 2)
    assert(s(5L) === 1 && s(6L) === 1)
  }

  test("sessionStats aggregates per session") {
    val s = Sessionize.sessionStats(events, gap30m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_ms"), r.getAs[Double]("total_value"))).toMap
    assert(s((1L, 1L)) === ((2L, 600000L, 3.0)))
    assert(s((1L, 2L)) === ((2L, 300000L, 7.0)))
    assert(s((2L, 1L)) === ((2L, 1740000L, 11.0)))
  }

  test("userSessionSummary rolls up across sessions") {
    val s = Sessionize.userSessionSummary(events, gap30m)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"), r.getAs[Long]("max_session_ms"))).toMap
    assert(s(1L) === ((2L, 4L, 600000L)))
    assert(s(2L) === ((1L, 2L, 1740000L)))
  }

  test("native session_window agrees with the lag/cumsum sessionizer") {
    val sw = Sessionize.sessionWindowStats(events, "30 minutes")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_events"))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val ours = Sessionize.sessionStats(events, gap30m)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_events"))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(sw === ours) // same sessions per user (session_window gap is exclusive-boundary like ours)
  }

  test("exact gap equal to threshold stays in the same session") {
    import spark.implicits._
    val e = Seq(
      (1L, 9L, ts("2024-01-01 00:00:00"), 0.0),
      (2L, 9L, ts("2024-01-01 00:30:00"), 0.0)) // exactly 30 min
      .toDF("event_id", "user_id", "ts", "value")
    val n = Sessionize.userSessionSummary(e, gap30m)
      .collect().head.getAs[Long]("n_sessions")
    assert(n === 1) // strictly-greater-than opens a session
  }

  test("funnelCounts: ordered non-adjacent subsequences, per-user") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view -> error -> click -> purchase (full convert, gaps ok)
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "error"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "click"),
      (4L, 1L, ts("2024-01-01 10:03:00"), "purchase"),
      // user 2: click BEFORE view -> reaches view only
      (5L, 2L, ts("2024-01-01 09:00:00"), "click"),
      (6L, 2L, ts("2024-01-01 09:01:00"), "view"),
      // user 3: never views
      (7L, 3L, ts("2024-01-01 08:00:00"), "purchase"),
      // user 4: 'preview' CONTAINS 'view' but is a different event type —
      // must not count as a view, despite click+purchase following
      (8L, 4L, ts("2024-01-01 07:00:00"), "preview"),
      (9L, 4L, ts("2024-01-01 07:01:00"), "click"),
      (10L, 4L, ts("2024-01-01 07:02:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = Sessionize.funnelCounts(ev, Seq("view", "click", "purchase")).collect().head
    assert(r.getLong(0) === 4)                       // n_users
    assert(r.getLong(1) === 2)                       // users_view (1, 2; NOT 4)
    assert(r.getLong(2) === 1)                       // view->click (only 1)
    assert(r.getLong(3) === 1)                       // full funnel (only 1)
    // substring-colliding step names are fine: boundary-anchored matching
    // distinguishes 'view' from 'preview', including adjacent steps
    val r2 = Sessionize.funnelCounts(ev, Seq("preview", "click")).collect().head
    assert(r2.getLong(1) === 1)                      // preview (only 4)
    assert(r2.getLong(2) === 1)                      // preview->click (only 4)
  }

  test("retentionCohorts counts distinct users per cohort and day offset") {
    import spark.implicits._
    val ev = Seq(
      // user 1: first seen day 1, returns day 2 (twice -> still one user-day)
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 20:00:00")),
      // user 2: first seen day 1 only
      (2L, ts("2024-01-01 12:00:00")),
      // user 3: first seen day 2, returns day 4
      (3L, ts("2024-01-02 08:00:00")),
      (3L, ts("2024-01-04 08:00:00"))
    ).toDF("user_id", "ts")
    val r = Sessionize.retentionCohorts(ev)
      .orderBy("cohort", "offset_days")
      .collect()
      .map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2)))
    assert(r.toSeq === Seq(
      ("2024-01-01", 0, 2L), // users 1 and 2 on their cohort day
      ("2024-01-01", 1, 1L), // user 1 returned next day
      ("2024-01-02", 0, 1L), // user 3's cohort day
      ("2024-01-02", 2, 1L)  // user 3 returned two days later
    ))
  }

  test("dedupConsecutive drops repeats per user, keeps changes, firsts, and null transitions") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "a"),   // repeat -> drop
      (3L, 1L, ts("2024-01-01 10:02:00"), "b"),   // change -> keep
      (4L, 1L, ts("2024-01-01 10:03:00"), "b"),   // repeat -> drop
      (5L, 1L, ts("2024-01-01 10:04:00"), "a"),   // back to a -> keep (run-length, not distinct)
      (6L, 2L, ts("2024-01-01 10:00:00"), "a"),   // other user's first -> keep
      (7L, 2L, ts("2024-01-01 10:01:00"), null),  // value -> null = change
      (8L, 2L, ts("2024-01-01 10:02:00"), null),  // null -> null = repeat (null-safe)
      (9L, 2L, ts("2024-01-01 10:03:00"), "a")    // null -> value = change
    ).toDF("event_id", "user_id", "ts", "event_type")
    val kept = Sessionize.dedupConsecutive(ev, Seq("event_type"))
      .select("event_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 5L, 6L, 7L, 9L))
    // multi-column dedup: a change in ANY listed column keeps the row
    val ev2 = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      (2L, 1L, ts("2024-01-01 10:01:00"), "a", 2.0), // value changed -> keep
      (3L, 1L, ts("2024-01-01 10:02:00"), "a", 2.0)  // both same -> drop
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val kept2 = Sessionize.dedupConsecutive(ev2, Seq("event_type", "value"))
      .select("event_id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(1L, 2L))
  }

  test("topPaths: session paths truncate at pathLen, count across users, deterministic cut") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1, one session of 3 events: a > b > c
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "c"),
      // user 1, second session (2h later): a > b
      (4L, 1L, ts("2024-01-01 12:30:00"), "a"),
      (5L, 1L, ts("2024-01-01 12:31:00"), "b"),
      // user 2, one session: a > b > c (same path as user 1's first)
      (6L, 2L, ts("2024-01-01 09:00:00"), "a"),
      (7L, 2L, ts("2024-01-01 09:01:00"), "b"),
      (8L, 2L, ts("2024-01-01 09:02:00"), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessionize.topPaths(ev, gapMs = 30 * 60 * 1000L,
      pathLen = 5, topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a > b > c", 2L), ("a > b", 1L)))
    // pathLen truncation: with pathLen=2 all three sessions share "a > b"
    val cut = Sessionize.topPaths(ev, gapMs = 30 * 60 * 1000L,
      pathLen = 2, topN = 10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(cut.toSeq === Seq(("a > b", 3L)))
  }

  test("transitionMatrix: per-user consecutive pairs only, row-normalized") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: a -> b -> a -> c ; user 2: b -> a  (no cross-user pair:
    // user 1 ends with c, user 2 starts with b — c->b must NOT appear)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "a"),
      (4L, 1L, ts("2024-01-01 10:03:00"), "c"),
      (5L, 2L, ts("2024-01-01 10:04:00"), "b"),
      (6L, 2L, ts("2024-01-01 10:05:00"), "a")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessionize.transitionMatrix(ev)
      .orderBy("prev_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "a", 2L, 1.0)))
    // probabilities sum to 1 within every prev_type row
    val sums = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-9))
  }
}
