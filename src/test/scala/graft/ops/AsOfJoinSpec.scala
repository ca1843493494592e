package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("backward as-of join picks the latest state at or before each event") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3"), // before any state for key 2
      (3L, ts("2024-01-01 10:00:00"), "e4")  // key with no states at all
    ).toDF("user_id", "ts", "tag")
    val states = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (1L, ts("2024-01-01 13:00:00"), 102L), // after both events
      (2L, ts("2024-01-01 09:30:00"), 200L)
    ).toDF("user_id", "state_ts", "state_id")

    val joined = AsOfJoin.asofBackward(events, states,
      "user_id", "user_id", "ts", "state_ts", Seq("state_id"))
      .select("tag", "state_id").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    assert(joined("e1") === Some(100L)) // 09:00 state, not 11:00
    assert(joined("e2") === Some(101L)) // 11:00 state, not 13:00
    assert(joined("e3") === None)       // no state yet
    assert(joined("e4") === None)       // key never has state
  }

  test("tie at the same instant matches (state sorts before event)") {
    import spark.implicits._
    val events = Seq((1L, ts("2024-01-01 10:00:00"), "e")).toDF("k", "t", "tag")
    val states = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("k", "st", "sid")
    val j = AsOfJoin.asofBackward(events, states, "k", "k", "t", "st", Seq("sid"))
      .collect().head
    assert(j.getAs[Long]("sid") === 7L)
  }

  test("dedupRightPerInstant keeps highest tie-break") {
    import spark.implicits._
    val states = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L),
      (1L, ts("2024-01-01 10:00:00"), 9L)).toDF("k", "st", "sid")
    val d = AsOfJoin.dedupRightPerInstant(states, "k", "st", "sid").collect()
    assert(d.length === 1 && d.head.getAs[Long]("sid") === 9L)
  }

  test("plan shape: one shuffle on the key, no cross/range join") {
    import spark.implicits._
    val events = (1 to 100).map(i => (i.toLong % 5, ts(f"2024-01-01 ${i % 24}%02d:00:00"), s"e$i"))
      .toDF("k", "t", "tag")
    val states = (1 to 50).map(i => (i.toLong % 5, ts(f"2024-01-01 ${i % 24}%02d:30:00"), i.toLong))
      .toDF("k", "st", "sid")
    val plan = AsOfJoin.asofBackward(events, states, "k", "k", "t", "st", Seq("sid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not degrade to a product join:\n$plan")
    assert(plan.contains("Window"), s"expected window operator:\n$plan")
  }

  test("null payload on the nearest right row stays null (no fall-through to farther rows)") {
    import spark.implicits._
    val events = Seq((1L, ts("2024-01-01 11:00:00"), "e")).toDF("user_id", "ts", "tag")
    val states = Seq(
      (1L, ts("2024-01-01 01:00:00"), Some(5L)),
      (1L, ts("2024-01-01 10:59:50"), Option.empty[Long]) // nearest, null payload
    ).toDF("user_id", "state_ts", "state_id")
    // without tolerance: the matched row IS the nearest one; its null
    // payload must NOT be replaced by the 01:00 row's value
    val plain = AsOfJoin.asofBackward(events, states,
      "user_id", "user_id", "ts", "state_ts", Seq("state_id"))
      .select("state_id").collect().head
    assert(plain.isNullAt(0))
    // with a tolerance that only the nearest row satisfies, still null —
    // the tolerance is keyed to the same matched row as the payload
    val tol = AsOfJoin.asofBackward(events, states,
      "user_id", "user_id", "ts", "state_ts", Seq("state_id"),
      tolerance = Some(60.0))
      .select("state_id").collect().head
    assert(tol.isNullAt(0))
  }

  test("forward as-of picks the earliest state at or after each event") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"), // next state 11:00
      (1L, ts("2024-01-01 11:00:00"), "e2"), // tie: same-instant state matches
      (1L, ts("2024-01-01 14:00:00"), "e3"), // nothing after
      (2L, ts("2024-01-01 10:00:00"), "e4")  // key without states
    ).toDF("user_id", "ts", "tag")
    val states = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (1L, ts("2024-01-01 13:00:00"), 102L)
    ).toDF("user_id", "state_ts", "state_id")
    val joined = AsOfJoin.asofForward(events, states,
      "user_id", "user_id", "ts", "state_ts", Seq("state_id"))
      .select("tag", "state_id").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(joined("e1") === Some(101L))
    assert(joined("e2") === Some(101L)) // same instant matches
    assert(joined("e3") === None)
    assert(joined("e4") === None)
  }

  test("tolerance nulls matches outside the bound, boundary inclusive") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "in"),      // state 1h before: on the bound
      (1L, ts("2024-01-01 12:00:01"), "out")      // state 3h1s before: outside
    ).toDF("user_id", "ts", "tag")
    val states = Seq((1L, ts("2024-01-01 09:00:00"), 100L))
      .toDF("user_id", "state_ts", "state_id")
    val back = AsOfJoin.asofBackward(events, states,
      "user_id", "user_id", "ts", "state_ts", Seq("state_id"),
      tolerance = Some(3600.0))
      .select("tag", "state_id").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(back("in").isDefined && back("out").isEmpty)
    // forward symmetric: state 1h after on the bound, 3h1s after outside
    val fwdEvents = Seq(
      (1L, ts("2024-01-01 08:00:00"), "in"),
      (1L, ts("2024-01-01 05:59:59"), "out")
    ).toDF("user_id", "ts", "tag")
    val fwd = AsOfJoin.asofForward(fwdEvents, states,
      "user_id", "user_id", "ts", "state_ts", Seq("state_id"),
      tolerance = Some(3600.0))
      .select("tag", "state_id").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(fwd("in").isDefined && fwd("out").isEmpty)
  }
}
