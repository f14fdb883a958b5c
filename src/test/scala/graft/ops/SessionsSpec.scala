package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps over the threshold, not under it") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 1.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, 2.0),  // 10 min gap → same session
      (3L, ts("2024-01-01 11:00:00"), 7L, 4.0),  // 50 min gap → new session
      (4L, ts("2024-01-01 10:05:00"), 8L, 8.0))  // other user, own session
      .toDF("event_id", "ts", "user_id", "value")
    val out = Sessions.sessionize(ev, "user_id", "ts", "event_id", "value", 1800L)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    assert(out((7L, 0L)) == ((2L, 3.0)))
    assert(out((7L, 1L)) == ((1L, 4.0)))
    assert(out((8L, 0L)) == ((1L, 8.0)))
  }

  test("sessionizeGlobal equals the constant-key reference for any partition count") {
    // 200 events over a jittered timeline with deterministic gaps: gap to
    // the previous event exceeds 60 s on every 7th event, so sessions
    // straddle range-partition boundaries at every tested partition count
    val ev = (0 until 200).scanLeft((0L, 0L)) { case ((_, us), i) =>
      val gap = if (i % 7 == 3) 120000000L else 10000000L // 120 s vs 10 s
      (i.toLong, us + gap)
    }.tail.map { case (id, us) =>
      (id, new Timestamp(us / 1000L), 1.0 + (id % 5))
    }.toDF("event_id", "ts", "value")
    val want = Sessions.sessionize(ev.withColumn("g", lit(0L)),
        "g", "ts", "event_id", "value", 60L)
      .select("session_idx", "start_us", "end_us", "n_events", "total_value")
      .orderBy("session_idx").collect().toSeq
    assert(want.size > 20) // the fixture really splits
    for (parts <- Seq(1, 3, 7)) {
      val got = Sessions.sessionizeGlobal(ev, "ts", "event_id", "value",
          60L, numParts = parts)
        .orderBy("session_idx").collect().toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("sessionizeGlobal plans no single-partition window over the event grain") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("event_id", "ts", "value")
    val plan = Sessions.sessionizeGlobal(ev, "ts", "event_id", "value", 60L,
      numParts = 4).queryExecution.sparkPlan
    val globals = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    // the only global windows sit over the partition-stats aggregate
    assert(globals.nonEmpty)
    globals.foreach { w =>
      assert(w.collectFirst { case a: BaseAggregateExec => a }.isDefined,
        s"global window over the event grain:\n$w")
    }
  }

  test("runs collapses consecutive equal states, splitting on change") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 7L, "a"),  // same state → same run
      (3L, ts("2024-01-01 10:02:00"), 7L, "b"),  // change → new run
      (4L, ts("2024-01-01 10:03:00"), 7L, "a"),  // back to a → THIRD run
      (5L, ts("2024-01-01 10:00:00"), 8L, "a"))  // other user, own run
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.runs(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_idx")) ->
        (r.getAs[String]("state"), r.getAs[Long]("n_events"))).toMap
    assert(out.size == 4)
    assert(out((7L, 1L)) == (("a", 2L)))
    assert(out((7L, 2L)) == (("b", 1L)))
    assert(out((7L, 3L)) == (("a", 1L)))
    assert(out((8L, 1L)) == (("a", 1L)))
  }

  test("runs breaks timestamp ties by the event id column") {
    val t = ts("2024-01-01 10:00:00")
    val ev = Seq((2L, t, 7L, "b"), (1L, t, 7L, "a"), (3L, t, 7L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.runs(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("run_idx").collect()
    // id order a, b, a → three runs despite only two distinct states
    assert(out.map(_.getAs[String]("state")).toSeq == Seq("a", "b", "a"))
  }

  test("funnel requires strict event ordering per user") {
    val ev = Seq(
      // user 7 completes the funnel in order
      (7L, ts("2024-01-01 10:00:00"), "view"),
      (7L, ts("2024-01-01 10:05:00"), "click"),
      (7L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 8 clicks BEFORE viewing → click doesn't count
      (8L, ts("2024-01-01 09:00:00"), "click"),
      (8L, ts("2024-01-01 09:30:00"), "view"),
      // user 9 never views → counts nowhere
      (9L, ts("2024-01-01 09:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Sessions.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("step_idx") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("retentionCohorts counts distinct users per cohort/day offset") {
    val ev = Seq(
      (7L, ts("2024-01-01 09:00:00")), (7L, ts("2024-01-01 23:00:00")), // day 0 twice
      (7L, ts("2024-01-03 10:00:00")),                                  // day 2
      (8L, ts("2024-01-03 10:00:00")))                                  // later cohort
      .toDF("user_id", "ts")
    val out = Sessions.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => (r.getAs[Int]("cohort_day"), r.getAs[Int]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    val day0 = 19723 // 2024-01-01 as days since epoch
    assert(out((day0, 0)) == 1L)       // user 7, deduped within the day
    assert(out((day0, 2)) == 1L)       // user 7 returns
    assert(out((day0 + 2, 0)) == 1L)   // user 8's own cohort
    assert(out.size == 3)
  }

  test("windowedFunnel drops conversions past the deadline; funnel keeps them") {
    // user 1 converts within the hour; user 2's click comes 3 days later
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-04 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val bounded = Sessions.windowedFunnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"), windowUs = 24L * 3600 * 1000000)
      .orderBy("step_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(bounded === Seq((1L, "view", 2L), (2L, "click", 1L)))
    val unbounded = Sessions.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .orderBy("step_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(unbounded === Seq((1L, "view", 2L), (2L, "click", 2L)))
  }

  test("peakConcurrency: overlap counting, day spanning, instant sessions") {
    val D = 86400000000L
    // day 0: A [100, 200], B [150, 300] overlap → peak 2;
    //        C is an instant session at 150 → peak 3 at t=150
    // A session D spans the day boundary [D-50, D+50] → touches days 0 and 1
    val sessions = Seq(
      (1L, 0L, 100L, 200L), (2L, 0L, 150L, 300L), (3L, 0L, 150L, 150L),
      (4L, 0L, D - 50L, D + 50L)
    ).toDF("user_id", "session_idx", "start_us", "end_us")
    val out = Sessions.peakConcurrency(sessions,
        "user_id", "session_idx", "start_us", "end_us")
      .orderBy("day").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 4L, 3L), (1L, 1L, 1L)))
  }

  test("peakConcurrency: touching sessions do not overlap (end before start)") {
    val sessions = Seq(
      (1L, 0L, 100L, 200L), (2L, 0L, 201L, 300L) // closed [100,200], [201,300]
    ).toDF("user_id", "session_idx", "start_us", "end_us")
    val out = Sessions.peakConcurrency(sessions,
        "user_id", "session_idx", "start_us", "end_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 2L, 1L)))
  }
}
