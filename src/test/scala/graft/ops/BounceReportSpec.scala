package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

class BounceReportSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("entry type, bounce counting, and gap splitting") {
    // user 1: session A (view, click) — entry view, not a bounce;
    //         session B after a 2h gap (click) — entry click, bounce
    // user 2: one single-event session (view) — bounce
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:10:00"), 2L, "click"),
      (1L, ts("2024-01-01 13:00:00"), 3L, "click"),
      (2L, ts("2024-01-01 10:00:00"), 4L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Sessions.bounceReport(ev, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800L)
      .orderBy("entry_type")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r === Seq(("click", 1L, 1L, 1.0), ("view", 2L, 1L, 0.5)))
  }

  test("tie on ts picks the lower event_id as the entry") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Sessions.bounceReport(ev, "user_id", "ts", "event_id",
        "event_type", 1800L)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r === Seq(("view", 1L, 0L, 0.0)))
  }
}
