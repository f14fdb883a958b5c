package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecurrenceSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id, delta)
  private def rows = Seq(
    (1L, 10L, 1L, 5L),    // bal 5
    (1L, 20L, 2L, -8L),   // raw -3 → clamp 0, reset
    (1L, 30L, 3L, 7L),    // bal 7 (peak)
    (1L, 40L, 4L, -2L),   // bal 5
    (2L, 10L, 1L, -1L),   // raw -1 → clamp 0, reset
    (2L, 20L, 2L, 3L)     // bal 3
  ).toDF("k", "ts", "id", "delta")

  private def report(df: org.apache.spark.sql.DataFrame) =
    Recurrence.clampedBalanceReport(df, "k", "ts", "id", "delta")
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("clamp, peak and reset semantics") {
    assert(report(rows) === Seq((1L, 5L, 7L, 1L), (2L, 3L, 3L, 1L)))
  }

  test("unsorted, multi-partition input folds in (ts, id) order per key") {
    assert(report(rows.orderBy(rand(7)).repartition(5)) ===
      Seq((1L, 5L, 7L, 1L), (2L, 3L, 3L, 1L)))
  }

  test("clamping is order-sensitive — the recurrence is not a prefix sum") {
    // same multiset of deltas, different order → different final balance,
    // proving a windowed/prefix-sum formulation could not be equivalent
    val reordered = Seq(
      (1L, 10L, 1L, -8L), (1L, 20L, 2L, 5L), (1L, 30L, 3L, -2L),
      (1L, 40L, 4L, 7L)
    ).toDF("k", "ts", "id", "delta")
    assert(report(reordered) === Seq((1L, 10L, 10L, 1L)))
  }

  test("ties on ts break by id deterministically") {
    val tied = Seq(
      (1L, 10L, 2L, -5L), (1L, 10L, 1L, 3L) // id 1 first: 3 → clamp(-2)=0
    ).toDF("k", "ts", "id", "delta")
    assert(report(tied) === Seq((1L, 0L, 3L, 1L)))
  }

  test("ewmaReport folds in order and is partition invariant") {
    val xs = Seq(
      (1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0), (1L, 30L, 3L, 0.0),
      (2L, 10L, 1L, 2.0)
    ).toDF("k", "ts", "id", "x")
    // user 1: s1=8; s2=0.25*4+0.75*8=7; s3=0.25*0+0.75*7=5.25
    val expected = Seq((1L, 3L, 5.25), (2L, 1L, 2.0))
    val a = Recurrence.ewmaReport(xs, "k", "ts", "id", "x", 0.25)
      .orderBy("user_id").as[(Long, Long, Double)].collect().toSeq
    assert(a === expected)
    val b = Recurrence.ewmaReport(xs.orderBy(rand(3)).repartition(5),
        "k", "ts", "id", "x", 0.25)
      .orderBy("user_id").as[(Long, Long, Double)].collect().toSeq
    assert(b === expected)
  }

  test("cappedSessions: gap splits, cap splits, gap wins ties, invariance") {
    // user 1 (gap 10, cap 25): events at 0, 8, 16, 24, 26, 50
    //   t=8:  gap 8 ≤ 10, span 8 ≤ 25 → same session
    //   t=16: gap 8, span 16 → same
    //   t=24: gap 8, span 24 → same
    //   t=26: gap 2, span 26 > 25 → CAP split (session 2 starts at 26)
    //   t=50: gap 24 > 10 → GAP split (session 3)
    // user 2: single event → 1 session, no splits
    val xs = Seq(
      (1L, 0L, 1L), (1L, 8L, 2L), (1L, 16L, 3L), (1L, 24L, 4L),
      (1L, 26L, 5L), (1L, 50L, 6L), (2L, 5L, 1L)
    ).toDF("k", "us", "id")
    val expected = Seq((1L, 3L, 1L, 1L), (2L, 1L, 0L, 0L))
    val a = Recurrence.cappedSessions(xs, "k", "us", "id", 10L, 25L)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a === expected)
    val b = Recurrence.cappedSessions(xs.orderBy(rand(11)).repartition(5),
        "k", "us", "id", 10L, 25L)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(b === expected)
    // without the cap the whole 0..26 run is ONE session (the rule q53
    // cannot express is exactly what changes the answer)
    val noCap = Recurrence.cappedSessions(xs, "k", "us", "id", 10L, Long.MaxValue)
      .orderBy("user_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(noCap === Seq((1L, 2L, 1L, 0L), (2L, 1L, 0L, 0L)))
  }

  test("holtReport: hand-computed two-state fold; partition/order invariant") {
    val xs = Seq(
      (1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0), (1L, 30L, 3L, 12.0),
      (2L, 10L, 1L, 2.0)
    ).toDF("k", "ts", "id", "x")
    // user 1 (α=.5, β=.25):
    //   l1=8, b1=0
    //   l2=.5·4+.5·(8+0)=6;   b2=.25·(6−8)+.75·0=−0.5
    //   l3=.5·12+.5·(6−0.5)=8.75; b3=.25·(8.75−6)+.75·(−0.5)=0.3125
    val expected = Seq((1L, 3L, 8.75, 0.3125), (2L, 1L, 2.0, 0.0))
    val a = Recurrence.holtReport(xs, "k", "ts", "id", "x", 0.5, 0.25)
      .orderBy("user_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(a === expected)
    val b = Recurrence.holtReport(xs.orderBy(rand(7)).repartition(5),
        "k", "ts", "id", "x", 0.5, 0.25)
      .orderBy("user_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(b === expected)
  }
}
