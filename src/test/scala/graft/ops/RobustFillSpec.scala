package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge cases for Stats.robustOutliers and Sessions.gapFillForward that
  * the oracle queries (q124/q125) can't reach on the generated data. */
class RobustFillSpec extends SparkSpec {
  import spark.implicits._

  test("robustOutliers: hand-computed median/MAD/count, and a constant " +
    "group has MAD 0 with every deviating row an outlier") {
    // g1: values 1..9 plus a wild 100 → med 5.5; devs sorted:
    // .5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5 → MAD 2.5; threshold 7.5 →
    // only 100 is out (the wild value does NOT drag the screen).
    // g2: constant 7s and one 8 → med 7, MAD 0, the 8 is out.
    val df = ((1 to 9).map(v => ("g1", v.toDouble)) :+ (("g1", 100.0))
      ) ++ Seq.fill(9)(("g2", 7.0)) :+ (("g2", 8.0))
    val got = Stats.robustOutliers(df.toDF("g", "v"), Seq("g"), "v", k = 3.0)
      .orderBy("g")
      .as[(String, Double, Double, Long)].collect().toSeq
    val g1 = got.head
    assert(g1._1 == "g1" && g1._2 == 5.5 && g1._3 == 2.5)
    assert(g1._4 == 1L, s"g1 outliers: $g1")
    val g2 = got(1)
    assert(g2._1 == "g2" && g2._2 == 7.0 && g2._3 == 0.0 && g2._4 == 1L)
  }

  test("gapFillForward: holes carry the last value, multiple same-day " +
    "events keep the latest by (ts, tie), grid spans per-user range") {
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")
    val df = Seq(
      // user 1: day 1 (two events — later one wins), day 4 → days 2,3 filled
      (1L, ts(1, 5), 10L, 1.0), (1L, ts(1, 9), 11L, 2.0),
      (1L, ts(4, 1), 12L, 9.0),
      // user 2: single day — no fill
      (2L, ts(10, 1), 20L, 5.0))
      .toDF("u", "ts", "eid", "v")
    val got = Sessions.gapFillForward(df, "u", "ts", "eid", "v")
      .select($"u", $"day", $"obs", $"carried", $"is_filled")
      .orderBy("u", "day")
      .as[(Long, Int, Option[Double], Double, Boolean)].collect().toSeq
    val d0 = got.map(_._2).min
    assert(got == Seq(
      (1L, d0, Some(2.0), 2.0, false),      // latest same-day event wins
      (1L, d0 + 1, None, 2.0, true),        // filled forward
      (1L, d0 + 2, None, 2.0, true),
      (1L, d0 + 3, Some(9.0), 9.0, false),
      (2L, d0 + 9, Some(5.0), 5.0, false))) // separate span, no fill
  }
}
