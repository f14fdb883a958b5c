package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("joinAsOf: backward match, inclusive at equal times, null when none") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 10L, "x"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (3L, 1L, "other"))
      .toDF("k", "rt", "payload")
    val out = AsOf.joinAsOf(left, right, "k", "t", "rt", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(out("e0").isEmpty)             // before any right row
    assert(out("e1").contains("r@10"))    // inclusive: rt == t matches
    assert(out("e2").contains("r@15"))    // latest earlier wins
    assert(out("x").isEmpty)              // key with no right rows at all
  }

  test("joinAsOf: NULL payload column never backfills from an older right row") {
    val left = Seq((1L, 30L, "e")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, Option("old_a"), Option("old_b")),
        (1L, 20L, Option.empty[String], Option("new_b")))
      .toDF("k", "rt", "a", "b")
    val out = AsOf.joinAsOf(left, right, "k", "t", "rt", Seq("a", "b")).head()
    // the matched row is rt=20; its NULL `a` must surface as NULL — a
    // per-column carry would mix in rt=10's "old_a" (a row that never
    // existed on the right)
    assert(out.isNullAt(out.fieldIndex("asof_a")))
    assert(out.getString(out.fieldIndex("asof_b")) == "new_b")
  }

  test("joinAsOf deterministic tie-break on simultaneous right rows") {
    val left = Seq((1L, 10L, "e")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "rt", "payload")
    val out = AsOf.joinAsOf(left, right, "k", "t", "rt", Seq("payload"),
      tieBreak = Some("payload"))
    assert(out.head().getString(3) == "b") // greatest tie-break value wins
  }

  test("rangeJoin equals the plain inequality join") {
    val points = (1 to 200).map(i => (i.toLong, i * 7.3 % 100)).toDF("id", "v")
    val ivals = Seq(("a", 0.0, 25.0), ("b", 25.0, 50.0), ("c", 50.0, 100.0))
      .toDF("name", "lo", "hi")
    val banded = AsOf.rangeJoin(points, "v", ivals, "lo", "hi", bandWidth = 10.0)
      .select("id", "name").orderBy("id").collect().map(_.toSeq).toSeq
    val plain = points.join(ivals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "name").orderBy("id").collect().map(_.toSeq).toSeq
    assert(banded == plain && banded.nonEmpty)
  }

  test("rangeJoin boundary: hi exactly on a band edge, point on lo edge") {
    val points = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val ivals = Seq(("i", 10.0, 20.0)).toDF("name", "lo", "hi")
    val out = AsOf.rangeJoin(points, "v", ivals, "lo", "hi", bandWidth = 10.0)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L)) // lo inclusive, hi exclusive
  }

  test("intervalOverlapJoin: each overlapping pair exactly once, any band width") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 200L, 210L))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 90L, 150L),  // overlaps 1 only (tail)
                (20L, 10L, 55L),   // overlaps 1 and 2
                (30L, 100L, 120L), // touches 1's exclusive hi → NO overlap
                (40L, 205L, 300L)) // overlaps 3
      .toDF("bid", "b_lo", "b_hi")
    val expect = Set((1L, 10L), (1L, 20L), (2L, 20L), (3L, 40L))
    // long spans cross many bands with width 7; pairs must still be unique
    for (w <- Seq(7L, 64L, 1000L)) {
      val got = AsOf.intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select(col("aid"), col("bid"))
        .as[(Long, Long)].collect().toSeq
      assert(got.size == got.distinct.size, s"duplicate pairs at width $w")
      assert(got.toSet == expect, s"wrong pairs at width $w")
    }
  }

  test("joinAsOfForward: earliest at-or-after match; null when none follows") {
    val left = Seq(("k", 10L, 1L), ("k", 25L, 2L), ("k", 99L, 3L))
      .toDF("k", "t", "lid")
    val right = Seq(("k", 10L, 100L), ("k", 30L, 200L), ("k", 50L, 300L))
      .toDF("k", "rt", "pay")
    val got = AsOf.joinAsOfForward(left, right, "k", "t", "rt", Seq("pay"))
      .select("lid", "asof_pay")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      1L -> Some(100L), // inclusive: rt == t matches
      2L -> Some(200L), // next one after 25 is 30
      3L -> None))      // nothing follows 99
  }

  test("joinAsOfNearest: closer side wins, backward wins ties, direction labels") {
    val left = Seq(
      ("k", 20L, 1L),  // back at 18 (Δ2), fwd at 25 (Δ5) → B
      ("k", 24L, 2L),  // back at 18 (Δ6), fwd at 25 (Δ1) → F
      ("k", 21L, 3L),  // back 18 (Δ3) vs fwd 25 (Δ4) → B
      ("k", 5L, 4L),   // nothing before → F
      ("x", 7L, 5L))   // key with no right rows at all → null
      .toDF("k", "t", "lid")
    val right = Seq(("k", 18L, 180L), ("k", 25L, 250L))
      .toDF("k", "rt", "pay")
    val got = AsOf.joinAsOfNearest(left, right, "k", "t", "rt",
        Seq("pay"), idCol = "lid")
      .select("lid", "asof_pay", "asof_direction")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(180L), Some("B"))))
    assert(got(2L) == ((Some(250L), Some("F"))))
    assert(got(3L) == ((Some(180L), Some("B"))))
    assert(got(4L) == ((Some(180L), Some("F")))) // forward from 5 hits 18
    assert(got(5L) == ((None, None)))
    // exact tie: back at 10 and fwd at 30, left at 20 → backward wins
    val l2 = Seq(("k", 20L, 9L)).toDF("k", "t", "lid")
    val r2 = Seq(("k", 10L, 1L), ("k", 30L, 2L)).toDF("k", "rt", "pay")
    val tie = AsOf.joinAsOfNearest(l2, r2, "k", "t", "rt", Seq("pay"), "lid")
      .select("asof_pay", "asof_direction")
      .as[(Long, String)].collect().head
    assert(tie == ((1L, "B")))
  }
}
