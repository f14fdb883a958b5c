package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // (key, start, end, id)
  private def spans = Seq(
    ("a", 0L, 10L, 1L),   // island 1: [0,10] ∪ [5,12] ∪ [12,15] → [0,15]
    ("a", 5L, 12L, 2L),
    ("a", 12L, 15L, 3L),  // touching (start == running max) merges
    ("a", 20L, 25L, 4L),  // island 2
    ("b", 0L, 100L, 5L),  // one island fully containing a later span
    ("b", 10L, 20L, 6L),
    ("c", 7L, 7L, 7L)     // zero-length span: island of length 0
  ).toDF("k", "s", "e", "id")

  test("mergeIslands merges overlapping and touching spans") {
    val out = Intervals.mergeIslands(spans, "k", "s", "e", "id")
      .orderBy("k", "island_start")
      .select("k", "island_start", "island_end", "n_spans")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 0L, 15L, 3L), ("a", 20L, 25L, 1L),
      ("b", 0L, 100L, 2L), ("c", 7L, 7L, 1L)))
  }

  test("coverage counts overlap seconds once") {
    val out = Intervals.coverage(spans, "k", "s", "e", "id")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 2L, 20L), ("b", 1L, 100L), ("c", 1L, 0L)))
  }

  test("coverage is partition-count invariant") {
    val repart = Intervals.coverage(spans.repartition(7), "k", "s", "e", "id")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val one = Intervals.coverage(spans.coalesce(1), "k", "s", "e", "id")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(repart === one)
  }

  test("out-of-order input sorts inside the window, not upstream") {
    val shuffled = spans.orderBy(rand(42))
    val out = Intervals.coverage(shuffled, "k", "s", "e", "id")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 2L, 20L), ("b", 1L, 100L), ("c", 1L, 0L)))
  }

  test("fifoMatch: lot split across sales, sale spanning lots, shortage, key scope") {
    // key "p": lots (ord 1: 10 units @2.0), (ord 2: 5 units @4.0)
    //          sales (ord 1: 4), (ord 2: 9), (ord 3: 6) — total 19 > 15:
    //   sale 1 takes 4 of lot 1; sale 2 takes 6 of lot 1 + 3 of lot 2;
    //   sale 3 takes the last 2 of lot 2, 4 units unmatched (shortage)
    // key "q": a sale with NO lots at all — zero match rows
    val lots = Seq(("p", 1L, 10L, 2.0), ("p", 2L, 5L, 4.0))
      .toDF("k", "ord", "qty", "uc")
    val sales = Seq(("p", 1L, 4L), ("p", 2L, 9L), ("p", 3L, 6L),
      ("q", 1L, 7L)).toDF("k", "ord", "qty")
    val got = Intervals.fifoMatch(lots, sales, "k", "qty", "uc", Seq("ord"))
      .select("key", "lot_ord", "sale_ord", "units", "alloc_cost")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("p", 1L, 1L, 4L, 8.0),
      ("p", 1L, 2L, 6L, 12.0),
      ("p", 2L, 2L, 3L, 12.0),
      ("p", 2L, 3L, 2L, 8.0)))
    // matched units per sale: 4 + 9 + 2 = 15 = total lot supply
    assert(got.toSeq.map(_._4).sum == 15L)
  }
}
