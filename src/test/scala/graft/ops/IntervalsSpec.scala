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
}
