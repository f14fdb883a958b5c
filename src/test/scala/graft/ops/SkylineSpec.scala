package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def frontier(rows: Seq[(String, Long, Double, Int)]) =
    Windows.skyline2D(rows.toDF("g", "id", "price", "size"),
        "g", "price", "size")
      .select("id").as[Long].collect().toSet

  test("skyline2D: dominance, same-price ties, equal twins, per-group scope") {
    // group A: (1) 10/5 and (2) 20/9 both on the frontier; (3) 20/3
    // dominated by 1 and 2; (4) 15/5 dominated by 1 (same size, pricier);
    // (5) 10/5 equal twin of 1 — both survive
    // group B: identical coordinates to A's dominated (3) — but alone in
    // its group, so it survives (scope is per group)
    val rows = Seq(
      ("A", 1L, 10.0, 5), ("A", 2L, 20.0, 9), ("A", 3L, 20.0, 3),
      ("A", 4L, 15.0, 5), ("A", 5L, 10.0, 5),
      ("B", 6L, 20.0, 3))
    assert(frontier(rows) == Set(1L, 2L, 5L, 6L))
  }

  test("skyline2D: same price, different size — only the max survives") {
    val rows = Seq(("A", 1L, 10.0, 5), ("A", 2L, 10.0, 7), ("A", 3L, 10.0, 6))
    assert(frontier(rows) == Set(2L))
  }

  test("skyline2D: strictly improving staircase keeps everything") {
    val rows = (1 to 6).map(i => ("A", i.toLong, i * 10.0, i))
    assert(frontier(rows) == (1L to 6L).toSet)
  }
}
