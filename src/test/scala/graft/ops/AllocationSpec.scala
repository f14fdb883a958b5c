package graft.ops

import graft.SparkSpec

class AllocationSpec extends SparkSpec {
  import spark.implicits._

  test("largestRemainder: integer allocs, exact budget, remainder order") {
    // weights 1/1/2 over budget 10: quotas 2.5/2.5/5 → bases 2/2/5,
    // leftover 1 goes to the tie-broken FIRST largest remainder ('a')
    val grain = Seq(("a", 1.0), ("b", 1.0), ("c", 2.0)).toDF("k", "w")
    val got = Stats.largestRemainder(grain, "k", "w", 10L)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 5L))
  }

  test("largestRemainder: sums to budget on skewed weights; zero weight gets 0") {
    val grain = Seq(("a", 0.0), ("b", 97.3), ("c", 1.1), ("d", 1.6))
      .toDF("k", "w")
    val got = Stats.largestRemainder(grain, "k", "w", 1000L)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.values.sum == 1000L)
    assert(got("a") == 0L)
    // proportionality: allocations within 1 unit of exact quota
    assert(math.abs(got("b") - 973L) <= 1)
    assert(math.abs(got("c") - 11L) <= 1)
    assert(math.abs(got("d") - 16L) <= 1)
  }

  test("largestRemainder: partition-count invariant") {
    val grain = (1 to 30).map(i => (s"k$i", (i % 7) + 0.25)).toDF("k", "w")
    val a = Stats.largestRemainder(grain.repartition(1), "k", "w", 777L)
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    val b = Stats.largestRemainder(grain.repartition(13), "k", "w", 777L)
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._3).sum == 777L)
  }
}
