package graft.ops

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private val df = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(50.0), "b"),
    (3L, None, "a"),
    (4L, Some(200.0), "zzz"))
    .toDF("id", "amount", "tag")

  test("report measures fractions and flags pass/fail per expectation") {
    val out = report(df, Seq(
        Completeness("amount"),                       // 3/4 → fail at 1.0
        Completeness("id"),                           // 4/4 → pass
        InRange("amount", 0, 100, threshold = 0.5),   // 2/4 → pass at 0.5
        InSet("tag", Seq("a", "b"), threshold = 1.0), // 3/4 → fail
        Uniqueness(Seq("id")),                        // 4 distinct / 4 → pass
        Uniqueness(Seq("tag"), threshold = 1.0)))     // 3/4 → fail
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getBoolean(3)))).toMap
    assert(out("completeness(amount)") == ((0.75, false)))
    assert(out("completeness(id)") == ((1.0, true)))
    assert(out("in_range(amount)") == ((0.5, true)))
    assert(out("in_set(tag)") == ((0.75, false)))
    assert(out("uniqueness(id)") == ((1.0, true)))
    assert(out("uniqueness(tag)") == ((0.75, false)))
  }

  test("row-local expectations share one aggregate (single scan)") {
    val plan = report(df, Seq(
        Completeness("amount"), InRange("amount", 0, 100),
        InSet("tag", Seq("a"))))
      .queryExecution.optimizedPlan.toString
    // no uniqueness → exactly one Aggregate over one scan
    val aggs = "Aggregate \\[".r.findAllIn(plan).size
    assert(aggs == 1, s"expected a single shared aggregate, plan:\n$plan")
  }
}
