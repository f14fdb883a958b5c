package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, when}

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

  test("integrityDiff: identical copies agree; edits/deletes flag exactly their buckets") {
    val a = (1L to 400L).map(k => (k, s"v$k", k * 10)).toDF("k", "s", "x")
    // identical copy — different partitioning must NOT matter
    assert(Expectations.integrityDiff(a, a.repartition(13), "k",
      Seq("k", "s", "x"), buckets = 16).count() == 0)
    // one edited row and one deleted row → their buckets (and only
    // theirs) flagged; count stays equal for the pure edit
    val b = a.withColumn("x",
        when(col("k") === 7L, lit(999L)).otherwise(col("x")))
      .where(col("k") =!= 250L)
    val diff = Expectations.integrityDiff(a, b, "k",
        Seq("k", "s", "x"), buckets = 16)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(diff.length <= 2 && diff.nonEmpty) // ≤2 buckets, possibly same
    val editBucket = diff.find(r => r._2 == r._3) // edit: counts equal
    val delBucket = diff.find(r => r._2 == r._3 + 1) // delete: one fewer
    assert(diff.length == 1 || (editBucket.isDefined && delBucket.isDefined))
    assert(diff.forall(r => r._4 != r._5)) // checksums always disagree
  }
}
