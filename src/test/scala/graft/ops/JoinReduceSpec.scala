package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinReduceSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (0L until 20000L).map(i => (i % 1000, i))
    .toDF("fk", "payload")
  private def dim = (0L until 1000L).filter(_ % 50 == 0)
    .map(k => (k, s"d$k")).toDF("dk", "name")

  test("bloomPrefilter keeps every joinable row (no false negatives)") {
    val pruned = JoinReduce.bloomPrefilter(fact, "fk", dim, "dk",
      expectedKeys = 1 << 12)
    val joinable = fact.join(dim, col("fk") === col("dk")).select("fk", "payload")
    // every row the exact join would keep must survive the bloom filter
    assert(joinable.exceptAll(pruned.select("fk", "payload")).count() === 0)
    // and the filter actually reduced the fact side (20 of 1000 keys match)
    val kept = pruned.count()
    assert(kept < 20000L / 10, s"bloom kept $kept rows — no reduction")
  }

  test("reducedJoin equals the plain exact join") {
    val got = JoinReduce.reducedJoin(fact, "fk", dim, "dk",
        expectedKeys = 1 << 12)
      .select("fk", "payload", "name")
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("null fact keys are dropped, matching inner-join semantics") {
    val withNulls = fact.withColumn("fk",
      when(col("payload") % 7 === 0, lit(null)).otherwise(col("fk")))
    val got = JoinReduce.reducedJoin(withNulls, "fk", dim, "dk", 1 << 12)
      .select("fk", "payload", "name")
    val want = withNulls.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("bloom probe stays map-side: no shuffle before the filter") {
    val pruned = JoinReduce.bloomPrefilter(fact, "fk", dim, "dk", 1 << 12)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom prefilter should not shuffle the fact side:\n$plan")
  }
}
