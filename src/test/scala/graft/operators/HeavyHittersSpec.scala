package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.catalyst.FreqSketchAgg

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 3 hot keys (1000/600/300 rows) over a 500-key cold tail of 4 each:
  // distinct keys (503) far exceeds the sketch width, so MG eviction and
  // the subtractive merge both actually run.
  private def skewed = {
    val hot = Seq.fill(1000)(1L) ++ Seq.fill(600)(2L) ++ Seq.fill(300)(3L)
    val cold = (0 until 2000).map(i => 100L + (i % 500))
    spark.sparkContext.parallelize(hot ++ cold, numSlices = 16).toDF("key")
  }

  test("two-pass heavy hitters equals the exact groupBy-HAVING result") {
    val n = skewed.count()
    val threshold = 20 // keys with > n/20 = 195 rows → keys 1, 2, 3
    val got = HeavyHitters.exactHeavyHitters(spark, skewed, "key",
        threshold, k = 64)
      .select("key", "cnt").as[(Long, Long)].collect().toMap
    val want = skewed.groupBy("key").count()
      .where(col("count") * threshold > n)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got == Map(1L -> 1000L, 2L -> 600L, 3L -> 300L))
  }

  test("sketch candidates are k-bounded and a superset of true heavy keys") {
    val k = 16
    val cand = skewed
      .agg(FreqSketchAgg.freqSketch(col("key"), k).as("cand"))
      .head().getSeq[Long](0)
    assert(cand.size <= k)
    // MG guarantee: freq > n/(k+1) ⇒ present. n=3900, n/17 ≈ 229 → keys 1, 2.
    assert(cand.contains(1L) && cand.contains(2L))
    // eval is sorted for determinism
    assert(cand == cand.sorted)
  }

  test("n_total rides along and the cut is strict") {
    val out = HeavyHitters.exactHeavyHitters(spark, skewed, "key",
        threshold = 20, k = 64)
    val n = skewed.count()
    assert(out.select("n_total").distinct().as[Long].collect().toSeq == Seq(n))
    // every reported key strictly exceeds the cut
    out.select("cnt").as[Long].collect().foreach(c => assert(c * 20 > n))
  }
}
