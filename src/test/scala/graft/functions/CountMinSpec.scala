package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.catalyst.CountMinAgg

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // the query-side hash convention: 60-bit non-negative md5 prefix
  private def hashed(keys: Seq[String]) =
    keys.toDF("k")
      .withColumn("h", expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)"))

  // reference matrix, scalar JVM
  private def refMatrix(hs: Seq[Long]): Array[Long] = {
    val m = new Array[Long](CountMinAgg.Size)
    hs.foreach { h =>
      var i = 0
      while (i < CountMinAgg.D) {
        val col = ((h >>> (CountMinAgg.LogW * i)) & (CountMinAgg.W - 1)).toInt
        m(i * CountMinAgg.W + col) += 1L
        i += 1
      }
    }
    m
  }

  test("matrix matches a scalar reference and is partitioning-invariant") {
    val keys = (0 until 500).flatMap(i => Seq.fill(1 + i % 5)(s"key-$i"))
    val df = hashed(keys).cache()
    try {
      val expected = refMatrix(df.select("h").as[Long].collect().toSeq)
      for (parts <- Seq(1, 7)) {
        val got = df.repartition(parts)
          .agg(CountMinAgg.cmsSketch($"h").as("m"))
          .head.getSeq[Long](0).toArray
        assert(got.sameElements(expected), s"parts=$parts")
      }
    } finally df.unpersist()
  }

  test("merged per-group matrices equal the sketch of the union, and the " +
    "estimate never undercounts") {
    val a = hashed((0 until 800).map(i => s"key-${i % 200}")).withColumn("g", lit("a"))
    val b = hashed((0 until 600).map(i => s"key-${100 + i % 300}")).withColumn("g", lit("b"))
    val all = a.unionByName(b)
    val perGroup = all.groupBy("g").agg(CountMinAgg.cmsSketch($"h").as("m"))
    // merge = element-wise sum across groups (the at-rest rollup op)
    val merged = perGroup
      .select(posexplode($"m").as(Seq("j", "c")))
      .groupBy("j").agg(sum($"c").as("c"))
      .agg(expr("transform(array_sort(collect_list(struct(j, c))), s -> CAST(s.c AS BIGINT))")
        .as("m"))
    val direct = all.agg(CountMinAgg.cmsSketch($"h").as("m"))
    assert(merged.head.getSeq[Long](0) == direct.head.getSeq[Long](0))

    // overcount-only guarantee: estimate >= exact for every key, and with
    // W=512 >> 300 distinct keys the top keys estimate exactly here
    val exact = all.groupBy("k", "h").count()
    val est = exact.crossJoin(direct)
      .select($"k", $"count",
        CountMinAgg.cmsEstimate("m", "h").as("est"))
    val bad = est.where($"est" < $"count").count()
    assert(bad == 0L)
  }

  test("empty input evals to an all-zero matrix (not null)") {
    val empty = hashed(Seq("x")).where(lit(false))
    val m = empty.agg(CountMinAgg.cmsSketch($"h").as("m")).head.getSeq[Long](0)
    assert(m.size == CountMinAgg.Size && m.forall(_ == 0L))
  }
}
