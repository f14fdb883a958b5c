package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.catalyst.HllSketchAgg

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  // the query-side hash convention: 60-bit non-negative md5 prefix
  private def hashed(n: Int, dups: Int) = {
    val keys = (0 until n).flatMap(i => Seq.fill(dups)(s"key-$i"))
    keys.toDF("k")
      .withColumn("h", expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)"))
  }

  // reference register computation, scalar JVM
  private def refRegisters(hs: Seq[Long]): Array[Int] = {
    val regs = new Array[Int](HllSketchAgg.M)
    hs.foreach { h =>
      val j = (h & (HllSketchAgg.M - 1)).toInt
      val w = h >>> HllSketchAgg.LogM
      val rho =
        if (w == 0L) HllSketchAgg.MaxRho
        else HllSketchAgg.WBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(j)) regs(j) = rho
    }
    regs
  }

  test("registers match a scalar reference, duplicates are absorbed, " +
    "and the result is partitioning-invariant") {
    val df = hashed(n = 300, dups = 3).cache()
    try {
      val expected = refRegisters(df.select("h").as[Long].collect().toSeq)
      for (parts <- Seq(1, 7)) {
        val got = df.repartition(parts)
          .agg(HllSketchAgg.hllSketch($"h").as("regs"))
          .head.getSeq[Int](0).toArray
        assert(got.sameElements(expected), s"parts=$parts")
      }
      // duplicates don't move registers: distinct input gives same sketch
      val distinctRegs = df.dropDuplicates("k")
        .agg(HllSketchAgg.hllSketch($"h").as("regs"))
        .head.getSeq[Int](0).toArray
      assert(distinctRegs.sameElements(expected))
    } finally df.unpersist()
  }

  test("estimate is within the expected HLL error band and the merged " +
    "rollup equals the sketch of the union") {
    val a = hashed(2000, 1).withColumn("g", lit("a"))
    val b = hashed(2000, 1).withColumn("g", lit("b")) // same keys: union = 2000
    val c = (2000 until 3000).map(i => s"key-$i").toDF("k")
      .withColumn("h", expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("g", lit("c")) // disjoint: union = 3000
    val perGroup = a.unionByName(b).unionByName(c)
      .groupBy("g").agg(HllSketchAgg.hllSketch($"h").as("regs"))
    // merge via register max across groups == sketch of the unioned data
    val merged = perGroup
      .select(posexplode($"regs").as(Seq("j", "rho")))
      .groupBy("j").agg(max($"rho").as("rho"))
      .agg(expr("transform(array_sort(collect_list(struct(j, rho))), s -> s.rho)")
        .as("regs"))
    val direct = a.unionByName(b).unionByName(c)
      .agg(HllSketchAgg.hllSketch($"h").as("regs"))
    assert(merged.head.getSeq[Int](0) == direct.head.getSeq[Int](0))

    val est = merged.select(HllSketchAgg.hllEstimate("regs").as("e"))
      .head.getDouble(0)
    // m=64 → standard error 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - 3000.0) / 3000.0 < 0.39, s"est=$est")
  }

  test("empty input evals to all-zero registers (not null)") {
    val empty = hashed(10, 1).where(lit(false))
    val regs = empty.agg(HllSketchAgg.hllSketch($"h").as("regs"))
      .head.getSeq[Int](0)
    assert(regs.size == HllSketchAgg.M && regs.forall(_ == 0))
  }
}
