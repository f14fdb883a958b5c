package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecompositionSpec extends SparkSpec {
  import spark.implicits._

  private def toVecs(rows: Seq[(Long, Seq[Double], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("pc1Report recovers the dominant axis of an anisotropic cloud") {
    // variance 100× larger along dim 0 than dim 1: PC1 ≈ e0, so
    // projections ≈ centered dim-0 values and ev_ratio ≈ var0/(var0+var1)
    val pts = Seq(
      (1L, Seq(10.0, 0.1), 0), (2L, Seq(-10.0, -0.1), 0),
      (3L, Seq(8.0, -0.2), 1), (4L, Seq(-8.0, 0.2), 1))
    val got = Decomposition.pc1Report(toVecs(pts), "embedding", "label",
        iters = 6, scale = 9)
      .orderBy("label")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(got.length == 2)
    val (_, _, _, min0, max0, ev) = got(0)
    // label 0 extremes sit at ±10 along the recovered axis
    assert(math.abs(max0 - 10.0) < 0.01 && math.abs(min0 + 10.0) < 0.01)
    assert(ev > 0.99) // essentially all variance on the dominant axis
  }

  test("gram/means/projections are partition-count invariant (long-sum grid)") {
    // 40 deterministic 3-d vectors; values exercise negative coordinates
    val rows = (0 until 40).map { i =>
      (i.toLong,
        Seq(math.sin(i * 1.7) * 3, math.cos(i * 0.9) * 2, (i % 7) - 3.0),
        i % 3)
    }
    val a = Decomposition.pc1Report(toVecs(rows).repartition(1),
      "embedding", "label", iters = 4, scale = 9)
    val b = Decomposition.pc1Report(toVecs(rows).repartition(17),
      "embedding", "label", iters = 4, scale = 9)
    val ka = a.orderBy("label")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    val kb = b.orderBy("label")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(ka == kb) // bit-identical, not approximately equal
  }

  test("dimMeans lands on the grid and matches hand computation") {
    val vecs = Seq(
      (1L, Seq(1.0, -2.0), 0), (2L, Seq(2.0, 4.0), 0),
      (3L, Seq(3.0, 1.0), 0))
    val (m, n) = Decomposition.dimMeans(toVecs(vecs), "embedding", 9)
    assert(n == 3)
    assert(m.toSeq == Seq(2.0, 1.0))
  }
}
