package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StatsCorrSpec extends SparkSpec {
  import spark.implicits._

  test("corrMatrix: perfect, inverse, and agreement with Spark's corr()") {
    val df = (1 to 200).map { i =>
      (i.toDouble, 2.0 * i + 3.0, -1.5 * i + 7.0, (i % 17).toDouble)
    }.toDF("x", "y2", "yneg", "z")
    val out = Stats.corrMatrix(df, Seq("x", "y2", "yneg", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("x", "y2")) == 1.0)      // exact: linear, decimal sums
    assert(out(("x", "yneg")) == -1.0)
    val builtin = df.select(corr("x", "z")).head().getDouble(0)
    assert(math.abs(out(("x", "z")) - builtin) < 1e-6)
  }

  test("corrMatrix pairwise-complete NULLs: per-pair n and agreement with corr()") {
    val df = Seq[(Option[Double], Option[Double], Option[Double])](
      (Some(1.0), Some(2.0), Some(5.0)),
      (Some(2.0), None, Some(4.0)),
      (Some(3.0), Some(5.0), None),
      (None, Some(7.0), Some(2.0)),
      (Some(5.0), Some(11.0), Some(1.0)),
      (Some(6.0), Some(13.0), Some(0.5))).toDF("a", "b", "c")
    val out = Stats.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // n is the pair's both-non-null count, not the global count(*) = 6
    assert(out(("a", "b"))._1 == 4 && out(("a", "c"))._1 == 4 &&
      out(("b", "c"))._1 == 4)
    // built-in corr() skips null pairs — the same pairwise-complete convention
    for ((x, y) <- Seq(("a", "b"), ("a", "c"), ("b", "c"))) {
      val builtin = df.select(corr(x, y)).head().getDouble(0)
      assert(math.abs(out((x, y))._2 - builtin) < 2e-6, s"pair ($x,$y)")
    }
  }

  test("corrMatrix computes all pairs in one shared aggregate") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val plan = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan.toString
    val aggs = "Aggregate \\[".r.findAllIn(plan).size
    assert(aggs == 1, s"expected one shared aggregate, got $aggs:\n$plan")
  }

  test("corrMatrix width bound: past MaxPairsPerAgg the chunked path matches") {
    // 30 columns → C(30,2) = 435 pairs > 256 → chunked; deterministic data
    val p = 30
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { _ =>
      org.apache.spark.sql.Row.fromSeq(Seq.fill(p)(rnd.nextDouble(): Any))
    }
    val names = (0 until p).map(i => s"c$i")
    val schema = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    assert(p * (p - 1) / 2 > Stats.MaxPairsPerAgg)
    val wide = Stats.corrMatrix(df, names).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(wide.size == p * (p - 1) / 2)
    // spot-check a spread of pairs against the single-aggregate path
    for ((a, b) <- Seq(("c0", "c1"), ("c0", "c29"), ("c13", "c14"), ("c27", "c29"))) {
      val narrow = Stats.corrMatrix(df, Seq(a, b)).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
      assert(wide((a, b)) == narrow((a, b)), s"pair ($a,$b)") // bit-identical
    }
  }
}
