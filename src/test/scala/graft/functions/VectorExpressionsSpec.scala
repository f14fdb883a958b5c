package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.catalyst.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = (0 until 50).map { i =>
    (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j) * 10))
  }.toDF("id", "v")

  test("native DotProduct is bit-identical to the HOF fold formulation") {
    val both = vecs.as("a").join(vecs.as("b"), $"a.id" < $"b.id")
      .select(
        VectorExpressions.dotProduct($"a.v", $"b.v").as("native"),
        VectorExpressions.dotProductHof($"a.v", $"b.v").as("hof"))
    assert(both.where($"native" =!= $"hof").count() == 0)
    // and not trivially: values are nonzero
    assert(both.where($"native" =!= 0d).count() > 0)
  }

  test("fused CosineSimilarity matches dot/(|a||b|) bit-for-bit and handles zero norm") {
    val both = vecs.as("a").join(vecs.as("b"), $"a.id" < $"b.id")
      .select(
        VectorExpressions.cosineSim($"a.v", $"b.v").as("fused"),
        (VectorExpressions.dotProductHof($"a.v", $"b.v") /
          (sqrt(VectorExpressions.dotProductHof($"a.v", $"a.v")) *
           sqrt(VectorExpressions.dotProductHof($"b.v", $"b.v")))).as("composed"))
    assert(both.where($"fused" =!= $"composed").count() == 0)
    val zero = Seq((Array(0d, 0d), Array(1d, 2d))).toDF("x", "y")
      .select(VectorExpressions.cosineSim($"x", $"y").as("c"))
    assert(zero.head().isNullAt(0))
  }

  test("expressions are SQL-registrable and codegen survives a real plan") {
    VectorExpressions.register(spark)
    vecs.createOrReplaceTempView("vecs_test")
    val r = spark.sql(
      """SELECT sum(cosine_sim(a.v, b.v)) AS s, sum(dot_product(a.v, b.v)) AS d
        |FROM vecs_test a JOIN vecs_test b ON a.id < b.id""".stripMargin).head()
    assert(!r.isNullAt(0) && math.abs(r.getDouble(1)) > 0)
  }

  test("q26-shaped projection (48 DotProducts in one function) compiles under CODEGEN_ONLY") {
    // Regression for the round-1 Janino failure: fixed local names in
    // doGenCode collided when ≥2 instances landed in one generated function,
    // and Spark fell back to interpreted silently. CODEGEN_ONLY + no-fallback
    // makes any recurrence a hard test failure instead.
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val bucketCols = (0 until 8).map { t =>
        graft.operators.Similarity.hyperplaneSig($"v", 16, 6, t).as(s"b$t")
      }
      val out = vecs.select(($"id" +: bucketCols): _*)
      assert(out.count() == 50)
      // plus the fused cosine beside a dot product in the same projection
      val mixed = vecs.as("a").join(vecs.as("b"), $"a.id" < $"b.id")
        .select(
          VectorExpressions.cosineSim($"a.v", $"b.v").as("c"),
          VectorExpressions.dotProduct($"a.v", $"b.v").as("d"),
          VectorExpressions.cosineSim($"b.v", $"a.v").as("c2"))
      assert(mixed.where($"c" =!= $"c2").count() == 0)
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("native L2Squared is bit-identical to the HOF formulation") {
    val both = vecs.as("a").join(vecs.as("b"), $"a.id" < $"b.id")
      .select(
        VectorExpressions.l2Squared($"a.v", $"b.v").as("native"),
        VectorExpressions.l2SquaredHof($"a.v", $"b.v").as("hof"))
    assert(both.where($"native" =!= $"hof").count() == 0)
    assert(both.where($"native" > 0d).count() > 0)
  }

  test("type check rejects non-array arguments") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("x", "y")
        .select(VectorExpressions.cosineSim($"x", $"y")).collect()
    }
    assert(e.getMessage.contains("array<double>") ||
      e.getMessage.toLowerCase.contains("datatype"))
  }
}
