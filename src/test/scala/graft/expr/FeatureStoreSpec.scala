package graft.expr

import java.nio.file.Files
import graft.SparkSpec

class FeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  test("compile: valid specs become named columns; all failures reported at once") {
    spark.sparkContext // force session init: compile() parses via the active session
    val cols = FeatureStore.compile(Seq(
      FeatureSpec("a", "sum(x)"), FeatureSpec("b", "count(*)")))
    assert(cols.map(_.toString).exists(_.contains("a")))
    val e = intercept[IllegalArgumentException] {
      FeatureStore.compile(Seq(
        FeatureSpec("bad1", "sum(("), FeatureSpec("ok", "count(*)"),
        FeatureSpec("bad2", "nonsense(((")))
    }
    assert(e.getMessage.contains("2 invalid"))
    assert(e.getMessage.contains("bad1") && e.getMessage.contains("bad2"))
  }

  test("fromCsv round-trip: the feature store is data, not code (A1)") {
    val dir = Files.createTempDirectory("fs").toFile
    val csv = new java.io.File(dir, "features.csv")
    Files.writeString(csv.toPath,
      """feature_name,base_sql
        |totalQty,"sum(q)"
        |maxQty,"max(q)"
        |""".stripMargin)
    val specs = FeatureStore.fromCsv(spark, csv.getAbsolutePath)
    assert(specs == Seq(FeatureSpec("totalQty", "sum(q)"),
      FeatureSpec("maxQty", "max(q)")))
    val df = Seq(("k", 1.0), ("k", 4.0)).toDF("id", "q")
    val out = FeatureStore.aggregate(df, Seq("id"), specs).head()
    assert(out.getDouble(1) == 5.0 && out.getDouble(2) == 4.0)
  }

  test("count(distinct) split plan ≡ fused plan, incl. nulls in keys and values") {
    val df = Seq[(Integer, Integer, Double)](
      (1, 10, 1.0), (1, 10, 2.0), (1, 20, 3.0), (1, null, 4.0),
      (2, null, 5.0), // all-null distinct col → count 0
      (null, 30, 6.0), (null, 30, 7.0)) // null key group
      .toDF("k", "o", "v")
    val specs = Seq(
      FeatureSpec("n", "count(*)"),
      FeatureSpec("nOrders", "count(distinct o)"),
      FeatureSpec("total", "sum(v)"))
    val split = FeatureStore.aggregate(df, Seq("k"), specs)
    val fused = FeatureStore.aggregate(df, Seq("k"), specs, splitDistinct = false)
    // same columns in the same order, same values, null keys included
    assert(split.columns.toSeq == Seq("k", "n", "nOrders", "total"))
    assert(split.orderBy("k").collect().map(_.toSeq).toSeq ==
      fused.orderBy("k").collect().map(_.toSeq).toSeq)
    val m = split.collect()
      .map(r => Option(r.get(0)) -> r.getLong(2)).toMap
    assert(m(Some(1)) == 2L && m(Some(2)) == 0L && m(None) == 1L)
    // and the split plan really avoids Expand
    assert(!split.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("aggregate is order-insensitive to input partitioning (keepBest-style determinism)") {
    val data = (1 to 100).map(i => (i % 5, i.toDouble))
    val a = FeatureStore.aggregate(data.toDF("k", "v"), Seq("k"),
      Seq(FeatureSpec("s", "sum(v)"))).orderBy("k").collect().toSeq
    val b = FeatureStore.aggregate(
      data.reverse.toDF("k", "v").repartition(7), Seq("k"),
      Seq(FeatureSpec("s", "sum(v)"))).orderBy("k").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
