package graft.expr

import java.nio.file.Files
import graft.SparkSpec

class FeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  test("compile: valid specs become named columns; all failures reported at once") {
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
