package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.catalyst.KmvSketchAgg

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(keys: Seq[String]) =
    keys.toDF("k")
      .withColumn("h", expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)"))

  test("sketch is the K smallest distinct hashes, ascending, invariant to " +
    "partitioning and row multiplicity") {
    val keys = (0 until 500).map(i => s"key-$i")
    val withDups = keys ++ keys.take(200) ++ keys.take(50)
    val df = hashed(withDups).cache()
    try {
      val expected = df.select("h").as[Long].collect()
        .distinct.sorted.take(KmvSketchAgg.K).toSeq
      for (parts <- Seq(1, 7)) {
        val got = df.repartition(parts)
          .agg(KmvSketchAgg.kmvSketch($"h").as("s"))
          .head.getSeq[Long](0)
        assert(got == expected, s"parts=$parts")
      }
    } finally df.unpersist()
  }

  test("bottom-k is closed under union: merge of per-group sketches equals " +
    "the sketch of the union") {
    val a = hashed((0 until 300).map(i => s"key-$i")).withColumn("g", lit("a"))
    val b = hashed((150 until 450).map(i => s"key-$i")).withColumn("g", lit("b"))
    val all = a.unionByName(b)
    val perGroup = all.groupBy("g").agg(KmvSketchAgg.kmvSketch($"h").as("s"))
    val merged = perGroup
      .agg(expr(s"slice(array_sort(array_distinct(flatten(collect_list(s)))), 1, ${KmvSketchAgg.K})")
        .as("s"))
    val direct = all.agg(KmvSketchAgg.kmvSketch($"h").as("s"))
    assert(merged.head.getSeq[Long](0) == direct.head.getSeq[Long](0))
  }

  test("small sets are captured exactly (sketch == full distinct hash set)") {
    val df = hashed((0 until 20).map(i => s"key-$i"))
    val s = df.agg(KmvSketchAgg.kmvSketch($"h").as("s")).head.getSeq[Long](0)
    val expected = df.select("h").as[Long].collect().distinct.sorted.toSeq
    assert(s == expected)
  }

  test("union/Jaccard estimators from sketches land in the error band") {
    // |A| = 2000, |B| = 2000, overlap 1000 → union 3000, J = 1/3
    val a = hashed((0 until 2000).map(i => s"key-$i")).withColumn("g", lit("a"))
    val b = hashed((1000 until 3000).map(i => s"key-$i")).withColumn("g", lit("b"))
    val sk = a.unionByName(b).groupBy("g")
      .agg(KmvSketchAgg.kmvSketch($"h").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val k = KmvSketchAgg.K
    val u = (sk("a") ++ sk("b")).distinct.sorted.take(k)
    val theta = u.last
    val estUnion = (k - 1).toDouble * math.pow(2, 60) / theta.toDouble
    val m = u.count(x => sk("a").contains(x) && sk("b").contains(x))
    val estJ = m.toDouble / k
    assert(math.abs(estUnion - 3000.0) / 3000.0 < 0.5, s"estUnion=$estUnion")
    assert(math.abs(estJ - 1.0 / 3) < 0.25, s"estJ=$estJ")
  }
}
