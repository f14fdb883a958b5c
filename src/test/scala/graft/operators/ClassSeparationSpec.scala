package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassSeparationSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated 3-d clusters around (0,0,0) and (10,10,10)
  private def emb = Seq(
    (1L, Array(0.1f, 0.0f, -0.1f), 0),
    (2L, Array(-0.1f, 0.1f, 0.0f), 0),
    (3L, Array(0.0f, -0.1f, 0.1f), 0),
    (4L, Array(10.1f, 10.0f, 9.9f), 1),
    (5L, Array(9.9f, 10.1f, 10.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("tight separated clusters: cohesion well below separation") {
    val r = Similarity.classSeparationReport(emb, "vec_id", "embedding", "label")
      .orderBy("label")
      .as[(Int, Long, Double, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(0, 1))
    assert(r.map(_._2).toSeq === Seq(3L, 2L))
    r.foreach { case (_, _, coh, sep) =>
      assert(coh < 0.5, s"cohesion $coh too large for a tight cluster")
      assert(sep > 15.0, s"separation $sep too small for distant clusters")
      assert(coh < sep)
    }
  }

  test("report is partition-count invariant") {
    val a = Similarity.classSeparationReport(emb.repartition(5),
      "vec_id", "embedding", "label").orderBy("label")
      .as[(Int, Long, Double, Double)].collect().toSeq
    val b = Similarity.classSeparationReport(emb.coalesce(1),
      "vec_id", "embedding", "label").orderBy("label")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(a === b)
  }

  test("a singleton label has cohesion 0 and a finite separation") {
    val withSingleton = emb.union(
      Seq((6L, Array(5.0f, 5.0f, 5.0f), 2)).toDF("vec_id", "embedding", "label"))
    val r = Similarity.classSeparationReport(withSingleton,
        "vec_id", "embedding", "label")
      .where(col("label") === 2)
      .as[(Int, Long, Double, Double)].collect().head
    assert(r._2 === 1L && r._3 === 0.0 && r._4 > 0.0)
  }
}
