package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CvFoldsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 103L).map(i => (i, if (i % 3 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("per-stratum fold sizes are exactly balanced (±1)") {
    val sizes = Curation.cvFolds(docs, "id", "lang", k = 5)
      .groupBy("lang", "fold").count()
      .select("lang", "count").as[(String, Long)].collect()
    sizes.groupBy(_._1).foreach { case (_, s) =>
      val counts = s.map(_._2)
      assert(counts.max - counts.min <= 1, s"unbalanced: ${s.toSeq}")
    }
  }

  test("every row gets exactly one fold in [0, k)") {
    val out = Curation.cvFolds(docs, "id", "lang", k = 5)
    assert(out.count() === 103)
    assert(out.where(col("fold") < 0 || col("fold") >= 5).count() === 0)
  }

  test("assignment is deterministic and partition-invariant") {
    val a = Curation.cvFolds(docs.repartition(7), "id", "lang", 5)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    val b = Curation.cvFolds(docs.coalesce(1), "id", "lang", 5)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("different salts shuffle differently") {
    val a = Curation.cvFolds(docs, "id", "lang", 5, salt = "cv")
      .select("id", "fold").as[(Long, Long)].collect().toMap
    val b = Curation.cvFolds(docs, "id", "lang", 5, salt = "cv2")
      .select("id", "fold").as[(Long, Long)].collect().toMap
    assert(a !== b)
  }
}
