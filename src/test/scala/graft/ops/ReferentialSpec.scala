package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReferentialSpec extends SparkSpec {
  import spark.implicits._
  import Referential._

  private def parent = Seq(1L, 2L, 3L).toDF("pk")
  private def child = Seq(
    (1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"), (9L, "e"), (7L, "f")
  ).toDF("ck", "v")

  test("audit counts orphan keys and rows exactly") {
    val r = audit(Seq(Fk("c->p", child, "ck", parent, "pk")))
      .as[(String, Long, Long, Long, Long, Int)].collect().toSeq
    // 6 rows, 4 distinct keys; 9 (2 rows) and 7 (1 row) are orphans
    assert(r === Seq(("c->p", 6L, 4L, 3L, 2L, 0)))
  }

  test("clean constraint reports ok=1 and zero orphans") {
    val clean = child.where(col("ck") <= 2)
    val r = audit(Seq(Fk("clean", clean, "ck", parent, "pk")))
      .as[(String, Long, Long, Long, Long, Int)].collect().toSeq
    assert(r === Seq(("clean", 3L, 2L, 0L, 0L, 1)))
  }

  test("null child keys are excluded, not violations") {
    val withNull = child.withColumn("ck",
      when(col("v") === "f", lit(null)).otherwise(col("ck")))
    val r = audit(Seq(Fk("n", withNull, "ck", parent, "pk")))
      .as[(String, Long, Long, Long, Long, Int)].collect().toSeq
    assert(r === Seq(("n", 5L, 3L, 2L, 1L, 0)))
  }

  test("multiple constraints union into one report") {
    val r = audit(Seq(
      Fk("a", child, "ck", parent, "pk"),
      Fk("b", child.where(col("ck") === 1), "ck", parent, "pk")))
    assert(r.count() === 2)
    assert(r.select("fk").as[String].collect().toSet === Set("a", "b"))
  }
}
