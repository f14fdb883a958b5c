package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(String, String)]) = {
    val e = pairs.toDF("src", "dst")
    e.union(e.select(col("dst"), col("src")))
  }

  test("two cliques joined by nothing converge to two communities") {
    // K3 {a,b,c} and K3 {x,y,z}
    val edges = sym(Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("x", "y"), ("x", "z"), ("y", "z")))
    val labels = Graph.labelPropagation(edges, rounds = 4)
      .as[(String, String)].collect().toMap
    assert(Set("a", "b", "c").map(labels) === Set(labels("a")))
    assert(Set("x", "y", "z").map(labels) === Set(labels("x")))
    assert(labels("a") !== labels("x"))
  }

  test("ties break to the MAX label deterministically") {
    // path a-b-c after 1 round: b sees {a,c} equally often → picks "c"
    val edges = sym(Seq(("a", "b"), ("b", "c")))
    val labels = Graph.labelPropagation(edges, rounds = 1)
      .as[(String, String)].collect().toMap
    assert(labels("b") === "c")
    assert(labels("a") === "b") // a's only neighbor is b
    assert(labels("c") === "b")
  }

  test("result is partition-count invariant") {
    val pairs = (0 until 40).map(i => (s"n${i % 10}", s"n${(i * 7) % 10}"))
      .filter { case (a, b) => a != b }
    val e = sym(pairs)
    val one = Graph.labelPropagation(e.coalesce(1), 3)
      .as[(String, String)].collect().toMap
    val many = Graph.labelPropagation(e.repartition(7), 3)
      .as[(String, String)].collect().toMap
    assert(one === many)
  }
}
