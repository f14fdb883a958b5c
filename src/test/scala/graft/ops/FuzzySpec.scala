package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq(
    (1L, "red widget", "B1"),
    (2L, "red widgit", "B1"),   // dist 1, same block → pair
    (3L, "red widget", "B2"),   // dist 0 but other block → no pair
    (4L, "blue bolt", "B1"),    // far from everything
    (5L, "red widgets", "B1"))  // dist 1 to #1, 2 to #2
    .toDF("id", "name", "brand")

  test("blocked fuzzy self-join finds within-block pairs under the cutoff") {
    val out = Fuzzy.blockedSelfJoin(parts, "id", "name", "brand", 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1), (1L, 5L, 1), (2L, 5L, 2)))
  }

  test("length-band prune never changes the result (lev >= |Δlen|)") {
    // vs the same join without the band predicate: identical pairs
    val a = parts.select(col("id").as("id_a"), col("name").as("str_a"),
      col("brand").as("block"))
    val b = parts.select(col("id").as("id_b"), col("name").as("str_b"),
      col("brand").as("block"))
    val unpruned = a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .where(levenshtein(col("str_a"), col("str_b")) <= 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val pruned = Fuzzy.blockedSelfJoin(parts, "id", "name", "brand", 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pruned == unpruned)
  }
}
