package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Tables

class OlapSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct tracks exact within its rsd bound") {
    val r = Tables.lineitem(spark, sf).agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.1) // 5 sigma of rsd=0.02
  }

  test("rollup emits all grouping-set levels") {
    val out = graft.SparkEntry.queries("q33_rollup_revenue")(spark, sf)
    val levels = out.groupBy(
      col("r_name").isNull.as("rNull"), col("n_name").isNull.as("nNull"))
      .count().collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(levels((true, true)) == 1)          // grand total
    assert(levels((false, true)) == 5)         // one per region
    assert(levels((false, false)) == 25)       // nation detail
  }
}
