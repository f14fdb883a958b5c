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

  test("HLL sketch state merges: daily sketch union == one-shot sketch estimate") {
    // the incremental-distinct companion to q77's algebraic merge: HLL
    // registers combine by max, so per-day sketch states union to exactly
    // the one-shot sketch — distinct counts can be maintained per partition
    // at 100 TB and merged without rescanning history
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val oneShot = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(merged == oneShot) // identical sketch state, not just close
    val exact = ev.select("user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.1)
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
