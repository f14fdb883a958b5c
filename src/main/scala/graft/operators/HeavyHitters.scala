package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.catalyst.FreqSketchAgg

/** Exact heavy hitters at sketch cost: the canonical two-pass plan for
  * "which keys exceed 1/T of all traffic" over data whose key universe is
  * too large to groupBy-count wholesale.
  *
  * Pass 1 — candidates: one full scan aggregated into a single k-counter
  * Misra–Gries sketch ([[graft.functions.catalyst.FreqSketchAgg]]).
  * Partial aggregation applies: each input partition folds into its own
  * k-bounded buffer map-side, and the final merge combines ≤ nPartitions
  * sketches of ≤ k counters each — the shuffle volume is O(partitions · k),
  * independent of both row count and key cardinality. With k ≥ T, the MG
  * merge guarantee (freq > n/(k+1) ⇒ key survives) makes the candidate set
  * a superset of every true heavy hitter.
  *
  * Pass 2 — verify: exact counts for the ≤ k candidates only. The
  * candidate array is sketch-bounded (≤ k keys — config-sized by
  * construction, NOT data-sized), so collecting it to the driver for an
  * `isin` pushdown is safe at any corpus size; the filtered exact count
  * then aggregates a tiny keyed subset. Output = exactly the keys with
  * count·T > n, with their exact counts — sketch error never reaches the
  * result.
  *
  * Reference analogue: frequency cuts in the profiling path
  * (DEPRECATED/data_profiler.py value_counts); re-expressed as the
  * scale-safe sketch+verify plan instead of a full value_counts.
  */
object HeavyHitters {

  /** Keys of `keyCol` (long-typed) whose exact count strictly exceeds
    * n/threshold, with exact counts. `k` is the sketch width; require
    * k >= threshold so the MG guarantee covers the cut. */
  def exactHeavyHitters(spark: SparkSession, df: DataFrame, keyCol: String,
                        threshold: Int, k: Int): DataFrame = {
    require(k >= threshold, s"sketch width k=$k must be >= threshold=$threshold")
    val sketchRow = df.agg(
      FreqSketchAgg.freqSketch(col(keyCol).cast("long"), k).as("cand"),
      count(lit(1)).as("n")).head()
    val candidates: Seq[Long] = sketchRow.getSeq[Long](0)
    val n = sketchRow.getLong(1)
    df.where(col(keyCol).isin(candidates: _*))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(threshold.toLong) > lit(n))
      .withColumn("n_total", lit(n))
  }
}
