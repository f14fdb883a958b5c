package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union per key — merge overlapping/touching spans into maximal
  * islands and measure true covered time (the uptime/watch-time/session
  * coverage primitive; double-counting overlaps is the classic bug this
  * operator exists to avoid).
  *
  * Construction is the gaps-and-islands recurrence on ONE key-partitioned
  * window (no self-join, no range join):
  *   1. order spans by (start, end, tiebreak) within the key;
  *   2. running max of `end` over all PRECEDING rows — a span starts a new
  *      island iff its start exceeds that max (strictly: touching spans
  *      merge);
  *   3. prefix-sum the new-island flags → island id; group by (key,
  *      island) for span extents.
  *
  * Scale shape: a single hash-partition-by-key + in-partition sort — the
  * same cost as any windowed aggregation; no shuffle is quadratic in spans
  * and skew in per-key span counts is the only hotspot (a key's spans must
  * sort together — inherent to the semantics). All arithmetic is integer
  * (epoch seconds), so results are engine-exact.
  */
object Intervals {

  /** One row per merged island: key, island_start, island_end, n_spans. */
  def mergeIslands(df: DataFrame, keyCol: String, startCol: String,
                   endCol: String, tiebreakCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol)
    val ordered = byKey.orderBy(col(startCol), col(endCol), col(tiebreakCol))
    val prevMax = max(col(endCol))
      .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("__new_island",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
    flagged
      .withColumn("__island",
        sum(col("__new_island"))
          .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_spans"))
      .drop("__island")
  }

  /** Per-key coverage report: number of maximal islands and total covered
    * units (sum of island lengths — overlaps counted once). */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
               endCol: String, tiebreakCol: String): DataFrame =
    mergeIslands(df, keyCol, startCol, endCol, tiebreakCol)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered"))
}
