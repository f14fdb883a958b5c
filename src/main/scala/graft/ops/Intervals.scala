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

  /** FIFO lot matching WITHOUT a sequential fold: first-in-first-out
    * consumption (inventory costing, capacity draw-down, token-budget
    * burn) looks like a per-key queue recurrence, but over INTEGER
    * quantities it is exactly an interval intersection of two prefix-sum
    * axes — lot i occupies units [lot_lo, lot_hi) of the key's
    * cumulative inflow, sale j consumes units [sale_lo, sale_hi) of the
    * same axis, and FIFO allocates their overlap. That turns the queue
    * into two windows + one per-key interval join: fully declarative,
    * no mapPartitions state (contrast ops.Recurrence, whose recurrences
    * have no such unrolling).
    *
    * Scale shape: one window each side (the same shuffle any per-key
    * ordering costs), then a key-equi join whose per-key pair space is
    * near-diagonal (each sale overlaps few lots; a pathological
    * single-key feed would compose with the q36 interval-binning join).
    * Quantities MUST be integral — prefix sums are exact longs, overlap
    * arithmetic never touches floats; `costCol` (per-unit) stays double
    * and multiplies the integer overlap at the end.
    *
    * Returns the match grain: (key, lot order cols…, sale order cols…,
    * units, alloc_cost = units · lot unit cost). Unmatched demand =
    * sale units beyond the key's total inflow simply has no row —
    * callers compare Σ units to the sale totals for shortage reports. */
  def fifoMatch(lots: DataFrame, sales: DataFrame, keyCol: String,
                qtyCol: String, costCol: String,
                orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    def axis(df: DataFrame, prefix: String, extra: Seq[String]) = {
      val named = (Seq(keyCol) ++ orderCols ++ extra).distinct
      df.select(named.map(col): _*)
        .withColumn("__hi", sum(col(qtyCol).cast("long")).over(w))
        .withColumn("__lo", col("__hi") - col(qtyCol).cast("long"))
        .select((Seq(col(keyCol).as(s"${prefix}_key")) ++
          orderCols.map(c => col(c).as(s"${prefix}_$c")) ++
          extra.filterNot(e => (Seq(keyCol) ++ orderCols).contains(e))
            .map(c => col(c).as(s"${prefix}_$c")) :+
          col("__lo").as(s"${prefix}_lo") :+
          col("__hi").as(s"${prefix}_hi")): _*)
    }
    val l = axis(lots, "lot", Seq(qtyCol, costCol))
    val s = axis(sales, "sale", Seq(qtyCol))
    l.join(s,
        col("lot_key") === col("sale_key") &&
          col("lot_lo") < col("sale_hi") && col("sale_lo") < col("lot_hi"))
      .withColumn("units",
        least(col("lot_hi"), col("sale_hi")) -
          greatest(col("lot_lo"), col("sale_lo")))
      .withColumn("alloc_cost", col("units") * col(s"lot_$costCol"))
      .withColumnRenamed("lot_key", "key")
      .drop("sale_key")
  }
}
