package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-based operators (SURVEY.md §2.7).
  *
  * One shuffle on the partition keys per window; when several of these run
  * over the same keys Catalyst reuses the exchange, so chaining them is cheap.
  */
object Windows {

  /** W1 — "last N games": rank rows per group by `order` descending, keep
    * rank <= n (reference: ADAPTERS/SILVER-adapter-wyscout.py:436-451).
    *
    * Uses `rank()` (not `row_number`) to preserve the reference's tie
    * semantics — ties share a rank, so >n rows can survive on ties
    * (SURVEY.md §7.4 item 4). `strict = true` switches to `row_number`
    * with `tieBreak` columns for a deterministic exactly-n variant.
    */
  def lastN(df: DataFrame, partitionCols: Seq[String], order: Column, n: Int,
            strict: Boolean = false, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy((order +: (if (strict) tieBreak else Nil)): _*)
    val rk = if (strict) row_number() else rank()
    df.withColumn("__rk", rk.over(w)).where(col("__rk") <= n).drop("__rk")
  }

  /** A7 — argmax-per-group dedup: keep the single best row per key by
    * `order` (desc) with explicit deterministic tie-breaks — the engine's
    * replacement for pandas `groupby().idxmax()` / order-dependent
    * `drop_duplicates(keep='last')` (reference:
    * DEPRECATED/statsbomb-silver.py:221-224; SURVEY.md W5 determinism note).
    */
  def keepBest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** A8 — cumcount: 0-based position of each row within its group in the
    * given order (reference: DEPRECATED/statsbomb-gold-temp-v2.py:296-300,
    * used to suffix duplicate player names). */
  def cumcount(df: DataFrame, keys: Seq[String], order: Seq[Column],
               as: String = "cumcount"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(as, row_number().over(w) - 1)
  }

  /** Global 1-based position under a total order — `row_number() OVER
    * (ORDER BY ...)` without the single-partition window that formulation
    * plans (every row through one task: the classic 100 TB deadstop).
    * Range-partition on the sort key, then global pos = per-partition
    * row_number + the exclusive prefix sum of partition counts (the
    * two-pass zipWithIndex recipe, kept in the DataFrame API):
    * range partitions are disjoint intervals of the total order, so
    * offset + local rank IS the global rank, for any partition count
    * (WindowsSpec pins 1 vs 3 vs 7). The offsets frame is
    * partition-count-sized; the only per-row work is one local sort.
    * `sortCols` must be a total order (include a unique id). */
  def globalIndex(df: DataFrame, sortCols: Seq[String], as: String = "pos",
                  numParts: Int = 0): DataFrame = {
    val n = if (numParts > 0) numParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted: __pid alignment between the offsets subtree and the final
    // join must not depend on exchange reuse (see sessionizeGlobal — same
    // dual-reference pattern). Caller-released (PinnedFrames).
    val parted = graft.PinnedFrames.pin(
      df.repartitionByRange(n, sortCols.map(col): _*)
        .withColumn("__pid", spark_partition_id())
        .persist())
    val pw = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // partition-count-sized frame: the unpartitioned window is over ≤ n rows
    val offsets = parted.groupBy("__pid").count()
      .withColumn("__off", coalesce(sum("count").over(pw), lit(0L)))
      .drop("count")
    val lw = Window.partitionBy("__pid").orderBy(sortCols.map(col): _*)
    parted.join(broadcast(offsets), "__pid")
      .withColumn(as, row_number().over(lw).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }

  /** 2-D skyline (Pareto frontier) per group: keep rows not DOMINATED
    * within their group, where s dominates r iff s.minimize ≤ r.minimize
    * ∧ s.maximize ≥ r.maximize with at least one strict — the classic
    * "cheapest AND biggest" shortlist query.
    *
    * In 2-D the O(n²) dominance test collapses to sorted running maxima,
    * and that in turn collapses to ONE aggregate + one window over the
    * (group, minimize)-grain frame — usually orders of magnitude smaller
    * than the row grain: a row survives iff it carries its minimize-
    * value's max `maximize` (no same-cost strictly-better row) AND beats
    * the running max over all strictly smaller minimize values (no
    * cheaper at-least-as-good row). Equal (minimize, maximize) twins
    * don't dominate each other and both survive. The row-grain table is
    * scanned once; the window sorts only the value-grain frame.
    * (d > 2 has no such reduction — the general form is local-skyline
    * per partition then re-skyline of the union, which dominance
    * transitivity makes exact; 2-D is the overwhelmingly common report.)
    *
    * Returns the input rows of the frontier, plus nothing else. */
  def skyline2D(df: DataFrame, groupCol: String, minimizeCol: String,
                maximizeCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol).as("__g"), col(minimizeCol).as("__m"))
      .agg(max(col(maximizeCol)).as("__gmax"))
    val pw = Window.partitionBy("__g").orderBy("__m")
      .rowsBetween(Window.unboundedPreceding, -1)
    val g2 = g.withColumn("__prevmax", max(col("__gmax")).over(pw))
    df.join(g2,
        col(groupCol) === col("__g") && col(minimizeCol) === col("__m"))
      .where(col(maximizeCol) === col("__gmax") &&
        (col("__prevmax").isNull || col("__prevmax") < col(maximizeCol)))
      .drop("__g", "__m", "__gmax", "__prevmax")
  }
}
