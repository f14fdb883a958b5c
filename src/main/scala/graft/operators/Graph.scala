package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.queries.Qutil.dround

/** Iterative graph analytics over an edge list — PageRank as the
  * representative fixed-point operator (entity-importance ranking over
  * interaction graphs; the corpus-side cousin is `Dedup.duplicateClusters`'
  * connected components).
  *
  * Scale shape: the per-iteration work is one join of edges⋈ranks on the
  * source key plus one destination-grain aggregate — the canonical Spark
  * PageRank plan. Edges are hash-partitioned on src once and persisted, so
  * every iteration's join reuses the same exchange; ranks (node-grain,
  * ≪ edges) flow to the edge partitioning. Dangling nodes contribute
  * nothing and keep the (1−d) floor. Every `rebaseEvery` rounds the rank
  * frame is lineage-rebased (`Dedup.rebased`), persisted and materialized,
  * and the previous checkpoint released — the `duplicateClusters`
  * discipline (measured there: ×3 plan growth per round otherwise), so
  * per-round plan size and wall time stay flat at 30+ iterations
  * (GraphSpec pins this). As in duplicateClusters, the last checkpoint
  * backs the returned frame and stays persisted.
  *
  * Determinism (the oracle replays every iteration as a chained CTE):
  * per-edge contributions are floor-scale-rounded at `scale` decimals
  * (Qutil.dround — identical IEEE ops in both engines), then summed as
  * exact DECIMAL so partition/summation order can never shift a bit; the
  * damped update re-rounds. Rank values therefore stay on the `scale`-dp
  * grid at every step.
  */
object Graph {

  /** `iters` damped PageRank rounds over directed (src, dst) edges.
    * Returns (node, rank). Rank init = 1.0 per node; dangling nodes decay
    * to (1 − damping). */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
               scale: Int = 9, rebaseEvery: Int = 5): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
    // outdeg is per-src static — fold it into the persisted edge table once
    // so each iteration joins ranks exactly once (not ranks + outdeg)
    val e = e0.join(
        e0.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    var ranks = nodes.withColumn("rank", lit(1.0))
    var pinned: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          dround(col("rank") / col("outdeg"), scale).as("c"))
      val sums = contribs.groupBy("node")
        .agg(sum(col("c").cast(DecimalType(38, scale + 3)))
          .cast("double").as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          dround(lit(1.0 - damping) +
            lit(damping) * coalesce(col("s"), lit(0.0)), scale).as("rank"))
      if (i % rebaseEvery == 0 && i < iters) {
        // cut lineage: constant-size plan from here on; one action
        // materializes the checkpoint before the previous one is released
        val r = graft.operators.Dedup.rebased(ranks).persist()
        r.count(): Unit
        pinned.foreach(_.unpersist())
        pinned = Some(r)
        ranks = r
      }
    }
    ranks
  }
}
