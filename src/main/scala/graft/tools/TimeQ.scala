package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: cold-run timing for registry queries (fresh caches per round,
  * noop sink). The sf10 measurement harness behind SCALE.md's ratio
  * tables.
  *
  * Self-consistency gate (the Bench gate, adopted for sf10 rows): this
  * host has multi-second CPU-steal stalls, and SCALE.md's sf10 entries
  * were single measurements. When `SPARK_GRAFT_BENCH_BASELINE` names
  * per-query reference files (a prior sf10 run's log converted to the
  * bench JSON shape, or any file containing "name":seconds pairs), any
  * query whose BEST round exceeds 1.5× its reference is re-measured once
  * more, and the gate's involvement is printed — a stall has to cover
  * every round to survive into a committed table. Missing baseline files
  * warn loudly (Runners.parseBenchBaseline).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baseline = graft.Runners.parseBenchBaseline()
    val noiseBand = 1.5
    for (name <- args) {
      def once(round: Int): Double = {
        graft.operators.Dedup.releaseSpanCaches()
        graft.operators.Graph.releaseGraphCaches()
        graft.PinnedFrames.release()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[timeq] $name round $round: $dt%.2f s")
        dt
      }
      var best = math.min(once(1), once(2))
      baseline.get(name) match {
        case Some(b) if b > 0 && best > b * noiseBand =>
          println(f"[timeq] $name consistency gate: best $best%.2f s > " +
            f"$noiseBand×baseline ${b}%.2f s — re-measuring")
          best = math.min(best, once(3))
        case _ =>
      }
      println(f"[timeq] $name best: $best%.2f s")
    }
    spark.stop()
  }
}
