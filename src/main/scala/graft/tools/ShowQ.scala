package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: run registry queries at SPARK_GRAFT_SF_DIR, print the result
  * rows (meant for small/1-row report frames — evals, summaries) plus
  * per-round wall time. Complements TimeQ (noop-sink timing only): the
  * sf10 sampled-vs-full eval comparison needs the VALUES, not just the
  * clock. Same cache hygiene as TimeQ. */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "2").toInt
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args; round <- 1 to rounds) {
      graft.operators.Dedup.releaseSpanCaches()
      graft.operators.Graph.releaseGraphCaches()
      graft.PinnedFrames.release()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sf).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[showq] $name round $round: $dt%.2f s, ${rows.length} rows")
      rows.take(20).foreach(r => println(s"[showq]   $r"))
    }
    spark.stop()
  }
}
