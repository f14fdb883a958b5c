package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args; round <- 1 to 2) {
      graft.operators.Dedup.releaseSpanCaches()
      graft.operators.Graph.releaseGraphCaches()
      graft.PinnedFrames.release()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name round $round: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
