package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: steady-state timing for one query (3 runs, noop sink). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // SPARK_GRAFT_SHUFFLE overrides the partition count — for measuring
    // whether a query's scaling is partition-volume-bound (a real cluster
    // scales partitions with input splits; local[32] holds them fixed)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    // SPARK_GRAFT_CODEC: shuffle/spill compression codec for same-window
    // A/Bs (guide §9 — e.g. lz4 vs zstd at sf1+, where shuffle volumes are
    // big enough to measure honestly). Dev knob only; Bench is untouched.
    val codec = sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", Runners.tempWarehouse()).master("local[32]")
      .config("spark.io.compression.codec", codec)
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names share one warmed JVM (steady-state protocol)
    name.split(',').foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        println(f"[profile] $n run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
      graft.PinnedFrames.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
