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
    // process-unique warehouse: queries that stage MANAGED tables
    // (q120/q127/q150/q165... incremental/MV/time-travel paths) use fixed
    // table names, so two concurrent runner JVMs sharing ./spark-warehouse
    // would race on the same table directories (observed: a concurrent
    // sf0.001 Verify corrupting a sf0.1 Verify's q127 history)
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString).master("local[32]")
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
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
