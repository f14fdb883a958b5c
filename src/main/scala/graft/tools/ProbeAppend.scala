package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the incremental-ANN cost claim, measured directly — the
  * daily-append path (assign the appended shard to EXISTING centroids +
  * the drift report) vs the full rebuild (Lloyd over the whole corpus).
  * q221/q222 both include base training for oracle replay, so their bench
  * rows cannot separate the two costs; this probe does.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProbeAppend
  */
object ProbeAppend {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = emb.where(expr("vec_id % 10 < 8"))
    val appended = emb.where(expr("vec_id % 10 >= 8"))
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probeappend] $what%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // one warm pass so JIT/scan caches don't bias the first timed block
    emb.count(): Unit
    for (round <- 1 to 2) {
      val cents = time(s"train base (round $round)") {
        graft.operators.Similarity.trainCentroids(base, "vec_id", "embedding", 16, 3)
      }
      time(s"REBUILD: train full ($round)") {
        graft.operators.Similarity.trainCentroids(emb, "vec_id", "embedding", 16, 3)
      }
      time(s"APPEND: assign shard ($round)") {
        graft.operators.Similarity.assignCells(appended, "vec_id", "embedding", cents)
          .select("vec_id", "cell").write.format("noop").mode("overwrite").save()
      }
      time(s"APPEND: drift report ($round)") {
        graft.operators.Similarity.centroidDriftReport(base, appended,
          "vec_id", "embedding", cents)
          .write.format("noop").mode("overwrite").save()
      }
      graft.PinnedFrames.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
