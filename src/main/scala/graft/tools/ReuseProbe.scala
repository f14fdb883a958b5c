package graft.tools
import org.apache.spark.sql.SparkSession
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q212_sql_minhash_pairs")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("HAS_REUSE=" + plan.contains("ReusedExchange"))
    println(plan.split('\n').take(30).mkString("\n"))
    graft.PinnedFrames.release()
    spark.catalog.clearCache()
    spark.stop()
  }
}
