package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev probe: why doesn't OptimizeSkewedJoin fire at test scale? */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    org.apache.log4j.LogManager.getLogger("org.apache.spark.sql.execution.adaptive")
      .setLevel(org.apache.log4j.Level.DEBUG)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val skewed = spark.range(200000).select(lit(0L).as("k"),
        concat(md5(col("id").cast("string")), md5((col("id") + 1).cast("string"))).as("a"))
      .union(spark.range(46000).select((col("id") % 23 + 1).as("k"),
        concat(md5(col("id").cast("string")), md5((col("id") + 2).cast("string"))).as("a")))
    val dim = spark.range(0, 24).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("b"))
    val joined = skewed.join(dim, "k")
      .agg(count(lit(1)).as("n"), max(length(col("b"))).as("m"), max(length(col("a"))).as("la"))
    println("RESULT: " + joined.head())
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.get
    println("==== FINAL ADAPTIVE PLAN ====")
    println(adaptive.executedPlan.toString)
    spark.stop()
  }
}
