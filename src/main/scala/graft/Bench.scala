package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the given scale
  * factor and prints ONE JSON line. Queries are fully materialized through
  * the noop sink — count() would let Catalyst prune away per-row compute
  * (projections, windows) and understate the real cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/session warm-up outside the timed region.
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    // Adaptive min-of-2: first-run JIT and host-level scheduling stalls
    // otherwise dominate individual query timings; queries that already ran
    // fast skip the confirming second run.
    def timeOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = timeOne(name, fn)
      // Drop persisted frames between runs (outside the timed regions): the
      // confirming run must re-pay any persist() the query relies on, and
      // caches from earlier queries must not evict or skew later ones.
      spark.catalog.clearCache()
      val best = if (first > 2.0) {
        val second = math.min(first, timeOne(name, fn))
        spark.catalog.clearCache()
        second
      } else first
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
