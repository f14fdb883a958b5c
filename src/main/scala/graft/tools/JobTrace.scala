package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query and print EVERY job with its wall duration and
  * call site — the driver-action census StageStats' aggregate counters
  * can't give (which specific actions a ladder query spends its fixed
  * costs on).
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null)
          done.add((e.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
      }
    })
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 2) {
      graft.PinnedFrames.release(); spark.catalog.clearCache()
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq.sortBy(_._1)
      println(f"[jobtrace] $name run $i: wall $wall%.2f s, ${jobs.size} jobs, " +
        f"sum-of-job-walls ${jobs.map(_._2).sum}%.2f s")
      if (i == 2) {
        jobs.foreach { case (id, d, site) =>
          println(f"[jobtrace]   job $id%4d $d%7.3f s  $site")
        }
        val bySite = jobs.groupBy(_._3).map { case (s, js) =>
          (s, js.size, js.map(_._2).sum) }.toSeq.sortBy(-_._3)
        println("[jobtrace] by call site:")
        bySite.foreach { case (s, n, t) =>
          println(f"[jobtrace]   $t%7.3f s over $n%3d jobs  $s")
        }
      }
    }
    spark.stop()
  }
}
