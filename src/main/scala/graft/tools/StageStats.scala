package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query and report scheduler-level shape — #jobs,
  * #stages, #tasks, summed task time vs wall time. A query whose wall time
  * is several× its task time is stage-latency-bound (deep DAG over small
  * data), not compute-bound; that distinction decides whether the fix is
  * plan surgery or kernel work.
  */
object StageStats {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // default false = the Bench/Verify protocol. true lets AQE coalesce
      // cache-build partitions (fixture-scale caches stop costing 32 tasks
      // a stage) but BREAKS cached co-partitioning contracts: measured on
      // q73_pagerank, the flag adds 6 jobs/iteration-loop (the persisted
      // edge table loses its HashPartitioning and every iteration
      // re-shuffles it) — at scale that's the big side, so the flag stays
      // off and this knob exists only for diagnosis.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val info = s.stageInfo
        val ms = Option(info.taskMetrics).map(_.executorRunTime).getOrElse(0L)
        val deser = Option(info.taskMetrics).map(_.executorDeserializeTime).getOrElse(0L)
        perStage.put(info.stageId,
          (s"${info.name.takeWhile(_ != '\n').take(60)} run=${ms}ms deser=${deser}ms",
            ms + deser, info.numTasks))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 2) {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat before reading counters
      Thread.sleep(1000)
      println(f"[stagestats] $name run $i: wall $wall%.2f s, " +
        f"jobs ${jobs.get}, stages ${stages.get}, tasks ${tasks.get}, " +
        f"task-time ${taskMs.get / 1000.0}%.2f s")
      if (i == 2) {
        import scala.jdk.CollectionConverters._
        perStage.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (id, (desc, _, n)) =>
            println(s"[stagestats]   stage $id ($n tasks): $desc")
        }
      }
      perStage.clear()
    }
    // run 2 deliberately reuses run 1's caches (steady-state stage stats);
    // release only after both runs
    graft.PinnedFrames.release()
    spark.catalog.clearCache()
    spark.stop()
  }
}
