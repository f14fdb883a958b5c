package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew handling pinned with evidence, not prose: a deliberately
  * skewed join (one key at ~100× the median) must actually trigger the
  * runtime skew split, and the engine's own observe()-gated hot-bucket
  * cap must fire measurably on a skewed band fixture. SCALE.md cites both
  * as the 100 TB skew backstops. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join (plan-verified) and flattens task times") {
    // key 0: 200k rows (~100× the per-key median of 2k); 23 tail keys.
    // md5 payloads: shuffle blocks are lz4-compressed, so a repetitive
    // payload would keep the skewed partition under any byte threshold
    val skewed = spark.range(200000).select(lit(0L).as("k"),
        concat(md5(col("id").cast("string")), md5((col("id") + 1).cast("string"))).as("a"))
      .union(spark.range(46000).select((col("id") % 23 + 1).as("k"),
        concat(md5(col("id").cast("string")), md5((col("id") + 2).cast("string"))).as("a")))
    val dim = spark.range(0, 24).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("b"))

    def runJoin(skewEnabled: Boolean): (Boolean, Int, Seq[Long]) = {
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          durations.add(t.taskInfo.duration)
      }
      spark.sparkContext.addSparkListener(listener)
      try withConf(
        "spark.sql.adaptive.skewJoin.enabled" -> skewEnabled.toString,
        // test-scale thresholds: the default 256 MB trigger needs real
        // data; semantics are identical
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val joined = skewed.join(dim, "k")
          .agg(count(lit(1)).as("n"), max(length(col("b"))).as("m"),
            // keep the payload alive through the join: column pruning would
            // otherwise shuffle only the (constant) key, leaving nothing
            // skewed in bytes
            max(length(col("a"))).as("la"))
        // collect() (not head()) — head() spawns a separate limit
        // QueryExecution, leaving `joined.queryExecution` unexecuted and
        // its adaptive plan stuck at the initial (no-skew) physical plan
        assert(joined.collect()(0).getLong(0) === 246000L)
        // string-based inspection: after execution the adaptive plan nests
        // inside leaf QueryStageExec nodes, so collect() can't reach the
        // join operator — the tree STRING still renders stage contents
        val planStr = joined.queryExecution.executedPlan.toString
        val isSkew = planStr.contains("SortMergeJoin(skew=true)") ||
          planStr.contains("ShuffledHashJoin(skew=true)")
        val splits = planStr.linesIterator
          .filter(_.contains("AQEShuffleRead"))
          .map(l => if (l.contains("skewed")) 1 else 0).sum
        graft.GraftTestBridgeFwd.drain(spark)
        (isSkew, splits,
          durations.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq)
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    val (skewOff, _, durOff) = runJoin(skewEnabled = false)
    val (skewOn, skewReads, durOn) = runJoin(skewEnabled = true)
    assert(!skewOff)
    assert(skewOn, "OptimizeSkewedJoin must mark the SMJ as a skew join")
    assert(skewReads >= 1, "at least one AQEShuffleRead must carry skewed splits")
    // the headline number: max task time flattens toward the median
    def spread(ds: Seq[Long]): Double = {
      val s = ds.sorted
      if (s.isEmpty || s(s.size / 2) == 0) 0.0
      else s.last.toDouble / math.max(1.0, s(s.size / 2).toDouble)
    }
    info(f"task-time max/median: skewJoin OFF ${spread(durOff)}%.1f× " +
      f"(max ${durOff.max} ms) vs ON ${spread(durOn)}%.1f× (max ${durOn.max} ms)")
  }

  test("capHotBuckets: the observe() gate fires with measured drop counts on a hot band") {
    import graft.operators.Dedup
    // 60 docs share one band signature (the boilerplate bucket: identical
    // text), 10 docs are distinct — cap 10 must drop the hot bucket and
    // report (1 bucket, 60 band rows × its bands) through the observation
    val hot = (0 until 60).map(i => (i.toLong, "common boilerplate header text shared by every page of the crawl"))
    val cold = (0 until 10).map(i => ((100 + i).toLong, s"unique document number $i with its own words ${"x" * i}"))
    val docs = (hot ++ cold).toDF("doc_id", "text")

    val observed = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("capHotBuckets:") && !row.isNullAt(0))
            observed.put(name, (row.getLong(0), row.getLong(1)))
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignatures(sh, "doc_id", 16)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4,
        maxBucketSize = Some(10)).collect()
      graft.GraftTestBridgeFwd.drain(spark)
      // no hot-bucket doc can pair through the dropped band, and the 60-doc
      // clique (1770 pairs × 4 bands) never reaches the join
      assert(!pairs.exists(r => r.getLong(0) < 60 && r.getLong(1) < 60))
      val caps = observed.values.toArray.map(_.asInstanceOf[(Long, Long)])
      assert(caps.nonEmpty, "the capHotBuckets observation must fire")
      val (buckets, rows) = caps.maxBy(_._2)
      // all 4 bands of the identical docs collapse to hot buckets
      assert(buckets === 4L)
      assert(rows === 240L) // 60 docs × 4 band rows
      info(s"cap gate measured: dropped $buckets hot buckets covering $rows band rows")
    } finally spark.listenerManager.unregister(listener)
  }
}
