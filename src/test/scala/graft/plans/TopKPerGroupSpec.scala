package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def data = {
    // skewed: group 0 holds half the rows (the case where the window
    // formulation's full per-group sort hurts most)
    val rows = (0 until 4000).map { i =>
      val g = if (i % 2 == 0) 0L else (i % 37).toLong
      (g, (i * 2654435761L % 10007).toDouble, i.toLong)
    }
    spark.sparkContext.parallelize(rows, 8).toDF("g", "v", "id")
  }

  test("TopKPerGroup ≡ window row_number formulation (desc order, tie on id)") {
    val df = data
    val got = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 3)
      .select("g", "v", "id").as[(Long, Double, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("g", "v", "id").as[(Long, Double, Long)].collect().toSet
    assert(got == want)
  }

  test("k larger than every group returns everything") {
    val df = data
    val got = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> false, "id" -> false), 100000)
    assert(got.count() == df.count())
  }

  test("plans the custom exec with an exchange but NO sort below it") {
    val df = data
    val plan = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), plan) // exec node (suffix-stripped name)
    assert(plan.contains("Exchange hashpartitioning"), plan) // distribution honored
    assert(!plan.contains("Sort ["), plan) // the whole point: no per-group sort
  }

  test("WindowTopKRewrite: unmodified window top-k user code plans onto the heap exec") {
    val prevOpt = spark.experimental.extraOptimizations
    val prevStrat = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = prevOpt :+ WindowTopKRewrite
    if (!prevStrat.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies = prevStrat :+ TopKPerGroupStrategy
    try {
      val df = data
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
      // the ubiquitous idiom, untouched — rn dropped by the select
      val q = df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3).select("g", "v", "id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup ["), plan)
      assert(!plan.contains("Window"), plan) // the window is gone entirely
      // and the rewrite preserves results exactly
      val direct = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 3)
        .select("g", "v", "id").as[(Long, Double, Long)].collect().toSet
      assert(q.as[(Long, Double, Long)].collect().toSet == direct)
    } finally {
      spark.experimental.extraOptimizations = prevOpt
      spark.experimental.extraStrategies = prevStrat
    }
  }

  test("WindowTopKRewrite does NOT fire when the rank column survives") {
    val prevOpt = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prevOpt :+ WindowTopKRewrite
    try {
      val df = data
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
      val q = df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3).select("g", "rn") // rn is read downstream
      assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
      assert(q.where(col("rn") === 3).count() > 0) // rn values intact
    } finally spark.experimental.extraOptimizations = prevOpt
  }

  test("WindowTopKRewrite is an explicit non-goal for rank(): ties must survive") {
    val prevOpt = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prevOpt :+ WindowTopKRewrite
    try {
      // three-way tie for first place: rank() ≤ 1 keeps all three rows, a
      // heap with k=1 would keep one — rewriting would change results
      val df = Seq((1L, 5.0, 1L), (1L, 5.0, 2L), (1L, 5.0, 3L), (1L, 1.0, 4L))
        .toDF("g", "v", "id")
      val w = Window.partitionBy("g").orderBy(col("v").desc)
      val q = df.withColumn("rk", rank().over(w))
        .where(col("rk") <= 1).select("g", "v", "id")
      assert(q.queryExecution.optimizedPlan.toString.contains("Window"),
        "rule fired on rank()")
      assert(q.count() == 3)
    } finally spark.experimental.extraOptimizations = prevOpt
  }

  test("state bound: many groups in one partition spill sorted runs, results identical") {
    // 5000 groups across 4 partitions ≈ 1250 groups/partition; a 100-row
    // state bound forces repeated heap flushes and a multi-run merge
    val rows = (0 until 20000).map { i =>
      ((i % 5000).toLong, (i * 2654435761L % 10007).toDouble, i.toLong)
    }
    val df = spark.sparkContext.parallelize(rows, 8).toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select("g", "v", "id").as[(Long, Double, Long)].collect().toSet
    // AQE off: metric asserts need the executed node instance, and AQE's
    // stage wrapping re-plans it (toString-based specs above are unaffected)
    withConfs(TopKPerGroupStrategy.MaxStateRowsKey -> "100",
              "spark.sql.adaptive.enabled" -> "false") {
      val q = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 2)
        .select("g", "v", "id")
      // collect from q itself (.as[...] would re-derive a second physical
      // plan and the metric asserts below need the executed instance)
      val got = q.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == want)
      // degradation is observable: the exec's spill metric counted runs
      val exec = q.queryExecution.executedPlan.collect { case t: TopKPerGroupExec => t }
      assert(exec.nonEmpty, q.queryExecution.executedPlan.toString)
      assert(exec.head.maxStateRows == 100) // conf reached the exec
      assert(exec.head.metrics("spills").value > 0, "expected spill runs")
      assert(exec.head.metrics("spilledRows").value > 0)
    }
  }

  test("abandon-partial: near-unique groups pass through the map-side " +
      "pass instead of spilling, results identical") {
    // ~unique group keys: the partial heap retains ~every row, so the
    // pass abandons after its probation window (retention ≥ 90%) and
    // streams the rest straight to the exchange — NO partial spill runs
    // even under a tiny state bound; the final pass computes the exact
    // result (and may itself spill — that's its job).
    val rows = (0 until 20000).map { i =>
      (i.toLong, (i * 2654435761L % 10007).toDouble, i.toLong)
    }
    val df = spark.sparkContext.parallelize(rows, 4).toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select("g", "v", "id").as[(Long, Double, Long)].collect().toSet
    withConfs(TopKPerGroupStrategy.MaxStateRowsKey -> "100",
              "spark.sql.adaptive.enabled" -> "false") {
      val q = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 2)
        .select("g", "v", "id")
      val got = q.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == want)
      val execs = q.queryExecution.executedPlan.collect { case t: TopKPerGroupExec => t }
      val partialExec = execs.find(_.partial)
      assert(partialExec.nonEmpty, q.queryExecution.executedPlan.toString)
      assert(partialExec.get.metrics("spills").value == 0,
        "partial pass must abandon, not spill, on near-unique groups")
    }
  }

  test("default state bound: the q89/q96 shape never spills") {
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val q = TopK.topKPerGroup(data, Seq("g"), Seq("v" -> true, "id" -> false), 3)
      q.collect()
      val exec = q.queryExecution.executedPlan.collect { case t: TopKPerGroupExec => t }
      assert(exec.nonEmpty && exec.head.metrics("spills").value == 0)
    }
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("per-group output is emitted in sort order") {
    val df = data
    val out = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 5)
      .where(col("g") === 0L).select("v").as[Double].collect()
    assert(out.toSeq == out.sortBy(-_).toSeq)
  }
}
