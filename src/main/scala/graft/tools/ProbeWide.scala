package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expr.{FeatureSpec, FeatureStore}

/** Dev probe: find the width at which the feature-store aggregate's
  * whole-stage codegen stops compiling (64 KB method / constant-pool
  * limits) by running increasing column counts with codegen fallback
  * DISABLED, then measure the interpreted-path cost at the same width
  * with fallback enabled. Feeds the SCALE.md wide-schema note. */
object ProbeWide {
  def main(args: Array[String]): Unit = {
    // sections: "width" (codegen compile limit), "wholestage" (maxFields
    // participation), "maxfields" (timed 100-vs-600 trade); default all
    val sections: Set[String] =
      if (args.isEmpty) Set("width", "wholestage", "maxfields") else args.toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(w: Int, rows: Long, enforce: Boolean): (Boolean, Double) = {
      spark.conf.set("spark.sql.codegen.fallback", (!enforce).toString)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (enforce) "CODEGEN_ONLY" else "FALLBACK")
      val statCols = (0 until w).map(i =>
        ((col("id") * (i + 3)) % 97).cast("double").as(s"s_$i"))
      val df = spark.range(rows)
        .select((col("id") % 10).cast("int").as("grp") +: statCols: _*)
      val specs = (0 until w).map { i =>
        i % 3 match {
          case 0 => FeatureSpec(s"f_$i", s"sum(s_$i)")
          case 1 => FeatureSpec(s"f_$i", s"max(s_$i)")
          case _ => FeatureSpec(s"f_$i", s"avg(s_$i)")
        }
      }
      val t0 = System.nanoTime()
      try {
        FeatureStore.aggregate(df, Seq("grp"), specs)
          .write.format("noop").mode("overwrite").save()
        (true, (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          println(s"  [w=$w enforce=$enforce] FAILED: " +
            e.getMessage.linesIterator.toSeq.headOption.getOrElse(""))
          (false, (System.nanoTime() - t0) / 1e9)
      }
    }

    val rows = 100000L
    if (sections("width")) for (w <- Seq(250, 500, 1000, 2000, 3000)) {
      val (okCg, tCg) = run(w, rows, enforce = true)
      val (okFb, tFb) = run(w, rows, enforce = false)
      println(f"[probewide] w=$w%4d rows=$rows codegen_only: ok=$okCg t=$tCg%6.2f s | fallback_allowed: ok=$okFb t=$tFb%6.2f s")
    }

    // the maxFields TRADE, timed (VERDICT r8 item 7): default 100 keeps
    // >100-col plans out of WholeStageCodegen (expression codegen still
    // compiles each expression; the stage just isn't fused). Measure the
    // 500-col aggregate at maxFields 100 vs 600 — adopt 600 as the session
    // default only on a ≥20% win, else record the negative result.
    if (sections("maxfields")) {
      // AQE OFF before reading the plan string: under AdaptiveSparkPlanExec
      // the pre-execution plan carries no *(n) whole-stage markers, so the
      // fusedAgg label would print false at BOTH maxFields settings and
      // mislabel the measured trade (ADVICE r9)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      val w = 500
      val rowsMf = 2000000L
      val statCols = (0 until w).map(i =>
        ((col("id") * (i + 3)) % 97).cast("double").as(s"s_$i"))
      val specs = (0 until w).map { i =>
        i % 3 match {
          case 0 => FeatureSpec(s"f_$i", s"sum(s_$i)")
          case 1 => FeatureSpec(s"f_$i", s"max(s_$i)")
          case _ => FeatureSpec(s"f_$i", s"avg(s_$i)")
        }
      }
      for (mf <- Seq("100", "600", "100", "600")) { // ABAB: order-robust
        spark.conf.set("spark.sql.codegen.maxFields", mf)
        val df = spark.range(rowsMf)
          .select((col("id") % 10).cast("int").as("grp") +: statCols: _*)
        val agg = FeatureStore.aggregate(df, Seq("grp"), specs)
        val planLines = agg.queryExecution.executedPlan.toString.linesIterator.toSeq
        val fused = planLines
          .exists(l => l.contains("HashAggregate") && l.contains("*("))
        // ALL whole-stage-fused operators, not just the aggregate: at
        // maxFields=600 the wide Project/Range stage fuses too, and THAT
        // is the code the measurement exercises (a 500-col generated
        // method can exceed JIT limits and run interpreted)
        val nFused = planLines.count(_.trim.matches("^[+:\\- ]*\\*\\(\\d+\\).*"))
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          agg.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[probewide] maxFields=$mf%4s w=$w rows=$rowsMf fusedAgg=$fused fusedOps=$nFused min=${times.min}%6.2f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }

    // whole-stage participation: spark.sql.codegen.maxFields (default 100)
    // gates WholeStageCodegen independently of whether expression codegen
    // compiles — report where the wide aggregate actually sits
    spark.conf.set("spark.sql.adaptive.enabled", "false") // concrete plan
    if (sections("wholestage")) for (w <- Seq(50, 99, 150, 500)) {
      val statCols = (0 until w).map(i =>
        ((col("id") * (i + 3)) % 97).cast("double").as(s"s_$i"))
      val df = spark.range(1000)
        .select((col("id") % 10).cast("int").as("grp") +: statCols: _*)
      val specs = (0 until w).map(i => FeatureSpec(s"f_$i", s"sum(s_$i)"))
      val plan = FeatureStore.aggregate(df, Seq("grp"), specs)
        .queryExecution.executedPlan.toString
      // whole-stage operators print as "*(id) HashAggregate..." in the
      // simple plan string
      val starred = plan.linesIterator.count(_.trim.matches("^[+:\\- ]*\\*\\(\\d+\\).*"))
      val aggStarred = plan.linesIterator
        .exists(l => l.contains("HashAggregate") && l.contains("*("))
      println(s"[probewide] w=$w whole-stage operators: $starred " +
        s"(hashAggregate in whole-stage: $aggStarred)")
    }
    spark.stop()
  }
}
