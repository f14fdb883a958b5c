package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Groups, Scoring}

/** Wide-schema codegen stress — the reference's dynamic CSV schema means
  * hundreds of stat columns flowing through the feature-store aggregate,
  * the three-way type gate, and the scoring unpivot
  * (reference: ADAPTERS/SILVER-adapter-wyscout.py:413-427 builds the agg
  * dict from the feature store; the gold loader consumes the full width).
  *
  * These tests run the 500-column shapes with
  * `spark.sql.codegen.fallback=false`, so a whole-stage-codegen compile
  * failure (64 KB method limit, constant-pool overflow) THROWS instead of
  * silently degrading to the interpreted path — i.e. green here proves the
  * wide plans stay inside codegen, the property SCALE.md claims for the
  * 100 TB scan. Values are asserted exactly against a Scala replay.
  */
class WideSchemaSpec extends SparkSpec {

  private val W = 500 // stat columns
  private val Rows = 200L

  /** 200 rows × (grp, pos, s_0..s_499); s_i = (id*(i+3)) % 97 — cheap,
    * deterministic, and replayable in plain Scala. */
  private def wide: DataFrame = {
    val statCols = (0 until W).map(i =>
      ((col("id") * (i + 3)) % 97).cast("double").as(s"s_$i"))
    spark.range(Rows).select(
      (col("id") % 10).cast("int").as("grp") +:
        lit("CM").as("pos") +: statCols: _*)
  }

  private def statVal(id: Long, i: Int): Double = ((id * (i + 3)) % 97).toDouble

  private def withNoCodegenFallback[A](body: => A): A = {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("FeatureStore.aggregate: 500 compiled specs stay in codegen, exact values") {
    val specs = (0 until W).map { i =>
      i % 3 match {
        case 0 => FeatureSpec(s"f_$i", s"sum(s_$i)")
        case 1 => FeatureSpec(s"f_$i", s"max(s_$i)")
        case _ => FeatureSpec(s"f_$i", s"avg(s_$i)")
      }
    }
    val t0 = System.nanoTime()
    val out = withNoCodegenFallback {
      FeatureStore.aggregate(wide, Seq("grp"), specs).collect()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"500-spec aggregate over $Rows rows: $secs%.2f s (codegen enforced)")
    assert(out.length === 10)
    val row7 = out.find(_.getInt(0) == 7).get
    val ids7 = (0L until Rows).filter(_ % 10 == 7)
    // f_0 = sum(s_0), f_1 = max(s_1), f_2 = avg(s_2) for grp 7
    assert(row7.getAs[Double]("f_0") === ids7.map(statVal(_, 0)).sum)
    assert(row7.getAs[Double]("f_1") === ids7.map(statVal(_, 1)).max)
    assert(math.abs(row7.getAs[Double]("f_2") -
      ids7.map(statVal(_, 2)).sum / ids7.size) < 1e-12)
    assert(row7.getAs[Double]("f_499") === ids7.map(statVal(_, 499)).max)
  }

  test("enforceTypes: the 500-column type gate is a single codegen'd projection") {
    val typed = withNoCodegenFallback {
      val t = Groups.enforceTypes(wide,
        intCols = (0 until W by 5).map(i => s"s_$i").toSet,
        stringCols = Set("pos"),
        keepCols = Set("grp"))
      t.collect() // force execution under the no-fallback conf
      t
    }
    assert(typed.schema("s_0").dataType.typeName === "integer")
    assert(typed.schema("s_1").dataType.typeName === "double")
    assert(typed.schema("pos").dataType.typeName === "string")
    // one projection node, not 500 chained withColumns
    assert(typed.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }.size === 1)
  }

  test("Scoring.score: 500 zs_ columns unpivot, weight-join and pivot back exactly") {
    // profiles: 50 rows × 500 zs_ cols; zs_i = ((id*(i+3)) % 97) / 97
    val zsCols = (0 until W).map(i =>
      (((col("id") * (i + 3)) % 97) / 97.0).as(s"zs_stat$i"))
    val profiles = spark.range(50).select(
      col("id").as("profileId") +: lit("CM").as("pos") +: zsCols: _*)
    // 500 stats → 50 metrics (10 stats each) → 10 traits (5 metrics each)
    val weights = Scoring.weightsDf(spark, (0 until W).map { i =>
      val m = i / 10; val t = m / 5
      ("CM", s"stat$i", 0.1, s"metric$m", 0.2, s"trait$t", 0.5, i % 7 == 0)
    })
    val t0 = System.nanoTime()
    val scored = Scoring.score(profiles, Seq("profileId"), "pos", weights)
      .collect()
    info(f"500-stat scoring over 50 profiles: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(scored.length === 50)
    val r = scored.find(_.getLong(0) == 13L).get
    def zs(i: Int): Double = ((13L * (i + 3)) % 97) / 97.0
    def signed(i: Int): Double = if (i % 7 == 0) -zs(i) else zs(i)
    // metric17 = Σ_{i∈[170,180)} signed·0.1 + 2.5
    val m17 = (170 until 180).map(signed(_) * 0.1).sum + 2.5
    assert(math.abs(r.getAs[Double]("metric17") - m17) < 1e-9)
    // Rating = Σ_traits (Σ_metrics metricScore·0.2)·0.5
    val rating = (0 until 10).map { t =>
      (0 until 5).map { mi =>
        val m = t * 5 + mi
        ((m * 10 until (m + 1) * 10).map(signed(_) * 0.1).sum + 2.5) * 0.2
      }.sum * 0.5
    }.sum
    assert(math.abs(r.getAs[Double]("Rating") - rating) < 1e-9)
  }
}
