package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C12 — the weighted metric → trait → rating hierarchy
  * (reference: LOADERS/GOLD-data-loader.py:76,484-534).
  *
  * The reference loops pandas rows per position and merges per-level frames
  * (flagged `# TODO: vectorize` at LOADERS/GOLD-data-loader.py:218). The
  * engine is join-based and fully distributed:
  *
  *   unpivot zs_* stats → broadcast-join weights on (pos, statName)
  *   → groupBy(profile, metric): Σ(zs·statWgt) + base
  *   → groupBy(profile, trait):  Σ(metric·metricWgt)
  *   → groupBy(profile):         Σ(trait·traitWgt) = Rating
  *   → pivot each level back wide and re-join on the profile key.
  *
  * All three aggregations partition by the profile key, so after the first
  * shuffle the exchanges are reused; the weights table is config-sized and
  * always broadcast.
  */
object Scoring {

  /** Weights schema — one row per (pos, statName), inferred from
    * LOADERS/GOLD-data-loader.py:319-326. `inverse` flips the z-score sign
    * (C10) before weighting. */
  val weightsSchema: Seq[String] =
    Seq("pos", "statName", "statWgt", "metricName", "metricWgt",
        "traitName", "traitWgt", "inverse")

  def weightsDf(spark: SparkSession,
                rows: Seq[(String, String, Double, String, Double, String, Double, Boolean)]): DataFrame = {
    import spark.implicits._
    rows.toDF(weightsSchema: _*)
  }

  /** Score profiles that carry `zs_<stat>` columns. Output: key columns +
    * one column per metric, per trait, and `Rating`, all per profile row.
    *
    * @param keyCols  profile identity (e.g. profileId)
    * @param posCol   column matched against weights.pos (use a constant
    *                 column to ignore positions)
    */
  def score(profiles: DataFrame, keyCols: Seq[String], posCol: String,
            weights: DataFrame, baseConstant: Double = 2.5,
            zsPrefix: String = "zs_"): DataFrame = {
    val statCols = profiles.columns.filter(_.startsWith(zsPrefix)).toSeq
    require(statCols.nonEmpty, s"Scoring.score: no $zsPrefix* columns")
    val ids = (keyCols :+ posCol).distinct

    // unpivot: one row per (profile, stat)
    val long = profiles.unpivot(
      ids.map(col).toArray,
      statCols.map(col).toArray,
      "statName", "zs")
      .withColumn("statName", expr(s"substring(statName, ${zsPrefix.length + 1})"))

    val joined = long.join(
      broadcast(weights),
      long("statName") === weights("statName") && long(posCol) === weights("pos"),
      "inner")
      .drop(weights("statName")).drop(weights("pos"))

    // C10: inverse stats contribute with flipped sign.
    val signedZs = when(col("inverse"), -col("zs")).otherwise(col("zs"))

    // The metric level feeds four downstream frames (trait, rating, and two
    // pivots); persist it so the unpivot+join+aggregate upstream runs once.
    // Size is #profiles × #metrics — far smaller than the stat-level frame.
    val metric = joined
      .groupBy((keyCols :+ "metricName").map(col): _*)
      .agg((sum(signedZs * col("statWgt")) + baseConstant).as("metricScore"),
           first(col("metricWgt")).as("metricWgt"),
           first(col("traitName")).as("traitName"),
           first(col("traitWgt")).as("traitWgt"))
      .persist()

    val trait_ = metric
      .groupBy((keyCols :+ "traitName").map(col): _*)
      .agg(sum(col("metricScore") * col("metricWgt")).as("traitScore"),
           first(col("traitWgt")).as("traitWgt"))

    val rating = trait_
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("traitScore") * col("traitWgt")).as("Rating"))

    // Pivot levels back wide. Metric/trait name sets are config-sized.
    val metricNames = weights.select("metricName").distinct()
      .collect().map(_.getString(0)).sorted
    val traitNames = weights.select("traitName").distinct()
      .collect().map(_.getString(0)).sorted

    val metricsWide = metric.groupBy(keyCols.map(col): _*)
      .pivot("metricName", metricNames.toIndexedSeq).agg(first("metricScore"))
    val traitsWide = trait_.groupBy(keyCols.map(col): _*)
      .pivot("traitName", traitNames.toIndexedSeq).agg(first("traitScore"))

    // Base the result on the (persisted) metric level rather than re-scanning
    // `profiles`: only profiles whose position matched a weights row are
    // scored, mirroring the reference's inner weights join
    // (LOADERS/GOLD-data-loader.py:405 position allow-list).
    metricsWide
      .join(traitsWide, keyCols, "left")
      .join(rating, keyCols, "left")
  }
}
