package graft.pipelines

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Scoring, Stats, Windows}

/** The gold scoring pipeline — silver profile rows → z-scored, weighted
  * Metric/Trait/Rating output rows (reference: LOADERS/GOLD-data-loader.py,
  * traced in SURVEY.md §3.3).
  *
  * The reference runs this as ≤2500 concurrent single-DPU pandas processes,
  * one per ~season, with row loops for the hierarchy (flagged
  * `# TODO: vectorize` at :218). Here it is one distributed job over all
  * seasons: every stage is a groupBy/window/join keyed on the profile or the
  * (position, competition, season) distribution cell.
  */
final case class GoldConfig(
    leagueAllowList: Option[Seq[String]] = None,    // F4
    minSampleSize: Double = 3.5,                    // F6 (min_apps)
    minMinutes: Double = 300,                       // F6 (min_mins)
    baseConstant: Double = 2.5,                     // C12
    ddof: Stats.Ddof = Stats.Sample,                // A4 live-path default
    criticalCols: Seq[String] =
      Seq("playerName", "teamName", "seasonName", "competitionName")) // F8

object Gold {

  /** F4–F8 + dedup: league allow-list, agg-period restriction, position
    * allow-list (via the weights join inside Scoring), min-sample
    * eligibility, critical-column null drop, deterministic keep-best dedup
    * on profileId (LOADERS/GOLD-data-loader.py:391-434). */
  def eligible(profiles: DataFrame, cfg: GoldConfig): DataFrame = {
    val league = cfg.leagueAllowList
      .map(ls => profiles.where(col("competitionName").isin(ls: _*)))
      .getOrElse(profiles)
    val filtered = league
      .where(col("aggregationPeriod") === "season")
      .where(col("sampleSize") >= cfg.minSampleSize &&
             col("totalMinutesInSample") >= cfg.minMinutes)
      .na.drop("any", cfg.criticalCols)
    Windows.keepBest(filtered, Seq("profileId"),
      Seq(col("sampleSize").desc, col("totalMinutesInSample").desc))
  }

  /** A4/A5/C11 — z-score every stat within its (positionGroup,
    * competitionName, seasonName) distribution cell, fit on the positional
    * (non-ANY) slice semantics via the cell itself. */
  def standardise(profiles: DataFrame, statCols: Seq[String],
                  cfg: GoldConfig): DataFrame =
    Stats.zscore(
      profiles.where(col("positionGroup") =!= "ANY"),
      Seq("positionGroup", "competitionName", "seasonName"),
      statCols, cfg.ddof)

  /** C12 — weighted hierarchy via Scoring (join-based), then the gold output
    * convention: floats rounded to 2dp (LOADERS/GOLD-data-loader.py:549-551).
    * Rounding uses Qutil.dround's floor form rather than round(): identical
    * IEEE ops in any engine, so the DuckDB oracle can replay it exactly. */
  def score(zscored: DataFrame, weights: DataFrame, cfg: GoldConfig): DataFrame = {
    val scored = Scoring.score(zscored, Seq("profileId"), "positionGroup",
      weights, cfg.baseConstant)
    val floatCols = scored.schema.fields
      .filter(_.dataType.typeName == "double").map(_.name)
    floatCols.foldLeft(scored)((df, c) =>
      df.withColumn(c, graft.queries.Qutil.dround(col(c), 2)))
  }

  def run(profiles: DataFrame, weights: DataFrame, statCols: Seq[String],
          cfg: GoldConfig = GoldConfig()): DataFrame =
    score(standardise(eligible(profiles, cfg), statCols, cfg), weights, cfg)

  /** K6 — dimension-table builds from the scored output: one distinct
    * projection per dimension (LOADERS/GOLD-rds-updater.py:81-114); pair
    * each with `io.UpsertSql.dimensionTableSql` for the serving-side DDL. */
  def dimensions(output: DataFrame): Seq[(String, DataFrame)] = Seq(
    "competition" -> Seq("competitionName"),
    "season" -> Seq("seasonName"),
    "team" -> Seq("teamName"),
    "position" -> Seq("positionGroup"))
    .filter(_._2.forall(output.columns.contains))
    .map { case (name, cols) =>
      name -> output.select(cols.map(org.apache.spark.sql.functions.col): _*).distinct()
    }
}
