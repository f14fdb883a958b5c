package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Flatten, Windows}

/** CSV-fed silver (the Champion Data path): header cleanup, derived ratio
  * stats with zero-denominator guards, team-abbreviation extraction, and
  * the position-reassignment overwrite join
  * (reference: STAGING/SILVER-adapter-champion-notebook.json,
  * DEPRECATED/champion-silver.py — SURVEY §2 S2/P8/C2/C9/F12/J13).
  */
object CsvSilver {

  /** S2 — headered CSV scan (schema inference is the provider's contract;
    * enforceTypes downstream pins the final schema). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .option("mode", "PERMISSIVE").csv(path)

  /** C2 — split "Player Name (TEAM)" into name + team abbreviation
    * (DEPRECATED/champion-silver.py:259-270). */
  def splitPlayerTeam(df: DataFrame, c: String = "Player"): DataFrame =
    df.withColumn("playerName", trim(regexp_replace(col(c), "\\s*\\(.*\\)$", "")))
      .withColumn("teamAbbr", regexp_extract(col(c), "\\(([^)]+)\\)$", 1))

  /** C9 + F12 — per-disposal ratio stats with the zero-denominator drop
    * (DEPRECATED/champion-silver.py:310-320). Ratio columns are
    * `<stat>PerDisposal`. */
  def withRatioStats(df: DataFrame, stats: Seq[String],
                     denom: String = "Disposal"): DataFrame = {
    val guarded = df.where(col(denom).isNotNull && col(denom) =!= 0)
    stats.foldLeft(guarded) { (d, s) =>
      d.withColumn(s + "PerDisposal", col(s) / col(denom))
    }
  }

  /** J13 — position reassignment: rows whose listed position disagrees with
    * the curated assignment table are replaced by the curated value, then
    * deduped keep-best (DEPRECATED/champion-gold-copy.py:314-346). */
  def reassignPositions(df: DataFrame, assignments: DataFrame,
                        key: String = "playerName"): DataFrame = {
    val curated = broadcast(assignments
      .select(col(key), col("position").as("__curated")))
    val merged = df.join(curated, Seq(key), "left")
      .withColumn("position", coalesce(col("__curated"), col("position")))
      .drop("__curated")
    Windows.keepBest(merged, Seq(key),
      Seq(col("position").asc))
  }

  /** Cleanup entry: headers then provider-specific stages. */
  def cleanse(df: DataFrame): DataFrame = Flatten.cleanHeaders(df)
}
