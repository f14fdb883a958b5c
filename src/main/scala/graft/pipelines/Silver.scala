package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{FeatureSpec, FeatureStore}
import graft.ops.{Flatten, Groups, Windows}

/** The silver adapter pipeline — provider match feeds → player-profile
  * feature rows (reference: ADAPTERS/SILVER-adapter-wyscout.py, traced in
  * SURVEY.md §3.1). Re-expressed as composable DataFrame stages; one Spark
  * app over all seasons replaces the reference's 500-concurrent-Glue-job
  * fan-out (SURVEY.md §4 last row), with the season a partition column
  * rather than a job parameter.
  */
final case class SilverConfig(
    playtimeThreshold: Double = 33.0,
    lastNPeriods: Map[String, Int] = Map("lastFour" -> 4, "lastEight" -> 8),
    referenceDate: String,               // C6: injected "today" for age determinism
    birthDateFormat: String = "yyyy-MM-dd",
    positionMap: Map[String, String] = Map.empty,
    nationalTeams: Map[String, String] = Map.empty,
    features: Seq[FeatureSpec] = Nil,
    renames: Map[String, String] = Map("birthArea_name" -> "birthArea"), // P5
    intCols: Set[String] = Set("seasonName", "startYear", "endYear", "age",
      "height", "weight", "sampleSize", "totalMinutesInSample",
      "totalMinutesForSeason", "appearancesForSeason"),
    stringCols: Set[String] = Set("profileId", "playerId", "teamId", "seasonId",
      "competitionId", "matchId", "playerName", "fullName", "firstName",
      "lastName", "teamName", "competitionName", "competitionShortName",
      "positionGroup", "nationality", "birthDate", "foot", "gender",
      "teamSeason", "playerTeamSeason", "playerTeamSeasonCompetition",
      "aggregationPeriod", "seasonPartition", "birthArea"))

object Silver {

  /** Stage 1+2 — scan+flatten (S1/P1/P3/P4): explode the per-match `players`
    * array, flatten the player/total/average/percent structs (P1), project
    * the primary position from positions[0] (P3), strip the `total_` stat
    * prefix so stats keep their bare names (P4)
    * (ADAPTERS/SILVER-adapter-wyscout.py:226-258,269-271). */
  def flattenWithPrimaryPosition(raw: DataFrame): DataFrame = {
    val exploded = raw.select(explode(col("players")).as("p")).select("p.*")
    val positionName =
      if (exploded.columns.contains("positions"))
        element_at(col("positions"), 1).getField("position").getField("name")
      else lit(null).cast("string")
    val withPos = exploded.withColumn("positionName", positionName)
      .drop("positions")
    Flatten.stripPrefix(
      Flatten.stripPrefix(Flatten.flattenStruct(withPos), "total_"),
      "player_")
  }

  /** J11 — dict lookups as map literals + element_at (no UDF): position name
    * → group, national-team id → name with birth-area fallback
    * (ADAPTERS/SILVER-adapter-wyscout.py:261-272,403-404). */
  def mapLookup(m: Map[String, String], key: Column, default: Column): Column =
    if (m.isEmpty) default
    else coalesce(element_at(typedLit(m), key.cast("string")), default)

  /** C6 — age at season end-year; when the season ends in the reference
    * year, age as of `referenceDate`. Pure column arithmetic (the reference
    * UDF's datetime.today() becomes the injected date; parse failure →
    * null via to_date). */
  def ageAt(birthDate: Column, endYear: Column, referenceDate: String,
            birthFormat: String): Column = {
    // try_to_date: unparseable birth dates give null age, like the
    // reference's bare except (ANSI to_date would throw instead).
    val birth = try_to_date(birthDate, birthFormat)
    val ref = to_date(lit(referenceDate), "yyyy-MM-dd")
    val currentYearAge = year(ref) - year(birth) -
      when(month(ref) < month(birth) ||
        (month(ref) === month(birth) && dayofmonth(ref) < dayofmonth(birth)), 1)
        .otherwise(0)
    when(year(ref) === endYear, currentYearAge)
      .otherwise(endYear - year(birth))
      .cast("int")
  }

  /** Stage 3 — cleanse/enrich: null-key drop (F1), position mapping, ANY
    * union (W2a), playtime threshold with ANY carve-out (F2). */
  def cleanseEnrich(df: DataFrame, cfg: SilverConfig): DataFrame = {
    val posMapped = df
      .where(col("playerId").isNotNull)
      .withColumn("positionGroup",
        mapLookup(cfg.positionMap, col("positionName"), lit("UNKNOWN")))
    Groups.thresholdFilter(
      Groups.withAnyGroup(posMapped, "positionGroup"),
      col("minutesOnField"), cfg.playtimeThreshold, "positionGroup")
  }

  /** Stage 3b — joins: lineups (J1, inner, broadcast), competitions (J2,
    * left broadcast), teams (J3, left broadcast on (teamId, seasonId)). */
  def attachLookups(df: DataFrame, lineups: DataFrame, competitions: DataFrame,
                    teams: DataFrame): DataFrame =
    df.join(broadcast(lineups), Seq("matchId", "playerId"), "inner")
      .join(broadcast(competitions), Seq("competitionId"), "left")
      .join(broadcast(teams), Seq("teamId", "seasonId"), "left")

  /** Stage 3c — derived columns and composite keys (C1/C5/C6,
    * ADAPTERS/SILVER-adapter-wyscout.py:388-408). */
  def deriveColumns(df: DataFrame, cfg: SilverConfig): DataFrame =
    df.withColumn("startYear", year(to_date(col("seasonStart"), "yyyy-MM-dd")))
      .withColumn("endYear", year(to_date(col("seasonEnd"), "yyyy-MM-dd")))
      .withColumn("seasonName", col("endYear"))
      .withColumn("seasonPartition", col("seasonId"))
      .withColumn("fullName", concat_ws(" ", col("firstName"), col("lastName")))
      .withColumn("playerName", coalesce(col("shortName"), col("fullName")))
      .withColumn("teamSeason", concat(col("teamName"), lit(" "), col("seasonName")))
      .withColumn("playerTeamSeason", concat(col("playerName"), lit(" "), col("teamSeason")))
      .withColumn("playerTeamSeasonCompetition",
        concat(col("playerTeamSeason"), lit(" "), col("competitionShortName")))
      .withColumn("profileId", concat(
        col("playerId").cast("string"), col("teamId").cast("string"),
        col("seasonId").cast("string"), col("competitionId").cast("string"),
        col("positionGroup")))
      .withColumn("nationality",
        mapLookup(cfg.nationalTeams, col("currentNationalTeamId"), col("birthArea")))
      .withColumn("age", ageAt(col("birthDate"), col("endYear"),
        cfg.referenceDate, cfg.birthDateFormat))

  /** Stage 4+5 — A1 compiled aggregation per aggregation period: full season
    * plus last-N-game windows (W1), `-period` profileId suffix
    * (ADAPTERS/SILVER-adapter-wyscout.py:410-455).
    *
    * Single-pass formulation: the reference (and the first cut here) runs
    * one aggregation per period and unions — at scale that is one full
    * shuffle of the match frame PER PERIOD. Instead: rank each profile's
    * matches once (one window shuffle, `rank()` keeps the reference's tie
    * semantics), explode the set of periods each row belongs to
    * (season always; lastN iff rank ≤ N), and aggregate once by
    * (profileId, period). Same rows out, 1 window + 1 aggregate instead of
    * |periods|+1 shuffles — and the aggregate's exchange reuses nothing it
    * doesn't need. */
  def aggregateProfiles(matchFrame: DataFrame, cfg: SilverConfig): DataFrame = {
    val baseSpecs =
      FeatureSpec("sampleSize", "count(profileId)") +:
      FeatureSpec("totalMinutesInSample", "sum(minutesTagged)") +:
      cfg.features
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("profileId").orderBy(col("matchId").desc)
    val periodCols = lit("season") +:
      cfg.lastNPeriods.toSeq.sortBy(_._1).map { case (name, n) =>
        when(col("__rk") <= n, lit(name))
      }
    val exploded = matchFrame
      .withColumn("__rk", rank().over(w))
      .withColumn("aggregationPeriod",
        explode(filter(array(periodCols: _*), _.isNotNull)))
      .drop("__rk")
    FeatureStore.aggregate(exploded, Seq("profileId", "aggregationPeriod"), baseSpecs)
      .withColumn("profileId",
        when(col("aggregationPeriod") === "season", col("profileId"))
          .otherwise(concat(col("profileId"), lit("-"), col("aggregationPeriod"))))
  }

  /** Stage 6 — meta re-attach (J4: left join against the deduped match
    * frame) and season totals self-join (J5). */
  def attachMeta(profiles: DataFrame, matchFrame: DataFrame,
                 metaCols: Seq[String]): DataFrame = {
    val meta = matchFrame
      .select(("profileId" +: metaCols).distinct.map(col): _*)
      .dropDuplicates("profileId")
    val stripped = profiles.withColumn("__baseProfileId",
      regexp_replace(col("profileId"), "-(lastFour|lastEight)$", ""))
    stripped
      .join(meta.withColumnRenamed("profileId", "__baseProfileId"),
        Seq("__baseProfileId"), "left")
      .drop("__baseProfileId")
  }

  /** J5 — season-totals self-join (ADAPTERS/SILVER-adapter-wyscout.py:
    * 466-473): the ANY-position, season-period slice carries each
    * (player, team, season, competition)'s full-season minutes and
    * appearance count; left-join it back so every period/position row has
    * `totalMinutesForSeason` / `appearancesForSeason`. No playtime
    * re-thresholding here — the slice inherits whatever upstream filtering
    * produced, same as the reference. The slice is ~1/(positions×periods)
    * of the profile frame and keyed the same way, so AQE picks a broadcast
    * at realistic slice sizes; the keyed shuffle is the fallback. */
  def attachSeasonTotals(profiles: DataFrame): DataFrame = {
    val keys = Seq("playerId", "teamId", "seasonId", "competitionId")
    val seasonAny = profiles
      .where(col("positionGroup") === "ANY" &&
        col("aggregationPeriod") === "season")
      .select(keys.map(col) :+
        col("totalMinutesInSample").as("totalMinutesForSeason") :+
        col("sampleSize").as("appearancesForSeason"): _*)
    profiles.join(seasonAny, keys, "left")
  }

  /** Full pipeline. `raw` is the provider player-stats feed (FIXTURES.md §1.1
    * shape); lineups/competitions/teams are the lookup feeds. */
  def run(raw: DataFrame, lineups: DataFrame, competitions: DataFrame,
          teams: DataFrame, cfg: SilverConfig,
          metaCols: Seq[String]): DataFrame = {
    val flat = Flatten.renameAll(flattenWithPrimaryPosition(raw), cfg.renames)
    val cleansed = cleanseEnrich(flat, cfg)
    val joined = attachLookups(cleansed, lineups, competitions, teams)
    // The match frame fans out to one aggregation per period plus the meta
    // re-attach — persist it (spills to disk at scale) rather than re-running
    // the scan+flatten+join upstream once per consumer.
    val derived = deriveColumns(joined, cfg).persist()
    val profiles = aggregateProfiles(derived, cfg)
    // attachSeasonTotals self-joins its input, so without a persist the
    // window+aggregate+meta subtree above runs TWICE (both sides re-read
    // the persisted match frame, then redo the profile aggregation). The
    // profile-grain frame is ~|matches|/sampleSize rows — far smaller than
    // the match grain — so persisting it is cheap at any scale and the
    // self-join's build side becomes a cache read.
    val withMeta = attachMeta(profiles, derived, metaCols).persist()
    val withSeasonTotals = attachSeasonTotals(withMeta)
    Groups.enforceTypes(withSeasonTotals, cfg.intCols, cfg.stringCols)
  }
}
