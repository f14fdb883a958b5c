package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.expr.FeatureSpec
import graft.io.UpsertSql
import graft.ops.Scoring

/** End-to-end silver pipeline over a FIXTURES.md §1-shaped fixture:
  * provider JSON → flatten → cleanse → joins → derive → aggregate →
  * meta re-attach → type enforcement.
  */
class SilverPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def playerJson(matchId: Int, playerId: Int, pos: String,
                         minutes: Int, passes: Int, goals: Int): String =
    s"""{"seasonId":190042,"competitionId":335,"roundId":1,"matchId":$matchId,
        |"playerId":$playerId,
        |"positions":[{"position":{"name":"$pos","code":"X"}}],
        |"player":{"birthDate":"1998-04-12","currentNationalTeamId":12345,
        |  "shortName":"P$playerId","firstName":"First$playerId","lastName":"Last$playerId",
        |  "foot":"right","height":188,"weight":82,"gender":"male",
        |  "birthArea":{"name":"England"}},
        |"total":{"minutesOnField":$minutes,"minutesTagged":$minutes,
        |  "passes":$passes,"goals":$goals},
        |"average":{"passes":${passes.toDouble}},
        |"percent":{"successfulPasses":88.9}}""".stripMargin.replaceAll("\n", "")

  private lazy val raw = spark.read.json(Seq(
    s"""{"players":[${playerJson(555001, 70321, "Centre Back", 90, 50, 1)},
        |${playerJson(555001, 70999, "Goalkeeper", 20, 5, 0)}]}""".stripMargin.replaceAll("\n", ""),
    s"""{"players":[${playerJson(555002, 70321, "Centre Back", 90, 60, 0)}]}""").toDS())

  private lazy val lineups = Seq(
    (555001L, 70321L, 3161L), (555001L, 70999L, 3161L), (555002L, 70321L, 3161L))
    .toDF("matchId", "playerId", "teamId")

  private lazy val competitions = Seq((335L, "Premier League", "EPL"))
    .toDF("competitionId", "competitionName", "competitionShortName")

  private lazy val teams = Seq((3161L, 190042L, "Rovers", "2023-08-01", "2024-05-20"))
    .toDF("teamId", "seasonId", "teamName", "seasonStart", "seasonEnd")

  private lazy val cfg = SilverConfig(
    referenceDate = "2024-08-12",
    positionMap = Map("Centre Back" -> "CB", "Goalkeeper" -> "GK"),
    nationalTeams = Map("12345" -> "England"),
    features = Seq(
      FeatureSpec("totalPasses", "sum(passes)"),
      FeatureSpec("goals", "sum(goals)")))

  private lazy val metaCols = Seq("playerId", "teamId", "seasonId",
    "competitionId", "playerName", "teamName", "competitionName",
    "seasonName", "positionGroup", "age", "nationality",
    "playerTeamSeasonCompetition", "seasonPartition")

  private lazy val out =
    Silver.run(raw, lineups, competitions, teams, cfg, metaCols)

  test("silver end-to-end: profile grain and ANY/threshold semantics") {
    // bases: p1-CB, p1-ANY, p2-ANY (p2-GK below 33-minute threshold)
    // × periods: season, lastFour, lastEight
    assert(out.count() == 9)
    assert(out.where($"positionGroup" === "GK").count() == 0)
    assert(out.where($"aggregationPeriod" === "season").count() == 3)
  }

  test("silver end-to-end: compiled features aggregate per profile") {
    val p1cb = out.where($"positionGroup" === "CB" && $"aggregationPeriod" === "season")
    val r = p1cb.select("sampleSize", "totalMinutesInSample", "totalPasses", "goals").head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 180) // int per the reference's enforce-types map
    assert(r.getDouble(2) == 110.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("silver end-to-end: meta, keys, nationality map, current-year age branch (C6)") {
    val r = out.where($"positionGroup" === "CB" && $"aggregationPeriod" === "season")
      .select("playerName", "teamName", "seasonName", "age", "nationality",
        "playerTeamSeasonCompetition").head()
    assert(r.getString(0) == "P70321")
    assert(r.getString(1) == "Rovers")
    assert(r.getInt(2) == 2024)
    // ref 2024-08-12, born 1998-04-12, endYear==refYear → age today = 26
    assert(r.getInt(3) == 26)
    assert(r.getString(4) == "England")
    assert(r.getString(5) == "P70321 Rovers 2024 EPL")
  }

  test("silver end-to-end: profileId carries the -period suffix and types are enforced") {
    assert(out.where($"profileId".endsWith("-lastFour")).count() == 3)
    val sch = out.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("profileId") == "string")
    assert(sch("sampleSize") == "int")
    assert(sch("totalPasses") == "double")
    assert(sch("age") == "int")
  }

  test("silver end-to-end: season totals re-attach to every period/position row (J5)") {
    // ANY+season slice: p70321 played 90+90 over 2 matches; p70999 20 over 1.
    // Every row of each player carries the same full-season totals.
    val p1 = out.where($"playerId" === "70321")
      .select("totalMinutesForSeason", "appearancesForSeason").distinct().collect()
    assert(p1.length == 1 && p1.head.getInt(0) == 180 && p1.head.getInt(1) == 2)
    val p2 = out.where($"playerId" === "70999")
      .select("totalMinutesForSeason", "appearancesForSeason").distinct().collect()
    assert(p2.length == 1 && p2.head.getInt(0) == 20 && p2.head.getInt(1) == 1)
  }

  test("age falls back to endYear arithmetic outside the reference year (C6)") {
    val df = Seq(("1998-04-12", 2022)).toDF("birthDate", "endYear")
    val age = df.select(Silver.ageAt(col("birthDate"), col("endYear"),
      "2024-08-12", "yyyy-MM-dd").as("age")).head().getInt(0)
    assert(age == 24) // 2022 - 1998, no month/day adjustment
    val bad = Seq(("not-a-date", 2022)).toDF("birthDate", "endYear")
    assert(bad.select(Silver.ageAt(col("birthDate"), col("endYear"),
      "2024-08-12", "yyyy-MM-dd").as("age")).head().isNullAt(0))
  }
}

class GoldPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("gold end-to-end: eligibility, z-score cells, hierarchy, 2dp rounding") {
    // 4 eligible CB profiles in one (pos, comp, season) cell + 1 ineligible
    val profiles = Seq(
      ("a", "CB", "EPL", "2024", "season", 10.0, 900.0, "A", "T1", 2.0),
      ("b", "CB", "EPL", "2024", "season", 10.0, 900.0, "B", "T1", 4.0),
      ("c", "CB", "EPL", "2024", "season", 10.0, 900.0, "C", "T1", 6.0),
      ("d", "CB", "EPL", "2024", "season", 10.0, 900.0, "D", "T1", 8.0),
      ("e", "CB", "EPL", "2024", "season", 1.0, 90.0, "E", "T1", 9.0), // F6 fail
      ("f", "CB", "EPL", "2024", "lastFour", 10.0, 900.0, "F", "T1", 9.0)) // F7 fail
      .toDF("profileId", "positionGroup", "competitionName", "seasonName",
        "aggregationPeriod", "sampleSize", "totalMinutesInSample",
        "playerName", "teamName", "statA")
    val weights = Scoring.weightsDf(spark, Seq(
      ("CB", "statA", 1.0, "M", 1.0, "T", 1.0, false)))
    val out = Gold.run(profiles, weights, Seq("statA"))
    assert(out.count() == 4)
    // statA z-scores (sample ddof) of 2,4,6,8: ±1.1619, ±0.3873
    val m = out.select("profileId", "Rating").as[(String, Double)].collect().toMap
    assert(m("a") == 1.34)   // 2.5 - 1.16 = 1.34 (rounded 2dp)
    assert(m("d") == 3.66)
  }
}

class UpsertSqlSpec extends SparkSpec {
  import spark.implicits._

  test("DDL from schema pins the reference dtype map and auto dateUpdated (K4)") {
    val df = Seq(("p1", 1, 2.5, true)).toDF("profileId", "apps", "Rating", "active")
    val ddl = UpsertSql.createTableDdl(df.schema, "Output", "profileId")
    assert(ddl.contains("`profileId` VARCHAR(250) PRIMARY KEY"))
    assert(ddl.contains("`apps` INT"))
    assert(ddl.contains("`Rating` FLOAT"))
    assert(ddl.contains("`active` TINYINT(1)"))
    assert(ddl.contains("`dateUpdated` TIMESTAMP DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP"))
  }

  test("upsert statement updates every non-key column (K3)") {
    val sql = UpsertSql.upsertStatement("Output", Seq("profileId", "Rating"), "profileId")
    assert(sql ==
      "INSERT INTO `Output` (`profileId`, `Rating`) VALUES (?, ?) " +
        "ON DUPLICATE KEY UPDATE `Rating` = VALUES(`Rating`)")
  }

  test("search index DDL: generated ø→o columns + FULLTEXT keys (K5)") {
    val stmts = UpsertSql.searchIndexDdl("Output")
    assert(stmts.head ==
      "ALTER TABLE `Output` CONVERT TO CHARACTER SET utf8mb4 COLLATE utf8mb4_unicode_ci")
    val alter = stmts(1)
    assert(alter.contains("ADD COLUMN `fullNameNormalised` TEXT GENERATED ALWAYS AS " +
      "(REPLACE(REPLACE(`fullName`, 'ø', 'o'), 'Ø', 'O')) STORED"))
    assert(alter.contains("ADD COLUMN `playerNameNormalised` TEXT GENERATED ALWAYS AS"))
    assert(alter.contains("ADD FULLTEXT KEY `playerFullTextIndex` (`fullNameNormalised`, " +
      "`playerNameNormalised`, `teamName`, `competitionName`, `positionName`, `seasonName`)"))
    assert(alter.contains("ADD KEY `idx_season_competition` (`seasonName`(25), `competitionName`(255))"))
    assert(alter.contains("ADD KEY `idx_player_team` (`playerId`(255), `teamName`(255))"))
    assert(stmts(2) == "CREATE FULLTEXT INDEX `playerUniversalFullTextIndex` ON `Output` " +
      "(`fullNameNormalised`, `playerNameNormalised`, `teamName`, `competitionName`)")
  }

  test("dimension table sql (K6)") {
    val stmts = UpsertSql.dimensionTableSql("Competition", "Output",
      "competitionId", "competitionName")
    assert(stmts.head.startsWith("CREATE TABLE IF NOT EXISTS `Competition`"))
    assert(stmts(1).contains("INSERT IGNORE") && stmts(1).contains("SELECT DISTINCT"))
  }
}
