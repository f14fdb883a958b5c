package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.expr.FeatureSpec

/** Deterministic in-memory provider-shaped fixture (FIXTURES.md §1 shapes)
  * for driving the silver→gold pipeline end-to-end without external data:
  * 4 teams × 10 players × 6 matches with arithmetically-derived stats.
  */
object DemoFixture {

  val seasonId = 190042L
  val competitionId = 335L

  /** The provider feed for ONE match, as the raw JSON document an API
    * would serve (one `{"players":[...]}` object, single line). Shared by
    * [[playerStats]] (in-memory read) and the q112 lifecycle query's
    * synthetic bronze API, so the fetched-and-landed bytes and the
    * in-memory frame can never drift. */
  def matchDoc(m: Int): String = {
    val players = for {
        t <- 0 until 4
        p <- 0 until 10
      } yield {
        val pid = 1000 + t * 100 + p
        val minutes = if (p == 9) 15 else 90 // one sub per team under threshold
        val passes = 20 + ((pid * 7 + m * 13) % 40)
        val duels = 5 + ((pid * 3 + m) % 10)
        val goals = if ((pid + m) % 17 == 0) 1 else 0
        val pos = p match {
          case 0 => "Goalkeeper"
          case 1 | 2 | 3 => "Centre Back"
          case 4 | 5 | 6 => "Midfielder"
          case _ => "Forward"
        }
        val birthYear = 1990 + (pid % 14)
        s"""{"seasonId":$seasonId,"competitionId":$competitionId,"roundId":$m,
            |"matchId":${555000 + m},"playerId":$pid,
            |"positions":[{"position":{"name":"$pos","code":"X"}}],
            |"player":{"birthDate":"$birthYear-0${1 + pid % 9}-1${pid % 9}",
            |  "currentNationalTeamId":${12000 + pid % 3},
            |  "shortName":"P$pid","firstName":"F$pid","lastName":"L$pid",
            |  "foot":"right","height":${175 + pid % 20},"weight":${70 + pid % 15},
            |  "gender":"male","birthArea":{"name":"Area${pid % 5}"}},
            |"total":{"minutesOnField":$minutes,"minutesTagged":$minutes,
            |  "passes":$passes,"duels":$duels,"goals":$goals},
            |"average":{"passes":${passes.toDouble}},
            |"percent":{"successfulPasses":${80 + pid % 15}.5}}"""
          .stripMargin.replaceAll("\n", "")
    }
    s"""{"players":[${players.mkString(",")}]}"""
  }

  def playerStats(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.json((1 to 6).map(matchDoc).toDS())
  }

  def lineups(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      m <- 1 to 6; t <- 0 until 4; p <- 0 until 10
    } yield (555000L + m, 1000L + t * 100 + p, 3000L + t))
      .toDF("matchId", "playerId", "teamId")
  }

  def competitions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((competitionId, "Premier League", "EPL"))
      .toDF("competitionId", "competitionName", "competitionShortName")
  }

  def teams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 4).map(t => (3000L + t, seasonId, s"Team$t", "2023-08-01", "2024-05-20"))
      .toDF("teamId", "seasonId", "teamName", "seasonStart", "seasonEnd")
  }

  val silverConfig: SilverConfig = SilverConfig(
    referenceDate = "2024-08-12",
    positionMap = Map("Goalkeeper" -> "GK", "Centre Back" -> "CB",
      "Midfielder" -> "MF", "Forward" -> "FW"),
    nationalTeams = Map("12000" -> "Narnia", "12001" -> "Oz", "12002" -> "Utopia"),
    features = Seq(
      FeatureSpec("totalPasses", "sum(passes)"),
      FeatureSpec("passesPerNinety", "sum(passes) * 90.0 / sum(minutesTagged)"),
      FeatureSpec("totalDuels", "sum(duels)"),
      FeatureSpec("goals", "sum(goals)")))

  val metaCols: Seq[String] = Seq("playerId", "teamId", "seasonId",
    "competitionId", "playerName", "teamName", "competitionName",
    "seasonName", "positionGroup", "age", "nationality",
    "playerTeamSeasonCompetition", "seasonPartition")

  /** One row per (position, stat): (pos, statName, statWgt, metricName,
    * metricWgt, traitName, traitWgt, inverse). Shared by the Spark weights
    * frame and the DuckDB oracle's VALUES clause so they can never drift. */
  val goldWeightRows: Seq[(String, String, Double, String, Double, String, Double, Boolean)] =
    for {
      pos <- Seq("GK", "CB", "MF", "FW")
      row <- Seq(
        (pos, "totalPasses", 0.5, "Distribution", 0.6, "OnBall", 0.7, false),
        (pos, "passesPerNinety", 0.5, "Distribution", 0.6, "OnBall", 0.7, false),
        (pos, "totalDuels", 1.0, "Duelling", 0.4, "OnBall", 0.7, false),
        (pos, "goals", 1.0, "Scoring", 1.0, "Threat", 0.3, false))
    } yield row

  def goldWeights(spark: SparkSession): DataFrame =
    graft.ops.Scoring.weightsDf(spark, goldWeightRows)
}
