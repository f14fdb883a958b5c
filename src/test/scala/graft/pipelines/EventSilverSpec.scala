package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.expr.FeatureSpec

class EventSilverSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    // (match, player, type, outcome, location)
    (1L, 10L, "Pass", "Complete", Seq(60.0, 40.0)),
    (1L, 10L, "Pass", "Incomplete", Seq(30.0, 20.0)),
    (1L, 10L, "Shot", "Goal", Seq(110.0, 38.0)),
    (1L, 11L, "Pass", "Complete", Seq(50.0, 50.0)),
    (2L, 10L, "Pass", "Complete", Seq(70.0, 30.0)))
    .toDF("match_id", "player_id", "type", "outcome", "location")

  private val lineupEvents = Seq(
    (1L, 10L, "Yellow Card"), (1L, 10L, "Yellow Card"), (1L, 11L, "Red Card"))
    .toDF("match_id", "player_id", "card_type")

  private val catalogue = Seq(
    FeatureSpec("passes", "sum(CASE WHEN type = 'Pass' THEN 1 ELSE 0 END)"),
    FeatureSpec("completedPasses",
      "sum(CASE WHEN type = 'Pass' AND outcome = 'Complete' THEN 1 ELSE 0 END)"),
    FeatureSpec("goals",
      "sum(CASE WHEN type = 'Shot' AND outcome = 'Goal' THEN 1 ELSE 0 END)"),
    FeatureSpec("avgX", "avg(location_x)"))

  test("event→match aggregation with compiled stats catalogue (A2) + cards (A3/J7)") {
    val out = EventSilver.run(events, lineupEvents, catalogue)
    val p10m1 = out.where($"match_id" === 1L && $"player_id" === 10L).head()
    assert(p10m1.getAs[Long]("passes") == 2L)
    assert(p10m1.getAs[Long]("completedPasses") == 1L)
    assert(p10m1.getAs[Long]("goals") == 1L)
    assert(math.abs(p10m1.getAs[Double]("avgX") - (60.0 + 30.0 + 110.0) / 3) < 1e-12)
    assert(p10m1.getAs[Long]("yellowCards") == 2L && p10m1.getAs[Long]("redCards") == 0L)
    // player 11: red card via the outer-join side, yellow zero-filled
    val p11 = out.where($"match_id" === 1L && $"player_id" === 11L).head()
    assert(p11.getAs[Long]("redCards") == 1L && p11.getAs[Long]("yellowCards") == 0L)
    // player 10 match 2: no lineup events at all → both zero-filled
    val p10m2 = out.where($"match_id" === 2L && $"player_id" === 10L).head()
    assert(p10m2.getAs[Long]("yellowCards") == 0L && p10m2.getAs[Long]("redCards") == 0L)
  }

  test("possession attach feeds possession-adjusted catalogue stats (J6)") {
    val matchStats = Seq(
      (1L, 10L, 0.60), (1L, 11L, 0.40), (2L, 10L, 0.50))
      .toDF("match_id", "player_id", "player_match_possession")
    val adjCatalogue = catalogue :+
      FeatureSpec("passesPerPossession",
        // possession is constant within a (match, player) group; max() reads
        // it back out of the grouped frame deterministically
        "cast(sum(CASE WHEN type = 'Pass' THEN 1 ELSE 0 END) as double)" +
          " / max(player_match_possession)")
    val out = EventSilver.run(events, lineupEvents, adjCatalogue,
      matchPossession = Some(matchStats))
    val p10m1 = out.where($"match_id" === 1L && $"player_id" === 10L).head()
    assert(math.abs(p10m1.getAs[Double]("passesPerPossession") - 2.0 / 0.60) < 1e-12)
    val p11 = out.where($"match_id" === 1L && $"player_id" === 11L).head()
    assert(math.abs(p11.getAs[Double]("passesPerPossession") - 1.0 / 0.40) < 1e-12)
    // inner-join semantics: an event row without a match-stat row drops out
    val missing = events.union(Seq((3L, 12L, "Pass", "Complete", Seq(1.0, 1.0)))
      .toDF("match_id", "player_id", "type", "outcome", "location"))
    val out2 = EventSilver.run(missing, lineupEvents, adjCatalogue,
      matchPossession = Some(matchStats))
    assert(out2.where($"player_id" === 12L).count() == 0)
  }

  test("location array projection (P3)") {
    val xy = EventSilver.withLocationXY(events)
      .select("location_x", "location_y").head()
    assert(xy.getDouble(0) == 60.0 && xy.getDouble(1) == 40.0)
  }

  test("gold dimension builds (K6)") {
    val out = Seq(("p1", "EPL", "2024", "Rovers", "CB"))
      .toDF("profileId", "competitionName", "seasonName", "teamName", "positionGroup")
    val dims = Gold.dimensions(out).toMap
    assert(dims.keySet == Set("competition", "season", "team", "position"))
    assert(dims("team").head().getString(0) == "Rovers")
  }
}
