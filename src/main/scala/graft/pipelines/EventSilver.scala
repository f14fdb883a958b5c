package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{FeatureSpec, FeatureStore}

/** Event-level silver (the StatsBomb path, SURVEY.md §3.2): raw per-event
  * records → compiled per-event conditional stats → per-(match, player)
  * match-stat rows, enriched with card counts — the A2 instance of the
  * FeatureStore surface plus the J7 outer-join pattern. Downstream (profile
  * aggregation, last-N windows, meta) reuses the same Silver stages.
  */
object EventSilver {

  /** P7 — filename→column lineage: extract an id from the source file path
    * (STAGING/SILVER-adapter-statsbomb-notebook.ipynb:171). */
  def matchIdFromFile(pattern: String = raw".*/(\d+)\.json$$"): Column =
    regexp_extract(input_file_name(), pattern, 1)

  /** P3 — x/y from the 2-element location array. */
  def withLocationXY(events: DataFrame, locCol: String = "location"): DataFrame =
    events
      .withColumn("location_x", element_at(col(locCol), 1))
      .withColumn("location_y", element_at(col(locCol), 2))

  /** A2 — compiled event→match aggregation: the stats catalogue is data
    * (SUM(CASE WHEN …) snippets), exactly like the profile feature store. */
  def aggregateEvents(events: DataFrame, catalogue: Seq[FeatureSpec]): DataFrame =
    FeatureStore.aggregate(events, Seq("match_id", "player_id"), catalogue)

  /** J6 — possession attach (…statsbomb-notebook.ipynb "Merge team
    * possessions for adj stats derivations"): carry each player-match's
    * possession share onto its events so the compiled catalogue can express
    * possession-adjusted stats. Inner join like the reference — events
    * without a match-stat row carry no usable possession. The stats side is
    * per-(player, match) — orders of magnitude smaller than the event feed —
    * so AQE resolves this to a broadcast at typical sizes; the keyed shuffle
    * on (player_id, match_id) is the fallback and matches the aggregation
    * key, so the exchange is reused by aggregateEvents. */
  def attachPossession(events: DataFrame, matchStats: DataFrame,
                       possessionCol: String = "player_match_possession"): DataFrame =
    events.join(
      matchStats.select(col("player_id"), col("match_id"), col(possessionCol)),
      Seq("player_id", "match_id"))

  /** A3+J7 — per-colour card counts full-outer-joined and zero-filled
    * (…statsbomb-notebook.ipynb:187). */
  def cardCounts(lineupEvents: DataFrame): DataFrame = {
    val yellow = lineupEvents.where(col("card_type") === "Yellow Card")
      .groupBy("match_id", "player_id").agg(count(lit(1)).as("yellowCards"))
    val red = lineupEvents.where(col("card_type") === "Red Card")
      .groupBy("match_id", "player_id").agg(count(lit(1)).as("redCards"))
    yellow.join(red, Seq("match_id", "player_id"), "outer")
      .na.fill(0, Seq("yellowCards", "redCards"))
  }

  /** Full event-level hop: events + lineup events → match-stat rows.
    * `matchPossession`, when given, is attached before aggregation (J6) so
    * catalogue snippets may reference `player_match_possession`. */
  def run(events: DataFrame, lineupEvents: DataFrame,
          catalogue: Seq[FeatureSpec],
          matchPossession: Option[DataFrame] = None): DataFrame = {
    val base = withLocationXY(events)
    val enriched = matchPossession.fold(base)(attachPossession(base, _))
    val stats = aggregateEvents(enriched, catalogue)
    stats.join(cardCounts(lineupEvents), Seq("match_id", "player_id"), "left")
      .na.fill(0, Seq("yellowCards", "redCards"))
  }
}
