package graft.queries

import graft.pipelines.{DemoFixture, Gold, GoldConfig, Silver}

/** The full domain lifecycle — provider JSON → silver profile rows → gold
  * Metric/Trait/Rating — driven end-to-end on the deterministic in-memory
  * fixture (the driver's tables carry no provider-shaped data, so this is a
  * rows-only check; values are pinned by the ScalaTest pipeline specs).
  */
object DomainQueries {

  val all: Seq[Q] = Seq(
    Q.rowsOnly("q27_silver_profiles") { (s, _) =>
      Silver.run(DemoFixture.playerStats(s), DemoFixture.lineups(s),
        DemoFixture.competitions(s), DemoFixture.teams(s),
        DemoFixture.silverConfig, DemoFixture.metaCols)
        .orderBy("profileId")
    },

    Q.rowsOnly("q28_gold_ratings") { (s, _) =>
      val silver = Silver.run(DemoFixture.playerStats(s), DemoFixture.lineups(s),
        DemoFixture.competitions(s), DemoFixture.teams(s),
        DemoFixture.silverConfig, DemoFixture.metaCols)
      Gold.run(silver, DemoFixture.goldWeights(s),
        Seq("totalPasses", "passesPerNinety", "totalDuels", "goals"),
        GoldConfig(minSampleSize = 2, minMinutes = 150))
        .orderBy("profileId")
    })
}
