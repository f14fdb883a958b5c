package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CsvSilverSpec extends SparkSpec {
  import spark.implicits._

  test("CSV silver: header cleanup, player/team split, ratio stats, zero-denominator drop") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/stats.csv"),
      """Player,Kick - Long,Mark  Count,Disposal
        |John Doe (RVR),10,4,20
        |Jane Roe (CTY),6,2,0
        |""".stripMargin)
    val raw = CsvSilver.readCsv(spark, dir)
    val clean = CsvSilver.cleanse(raw)
    assert(clean.columns.toSeq == Seq("Player", "Kick Long", "Mark Count", "Disposal"))
    val split = CsvSilver.splitPlayerTeam(clean)
    val r = split.where($"teamAbbr" === "RVR").head()
    assert(r.getAs[String]("playerName") == "John Doe")
    val ratios = CsvSilver.withRatioStats(split, Seq("Mark Count"))
    assert(ratios.count() == 1) // zero-Disposal row dropped (F12)
    assert(ratios.head().getAs[Double]("Mark CountPerDisposal") == 0.2)
  }

  test("position reassignment overwrites from the curated table then dedupes (J13)") {
    val df = Seq(("John Doe", "FWD", 10), ("John Doe", "MID", 8), ("Jane Roe", "DEF", 5))
      .toDF("playerName", "position", "apps")
    val curated = Seq(("John Doe", "MID")).toDF("playerName", "position")
    val out = CsvSilver.reassignPositions(df, curated)
      .select("playerName", "position").as[(String, String)].collect().toSet
    assert(out == Set(("John Doe", "MID"), ("Jane Roe", "DEF")))
  }
}
