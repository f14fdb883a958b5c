package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BronzeSpec extends SparkSpec {
  import spark.implicits._
  import Bronze._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("F11: statsbomb and wyscout eligibility predicates") {
    val sb = Seq(
      (1L, "Complete", "available", "Normal"),
      (2L, "Complete", "available", "Abandoned"), // play_status out
      (3L, "In Progress", "available", "Normal"), // collection out
      (4L, "Complete", "scheduled", "Normal")) // match_status out
      .toDF("match_id", "collection_status", "match_status", "play_status")
    assert(sb.where(statsbombEligible).select("match_id").as[Long].collect().toSeq == Seq(1L))

    val wy = Seq((1L, true, "Played"), (2L, false, "Played"), (3L, true, "Fixture"))
      .toDF("matchId", "hasDataAvailable", "status")
    assert(wy.where(wyscoutEligible).select("matchId").as[Long].collect().toSeq == Seq(1L))
  }

  test("S10 bronze grain: landed-id listing + anti-join discovery") {
    val dir = tmp("landing")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "101.json"), "{}".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "103.json"), "{}".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "fixtures.json"), "{}".getBytes) // non-numeric: ignored
    val landed = landedIds(spark, dir)
    assert(landed.as[Long].collect().toSet == Set(101L, 103L))
    // missing dir -> empty, not an error
    assert(landedIds(spark, dir + "/nope").count() == 0)

    val eligible = Seq(101L, 102L, 103L, 104L).toDF("match_id")
    val todo = matchesToUpdate(eligible, "match_id", landed)
    assert(todo.as[Long].collect().toSet == Set(102L, 104L))
  }

  test("S8 fan-out: rewrite, retry with exponential backoff, no-data delete, error") {
    val dir = tmp("land8")
    def url(id: Long) = s"api/matches/$id/stats"
    def path(id: Long) = s"$dir/$id.json"
    // 3: stale landing file that the no-data branch must remove
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "3.json"), "stale".getBytes)

    val fetcher = new MapFetcher(
      pages = Map(
        url(1) -> FetchResponse(200, """{"match":1,"stats":[1,2]}"""),
        url(2) -> FetchResponse(200, """{"match":2,"stats":[3]}"""),
        url(3) -> FetchResponse(400, """{"error":{"message":"No statistical data available"}}""")),
      failures = Map(url(2) -> 2, url(4) -> 99)) // 2: flaky; 4: always down

    // tasks are closure-serialized even in local mode: record backoff via
    // an accumulator, the one channel that flows executor -> driver
    val sleeps = spark.sparkContext.collectionAccumulator[Long]("sleeps")
    val report = fanOutFetch(spark,
      Seq(1L, 2L, 3L, 4L).map(id => FetchTarget(id, url(id), path(id))),
      fetcher, parallelism = 2, maxRetries = 3, backoffMs = 100L,
      sleeper = ms => sleeps.add(ms))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

    assert(report(1L) == (("rewrite", 1)))
    assert(report(2L) == (("rewrite", 3))) // 2 transport failures, then 200
    assert(report(3L) == (("delete", 1)))
    assert(report(4L) == (("error", 3)))
    // landed payloads are the exact bodies; no-data file removed
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "1.json"))) == """{"match":1,"stats":[1,2]}""")
    assert(!new java.io.File(dir, "3.json").exists())
    assert(!new java.io.File(dir, "4.json").exists())
    // exponential backoff: match 2 slept 100,200; match 4 slept 100,200
    import scala.jdk.CollectionConverters._
    assert(sleeps.value.asScala.toSeq.sorted == Seq(100L, 100L, 200L, 200L))

    // landing zone is now readable as a bronze table (the engine's S1 path)
    val bronze = spark.read.option("multiLine", "true").json(s"$dir/*.json")
    assert(bronze.select(sum("match")).as[Long].head() == 3L)

    // incremental re-run: nothing eligible remains but the error row
    val eligible = Seq(1L, 2L, 3L, 4L).toDF("match_id")
    val todo = matchesToUpdate(eligible, "match_id", landedIds(spark, dir))
    assert(todo.as[Long].collect().toSet == Set(3L, 4L)) // 3 deleted, 4 errored
  }

  test("corrupt landing file quarantines instead of failing the silver read") {
    import org.apache.spark.sql.types._
    val dir = tmp("landq")
    val fetcher = new MapFetcher(Map(
      "api/1" -> FetchResponse(200, """{"match_id":1,"goals":2}"""),
      "api/2" -> FetchResponse(200, """{"match_id":2,"goals":5}""")))
    Bronze.fanOutFetch(spark,
      Seq(1L, 2L).map(i => FetchTarget(i, s"api/$i", s"$dir/$i.json")),
      fetcher, parallelism = 2).collect()
    // a provider half-wrote this one — truncated JSON mid-object
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "3.json"),
      """{"match_id":3,"go""".getBytes)
    val schema = StructType(Seq(StructField("match_id", LongType),
      StructField("goals", LongType)))
    val qr = graft.io.Quarantine.readJsonWithQuarantine(spark, dir, schema)
    assert(qr.good.as[(Long, Long)].collect().toSet == Set((1L, 2L), (2L, 5L)))
    val bad = qr.bad.collect()
    assert(bad.length == 1 && bad.head.getString(0).startsWith("""{"match_id":3"""))
    assert(bad.head.getString(1).endsWith("3.json")) // lineage to the landed file
    qr.release()
  }

  test("S9: parseHtmlTable is pd.read_html-shaped (th header, tag strip, entities)") {
    val html =
      """<html><body><p>noise</p>
        |<table class="stats"><tr><th>#</th><th> Player </th><th>Position</th><th>DISPOSAL</th></tr>
        |<tr><td>1</td><td><a href="/p/9">Smith &amp; Jones</a></td><td>MID</td><td>31</td></tr>
        |<tr><td>2</td><td>O'Brien</td><td>DEF&nbsp;</td><td>22</td></tr>
        |</table><table><tr><td>second table ignored</td></tr></table></body></html>""".stripMargin
    val (header, rows) = parseHtmlTable(html)
    assert(header == Seq("#", "Player", "Position", "DISPOSAL"))
    assert(rows == Seq(
      Seq("1", "Smith & Jones", "MID", "31"),
      Seq("2", "O'Brien", "DEF", "22")))
    assert(parseHtmlTable("<html>no table</html>") == ((Nil, Nil)))
  }

  test("S9: scrapeLong unions heterogeneous stat batches; scrapeWide pivots back") {
    def page(stat: String, v1: Int, v2: Int) =
      s"""<table><tr><th>Player</th><th>$stat</th></tr>
         |<tr><td>A</td><td>$v1</td></tr><tr><td>B</td><td>$v2</td></tr></table>""".stripMargin
    val fetcher = new MapFetcher(Map(
      "r?b=DISPOSAL" -> FetchResponse(200, page("DISPOSAL", 31, 22)),
      "r?b=KICK" -> FetchResponse(200, page("KICK", 12, 9)),
      "r?b=EMPTY" -> FetchResponse(200, "<html>maintenance</html>"),
      "r?b=DOWN" -> FetchResponse(500, "oops")))
    val long = scrapeLong(spark,
      Seq("DISPOSAL", "KICK", "EMPTY", "DOWN").map(b =>
        ScrapeRequest(s"r?b=$b", competitionId = 1L, seasonId = "2023")),
      fetcher, parallelism = 2)
    // two real pages x 2 rows x 2 cols each; failed/empty pages contribute 0
    assert(long.count() == 8)
    val wide = scrapeWide(long)
      .orderBy("Player")
      .select("competition_id", "season_id", "Player", "DISPOSAL", "KICK")
      .as[(Long, String, String, String, String)].collect().toSeq
    assert(wide == Seq(
      (1L, "2023", "A", "31", "12"),
      (1L, "2023", "B", "22", "9")))
  }
}
