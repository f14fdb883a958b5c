package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Bronze

/** Bronze-path queries (SURVEY.md §2.1 S8/S10) — the ingest pipeline under
  * the hash-checked oracle gate, same pattern as the multimodal codec
  * queries (q30/q88): the upstream content is a deterministic function of
  * the id, so DuckDB can replay in SQL what the engine must produce by
  * actually FETCHING, LANDING, and RE-READING it. A hash match proves the
  * whole loop — fan-out fetch over the Fetcher seam, retry on flaky
  * endpoints, the no-data delete branch, landing-zone JSON writes, nested
  * re-read projection — preserved every value end-to-end, not merely that
  * plumbing ran.
  */
object BronzeQueries {

  /** Deterministic synthetic API: content derives from the id in the URL.
    *  - id % 11 == 0  → the no-data error payload (never lands);
    *  - id % 13 == 0  → transport failure on the FIRST attempt, then
    *    serves (exercises the retry loop inside the measured query);
    *  - otherwise     → nested match JSON with integer scores.
    * Per-instance attempt counts: each fan-out task fetches a URL at most
    * maxRetries times through its own deserialized copy, so "fail the
    * first attempt" is well-defined wherever the task runs. */
  final class SyntheticApi extends Bronze.Fetcher {
    private val tries = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    override def fetch(url: String): Bronze.FetchResponse = {
      val id = url.substring(url.lastIndexOf('/') + 1).toLong
      val n = tries.merge(url, 1, (a, b) => a + b).intValue
      if (id % 13 == 0 && n == 1)
        Bronze.FetchResponse(0, "", Some("synthetic transport flake"))
      else if (id % 11 == 0)
        Bronze.FetchResponse(400,
          """{"error":{"message":"No statistical data available"}}""")
      else
        Bronze.FetchResponse(200,
          s"""{"match_id":$id,"score":{"home":${(id * 17 + 3) % 7},"away":${(id * 5 + 1) % 5}}}""")
    }
  }

  private val landedSchema = StructType(Seq(
    StructField("match_id", LongType),
    StructField("score", StructType(Seq(
      StructField("home", LongType), StructField("away", LongType))))))

  val all: Seq[Q] = Seq(
    // End-to-end bronze ingest: every 23rd document id is a "match" to
    // pull. The fan-out lands nested JSON per match (flaky ids retry once,
    // no-data ids exercise the delete branch and never land), then the
    // landing zone is re-read as the silver input and projected flat. The
    // oracle replays the content formula over `documents` — the landed
    // files must carry EXACTLY the synthetic API's values through the
    // fetch→write→read loop for the hash to match. The match-list collect
    // is fetch-target construction (the reference's fixture list), bounded
    // by the match grain, never the corpus.
    Q.sql("q104_bronze_ingest",
      """SELECT doc_id AS match_id,
        |       (doc_id*17 + 3) % 7 + (doc_id*5 + 1) % 5 AS goals,
        |       3 * ((doc_id*17 + 3) % 7 + (doc_id*5 + 1) % 5) AS points
        |FROM documents
        |WHERE doc_id % 23 = 0 AND doc_id % 11 <> 0
        |ORDER BY match_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val land = java.nio.file.Files.createTempDirectory("q104land").toString
      val ids = graft.io.Tables.documents(s, d)
        .where(pmod(col("doc_id"), lit(23)) === 0)
        .select("doc_id").as[Long].collect().toSeq.sorted
      val report = Bronze.fanOutFetch(s,
        ids.map(id => Bronze.FetchTarget(id, s"api/matches/$id", s"$land/$id.json")),
        new SyntheticApi, parallelism = 8, maxRetries = 3, backoffMs = 1L,
        sleeper = _ => ())
      // materialize the fan-out and insist nothing errored — a silent
      // partial landing would otherwise just shrink the output
      val byOutcome = report.groupBy("outcome").count()
        .as[(String, Long)].collect().toMap
      require(!byOutcome.contains("error"),
        s"bronze fan-out had errors: $byOutcome")
      s.read.schema(landedSchema).json(s"$land/*.json")
        .select(col("match_id"),
          (col("score.home") + col("score.away")).as("goals"),
          (lit(3) * (col("score.home") + col("score.away"))).as("points"))
        .orderBy("match_id")
    })
}
