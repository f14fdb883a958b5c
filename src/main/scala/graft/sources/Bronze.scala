package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze ingestion (SURVEY.md §2.1 S8/S9, §2.3 F11) — the landing-zone
  * side of the pipeline, re-expressed Spark-first.
  *
  * The reference runs bronze as single-machine scripts: a
  * `ThreadPoolExecutor` fans per-match GETs out over local threads
  * (UPDATERS/wyscout-bronze-batch.py:232-237,
  * statsbomb-bronze-batch.py:177-184), retries with linear/exponential
  * backoff (wyscout-bronze-batch.py:51-86, 171-177), filters the fixture
  * list to playable matches (statsbomb-bronze-batch.py:116-118 — F11),
  * skips matches whose landing file already exists
  * (statsbomb-bronze-batch.py:125-136), and writes one raw JSON per match.
  *
  * Here the same contract is a Spark job:
  *
  *   - The per-match fan-out is `mapPartitions` over the to-update frame —
  *     every EXECUTOR is a puller, not every thread of one driver box, so
  *     ingest parallelism scales with the cluster, and the per-match
  *     outcome ("rewrite" / "delete" / "error" — the reference's exact
  *     vocabulary) comes back as a DataFrame instead of stdout lines.
  *   - Retry/backoff is per-row executor-local state; the network and the
  *     clock are injected ([[Fetcher]], `sleeper`) so the job is testable
  *     with zero egress and zero wall-clock.
  *   - Landing writes go through the Hadoop FileSystem API from the
  *     executors, so `file://`, `hdfs://` and `s3a://` landing zones all
  *     work unchanged, and no payload ever routes through the driver.
  *   - Incremental discovery is the S10 anti-join: eligible matches
  *     LEFT ANTI JOIN already-landed ids (listing is driver-side FS
  *     metadata, same as Spark's own scan planning).
  *
  * Nothing here opens a socket: the one seam that would ([[Fetcher]]) is a
  * trait the deployment supplies. Tests and CI use map-backed fixtures.
  */
object Bronze {

  /** One fetch result: HTTP status + body. `error` models a transport
    * failure (the reference's `RequestException` branch). */
  final case class FetchResponse(status: Int, body: String,
                                 error: Option[String] = None)

  /** The network seam. Implementations ship to executors — keep them
    * Serializable and connection-lazy (build the client inside `fetch` or
    * in a transient lazy val, never in a constructor field). */
  trait Fetcher extends Serializable {
    def fetch(url: String): FetchResponse
  }

  /** Deterministic in-memory fetcher for tests/fixtures. `failures` makes a
    * URL fail with a transport error that many times before serving — the
    * retry-path fixture. */
  final class MapFetcher(pages: Map[String, FetchResponse],
                         failures: Map[String, Int] = Map.empty)
      extends Fetcher {
    private val seen = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    def attempts(url: String): Int = Option(seen.get(url)).fold(0)(_.intValue)
    override def fetch(url: String): FetchResponse = {
      val n = seen.merge(url, 1, (a, b) => a + b).intValue
      if (n <= failures.getOrElse(url, 0))
        FetchResponse(0, "", Some(s"simulated transport failure $n"))
      else pages.getOrElse(url, FetchResponse(404, """{"error":"not found"}"""))
    }
  }

  // ---------------------------------------------------------------- F11 --

  /** F11 — the statsbomb playable-match predicate
    * (statsbomb-bronze-batch.py:116-118): only completed, available,
    * normally-played matches are worth a stats call. */
  val statsbombEligible: Column =
    col("collection_status") === "Complete" &&
      col("match_status") === "available" &&
      col("play_status") === "Normal"

  /** F11 — the wyscout form (wyscout-bronze-batch.py:224:
    * `hasDataAvailable && status == 'Played'`). */
  val wyscoutEligible: Column =
    col("hasDataAvailable") && col("status") === "Played"

  // -------------------------------------------- incremental discovery --

  /** Ids already landed under `landingDir` as `<id>.json` (non-numeric
    * names are ignored, exactly like the reference's `isdigit()` guard in
    * list_s3_files). Driver-side FS METADATA listing — the same class of
    * work Spark's own scan planning does; no file content is read. */
  def landedIds(spark: SparkSession, landingDir: String): DataFrame = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(landingDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids =
      if (!fs.exists(path)) Seq.empty[Long]
      else fs.listStatus(path).toSeq
        .filter(_.isFile)
        .map(_.getPath.getName)
        .collect { case n if n.endsWith(".json") &&
          n.stripSuffix(".json").forall(_.isDigit) && n != ".json" =>
          n.stripSuffix(".json").toLong
        }
    ids.toDF("landed_id")
  }

  /** S10 at the bronze grain: eligible matches not yet landed. One
    * broadcast anti-join — the landed-id side is filenames, never data. */
  def matchesToUpdate(eligible: DataFrame, idCol: String,
                      landed: DataFrame): DataFrame =
    eligible.join(broadcast(landed),
      eligible(idCol) === landed("landed_id"), "left_anti")

  // ------------------------------------------------------ S8 fan-out --

  /** One landing target: fetch `url`, write the body to `landPath`. */
  final case class FetchTarget(id: Long, url: String, landPath: String)

  private val reportSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("outcome", StringType, nullable = false),
    StructField("attempts", IntegerType, nullable = false),
    StructField("detail", StringType, nullable = true)))

  /** S8 — the distributed per-match pull. For each target: GET with up to
    * `maxRetries` attempts and exponential backoff, then
    *   - 200 → write the body to its landing path, outcome "rewrite";
    *   - a payload matching `noDataMarker` → DELETE any stale landing file,
    *     outcome "delete" (the reference's "No statistical data available"
    *     branch, wyscout-bronze-batch.py:69-78);
    *   - retries exhausted → outcome "error", nothing written.
    *
    * The returned report is a DataFrame (id, outcome, attempts, detail) —
    * aggregate it, join it, or upsert it to an ops table; the reference
    * could only print.
    *
    * `parallelism` bounds concurrent pullers cluster-wide (politeness to
    * the upstream API): one task = one serial puller. The repartition is a
    * shuffle of the match LIST (ids and URLs), never of payloads — payloads
    * stream executor→landing zone directly.
    *
    * `sleeper` is injected so specs can count backoff without waiting it
    * out. Backoff is `backoffMs * 2^attempt`, the reference's exponential
    * form (wyscout-bronze-batch.py:171-177).
    */
  def fanOutFetch(spark: SparkSession, targets: Seq[FetchTarget],
                  fetcher: Fetcher, parallelism: Int, maxRetries: Int = 3,
                  backoffMs: Long = 500L, noDataMarker: String = "No statistical data available",
                  sleeper: Long => Unit = Thread.sleep): DataFrame = {
    require(parallelism >= 1, "parallelism must be >= 1")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext
      .parallelize(targets, math.min(parallelism, math.max(1, targets.size)))
      .mapPartitions { it =>
        it.map { t =>
          var attempt = 0
          var done: Row = null
          while (done == null && attempt < maxRetries) {
            val r = fetcher.fetch(t.url)
            if (r.error.isEmpty && r.status == 200) {
              val p = new org.apache.hadoop.fs.Path(t.landPath)
              val fs = p.getFileSystem(hconf.value)
              val out = fs.create(p, true)
              try out.write(r.body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
              done = Row(t.id, "rewrite", attempt + 1, null)
            } else if (r.error.isEmpty && r.body.contains(noDataMarker)) {
              val p = new org.apache.hadoop.fs.Path(t.landPath)
              val fs = p.getFileSystem(hconf.value)
              if (fs.exists(p)) fs.delete(p, false)
              done = Row(t.id, "delete", attempt + 1, null)
            } else {
              attempt += 1
              if (attempt < maxRetries) sleeper(backoffMs << (attempt - 1))
            }
          }
          if (done != null) done
          else Row(t.id, "error", attempt, s"max retries exceeded for ${t.url}")
        }
      }
    spark.createDataFrame(rdd, reportSchema)
  }

  // -------------------------------------------------------- S9 scrape --

  /** Parse the FIRST <table> of an HTML page into (header, rows) — the
    * JDK-only counterpart of the notebook's `pd.read_html(...)[0]`
    * (scrape_champion_CIA_players.ipynb cells 1-4). Header cells come from
    * <th> (falling back to the first row), data cells from <td>; nested
    * tags inside a cell are stripped and the common entities decoded.
    * Pure function — unit-testable without Spark. */
  def parseHtmlTable(html: String): (Seq[String], Seq[Seq[String]]) = {
    val table = "(?is)<table[^>]*>(.*?)</table>".r
      .findFirstMatchIn(html).map(_.group(1)).getOrElse("")
    val rows = "(?is)<tr[^>]*>(.*?)</tr>".r
      .findAllMatchIn(table).map(_.group(1)).toSeq
    def cells(row: String, tag: String): Seq[String] =
      s"(?is)<$tag[^>]*>(.*?)</$tag>".r.findAllMatchIn(row).map { m =>
        m.group(1).replaceAll("(?s)<[^>]*>", "")
          .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
          .replace("&nbsp;", " ").trim
      }.toSeq
    val header = rows.headOption.map { r =>
      val th = cells(r, "th"); if (th.nonEmpty) th else cells(r, "td")
    }.getOrElse(Nil)
    val data = rows.drop(1).map(cells(_, "td")).filter(_.nonEmpty)
    (header, data)
  }

  /** One scrape request: a page URL plus the provenance the notebook
    * attaches to every frame (competition/season — cell 3). */
  final case class ScrapeRequest(url: String, competitionId: Long,
                                 seasonId: String)

  private val scrapeSchema = StructType(Seq(
    StructField("competition_id", LongType, nullable = false),
    StructField("season_id", StringType, nullable = false),
    StructField("row_idx", IntegerType, nullable = false),
    StructField("col_name", StringType, nullable = false),
    StructField("cell", StringType, nullable = true)))

  /** S9 — distributed scrape to a LONG-form frame
    * (competition_id, season_id, row_idx, col_name, cell).
    *
    * The notebook loops (competition × season × stat-batch) serially in one
    * process and gets a differently-shaped pandas frame per stat batch.
    * Long form solves both problems at once: every page lands in ONE
    * uniform schema regardless of which stat columns its table carries, so
    * the whole sweep is a single Spark job whose results union trivially —
    * pivot back to wide per consumer (`pivot` on col_name), which is
    * exactly the notebook's manual `df.columns = [...]` step made explicit.
    * Pages that fail to fetch or carry no table contribute zero rows (the
    * notebook's `if html_data:` guard). */
  def scrapeLong(spark: SparkSession, requests: Seq[ScrapeRequest],
                 fetcher: Fetcher, parallelism: Int): DataFrame = {
    require(parallelism >= 1, "parallelism must be >= 1")
    val rdd = spark.sparkContext
      .parallelize(requests, math.min(parallelism, math.max(1, requests.size)))
      .mapPartitions { it =>
        it.flatMap { req =>
          val r = fetcher.fetch(req.url)
          if (r.error.nonEmpty || r.status != 200) Iterator.empty
          else {
            val (header, rows) = parseHtmlTable(r.body)
            rows.iterator.zipWithIndex.flatMap { case (cellsRow, i) =>
              header.zip(cellsRow).map { case (h, c) =>
                Row(req.competitionId, req.seasonId, i, h, c)
              }
            }
          }
        }
      }
    spark.createDataFrame(rdd, scrapeSchema)
  }

  /** Widen a [[scrapeLong]] frame back to one column per scraped stat for
    * a single page shape. The pivot's value set is discovered by Spark
    * (one extra metadata-sized pass over col_name — bounded by the stat
    * vocabulary, not the row count). */
  def scrapeWide(long: DataFrame): DataFrame =
    long.groupBy("competition_id", "season_id", "row_idx")
      .pivot("col_name")
      .agg(first(col("cell")))
      .drop("row_idx")
}
