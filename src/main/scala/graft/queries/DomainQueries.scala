package graft.queries

import graft.pipelines.{DemoFixture, Gold, GoldConfig, Silver}

/** The full domain lifecycle — provider JSON → silver profile rows → gold
  * Metric/Trait/Rating — driven end-to-end on the deterministic in-memory
  * fixture, with DuckDB oracles that REPLAY the whole pipeline.
  *
  * The oracle regenerates the fixture inside SQL (`range()` cross joins over
  * the same modular arithmetic as DemoFixture) rather than reading a parquet
  * dump: the driver's checker treats every directory in the verify output as
  * a query result, so a side-band fixture dump would pollute its report,
  * while a self-contained statement keeps the contract exactly "one SQL
  * string per query". Any drift between the Scala fixture and the SQL
  * arithmetic fails the hash compare, which is the point of the oracle.
  *
  * Determinism notes: every aggregated value is an integer-valued double
  * (exact in IEEE at any summation order) until the z-score stage; the
  * z-score → weighted-hierarchy stage mirrors q17's proven construction,
  * and the final 2dp rounding is Qutil.dround's floor form on both sides.
  */
object DomainQueries {

  private val threshold = 33.0

  /** Shared WITH-clause body reproducing Silver.run on the DemoFixture:
    * flatten (rows generated directly at the flattened grain) → ANY union →
    * playtime threshold (F2) → lookup joins (J1-J3, encoded in the row
    * arithmetic) → derive (C1/C5/C6) → per-period aggregation (A1/W1) →
    * meta re-attach (J4) → season-totals self-join (J5) → 3-way type
    * enforcement (C8). */
  private val silverCtes: String =
    s"""base AS (
       |  SELECT
       |    555000 + m AS matchId,
       |    1000 + t * 100 + p AS pid,
       |    t,
       |    CASE WHEN p = 9 THEN 15 ELSE 90 END AS minutes,
       |    20 + ((1000 + t * 100 + p) * 7 + m * 13) % 40 AS passes,
       |    5 + ((1000 + t * 100 + p) * 3 + m) % 10 AS duels,
       |    CASE WHEN ((1000 + t * 100 + p) + m) % 17 = 0 THEN 1 ELSE 0 END AS goals,
       |    CASE WHEN p = 0 THEN 'GK' WHEN p <= 3 THEN 'CB'
       |         WHEN p <= 6 THEN 'MF' ELSE 'FW' END AS posGrp,
       |    3000 + t AS teamId
       |  FROM range(1, 7) r1(m)
       |  CROSS JOIN range(0, 4) r2(t)
       |  CROSS JOIN range(0, 10) r3(p)
       |),
       |keyed AS (
       |  SELECT *,
       |    CAST(pid AS VARCHAR) || CAST(teamId AS VARCHAR) ||
       |      '190042' || '335' || positionGroup AS baseProfileId,
       |    rank() OVER (PARTITION BY pid, teamId, positionGroup
       |                 ORDER BY matchId DESC) AS rk
       |  FROM (
       |    SELECT matchId, pid, t, minutes, passes, duels, goals,
       |           posGrp AS positionGroup, teamId FROM base
       |    UNION ALL
       |    SELECT matchId, pid, t, minutes, passes, duels, goals,
       |           'ANY' AS positionGroup, teamId FROM base
       |  ) u
       |  WHERE minutes > $threshold OR positionGroup = 'ANY'
       |),
       |agg AS (
       |  SELECT baseProfileId, 'season' AS aggregationPeriod,
       |         count(*) AS sampleSize, sum(minutes) AS totalMinutesInSample,
       |         sum(passes) AS totalPasses,
       |         sum(passes) * 90.0 / sum(minutes) AS passesPerNinety,
       |         sum(duels) AS totalDuels, sum(goals) AS goals
       |  FROM keyed GROUP BY baseProfileId
       |  UNION ALL
       |  SELECT baseProfileId, 'lastFour', count(*), sum(minutes), sum(passes),
       |         sum(passes) * 90.0 / sum(minutes), sum(duels), sum(goals)
       |  FROM keyed WHERE rk <= 4 GROUP BY baseProfileId
       |  UNION ALL
       |  SELECT baseProfileId, 'lastEight', count(*), sum(minutes), sum(passes),
       |         sum(passes) * 90.0 / sum(minutes), sum(duels), sum(goals)
       |  FROM keyed WHERE rk <= 8 GROUP BY baseProfileId
       |),
       |meta AS (
       |  SELECT DISTINCT
       |    baseProfileId,
       |    CAST(pid AS VARCHAR) AS playerId,
       |    CAST(teamId AS VARCHAR) AS teamId,
       |    '190042' AS seasonId,
       |    '335' AS competitionId,
       |    'P' || CAST(pid AS VARCHAR) AS playerName,
       |    'Team' || CAST(t AS VARCHAR) AS teamName,
       |    'Premier League' AS competitionName,
       |    2024 AS seasonName,
       |    positionGroup,
       |    34 - pid % 14 - (CASE WHEN pid % 9 IN (7, 8) THEN 1 ELSE 0 END) AS age,
       |    CASE pid % 3 WHEN 0 THEN 'Narnia' WHEN 1 THEN 'Oz'
       |         ELSE 'Utopia' END AS nationality,
       |    'P' || CAST(pid AS VARCHAR) || ' Team' || CAST(t AS VARCHAR) ||
       |      ' 2024 EPL' AS playerTeamSeasonCompetition,
       |    '190042' AS seasonPartition
       |  FROM keyed
       |),
       |seasontot AS (
       |  SELECT m.playerId, m.teamId, m.seasonId, m.competitionId,
       |         a.totalMinutesInSample AS totalMinutesForSeason,
       |         a.sampleSize AS appearancesForSeason
       |  FROM agg a JOIN meta m USING (baseProfileId)
       |  WHERE m.positionGroup = 'ANY' AND a.aggregationPeriod = 'season'
       |),
       |silver AS (
       |  SELECT
       |    CASE WHEN a.aggregationPeriod = 'season' THEN a.baseProfileId
       |         ELSE a.baseProfileId || '-' || a.aggregationPeriod END AS profileId,
       |    CAST(a.sampleSize AS INTEGER) AS sampleSize,
       |    CAST(a.totalMinutesInSample AS INTEGER) AS totalMinutesInSample,
       |    CAST(a.totalPasses AS DOUBLE) AS totalPasses,
       |    CAST(a.passesPerNinety AS DOUBLE) AS passesPerNinety,
       |    CAST(a.totalDuels AS DOUBLE) AS totalDuels,
       |    CAST(a.goals AS DOUBLE) AS goals,
       |    a.aggregationPeriod,
       |    m.playerId, m.teamId, m.seasonId, m.competitionId,
       |    m.playerName, m.teamName, m.competitionName,
       |    CAST(m.seasonName AS INTEGER) AS seasonName,
       |    m.positionGroup,
       |    CAST(m.age AS INTEGER) AS age,
       |    m.nationality, m.playerTeamSeasonCompetition, m.seasonPartition,
       |    CAST(st.totalMinutesForSeason AS INTEGER) AS totalMinutesForSeason,
       |    CAST(st.appearancesForSeason AS INTEGER) AS appearancesForSeason
       |  FROM agg a
       |  JOIN meta m USING (baseProfileId)
       |  LEFT JOIN seasontot st
       |    ON st.playerId = m.playerId AND st.teamId = m.teamId
       |   AND st.seasonId = m.seasonId AND st.competitionId = m.competitionId
       |)""".stripMargin

  private val q27Oracle: String =
    s"""WITH $silverCtes
       |SELECT * FROM silver ORDER BY profileId""".stripMargin

  /** Gold replay: eligibility (F4-F8) → per-cell z-scores (A5/C11, sample
    * ddof) → weighted metric/trait/Rating hierarchy (C12) → dround 2dp. */
  private val q28Oracle: String = {
    val weightValues = DemoFixture.goldWeightRows.map { case (pos, stat, sw, mn, mw, tn, tw, inv) =>
      s"('$pos', '$stat', $sw, '$mn', $mw, '$tn', $tw, $inv)"
    }.mkString(",\n    ")
    def zsCol(s: String): String =
      s"""coalesce(CASE WHEN coalesce(stddev_samp($s) OVER w, 0) = 0 THEN 0
         |      ELSE ($s - avg($s) OVER w) / stddev_samp($s) OVER w END, 0) AS zs_$s""".stripMargin
    s"""WITH $silverCtes,
       |weights(pos, statName, statWgt, metricName, metricWgt,
       |        traitName, traitWgt, inverse) AS (VALUES
       |    $weightValues
       |),
       |eligible AS (
       |  SELECT * FROM silver
       |  WHERE aggregationPeriod = 'season'
       |    AND sampleSize >= 2 AND totalMinutesInSample >= 150
       |    AND playerName IS NOT NULL AND teamName IS NOT NULL
       |    AND seasonName IS NOT NULL AND competitionName IS NOT NULL
       |    AND positionGroup <> 'ANY'
       |),
       |zs AS (
       |  SELECT profileId, positionGroup,
       |    ${zsCol("totalPasses")},
       |    ${zsCol("passesPerNinety")},
       |    ${zsCol("totalDuels")},
       |    ${zsCol("goals")}
       |  FROM eligible
       |  WINDOW w AS (PARTITION BY positionGroup, competitionName, seasonName)
       |),
       |long AS (
       |  SELECT profileId, positionGroup, 'totalPasses' AS statName, zs_totalPasses AS zs FROM zs
       |  UNION ALL SELECT profileId, positionGroup, 'passesPerNinety', zs_passesPerNinety FROM zs
       |  UNION ALL SELECT profileId, positionGroup, 'totalDuels', zs_totalDuels FROM zs
       |  UNION ALL SELECT profileId, positionGroup, 'goals', zs_goals FROM zs
       |),
       |metric AS (
       |  SELECT l.profileId, w.metricName,
       |         sum((CASE WHEN w.inverse THEN -l.zs ELSE l.zs END) * w.statWgt) + 2.5 AS metricScore,
       |         max(w.metricWgt) AS metricWgt,
       |         max(w.traitName) AS traitName,
       |         max(w.traitWgt) AS traitWgt
       |  FROM long l JOIN weights w
       |    ON l.statName = w.statName AND l.positionGroup = w.pos
       |  GROUP BY l.profileId, w.metricName
       |),
       |tr AS (
       |  SELECT profileId, traitName,
       |         sum(metricScore * metricWgt) AS traitScore,
       |         max(traitWgt) AS traitWgt
       |  FROM metric GROUP BY profileId, traitName
       |),
       |rating AS (
       |  SELECT profileId, sum(traitScore * traitWgt) AS r FROM tr GROUP BY profileId
       |)
       |SELECT p.profileId,
       |  floor(p.d * 100 + 0.5) / 100 AS Distribution,
       |  floor(p.u * 100 + 0.5) / 100 AS Duelling,
       |  floor(p.s * 100 + 0.5) / 100 AS Scoring,
       |  floor(t.ob * 100 + 0.5) / 100 AS OnBall,
       |  floor(t.th * 100 + 0.5) / 100 AS Threat,
       |  floor(r.r * 100 + 0.5) / 100 AS Rating
       |FROM (SELECT profileId,
       |        max(CASE WHEN metricName = 'Distribution' THEN metricScore END) AS d,
       |        max(CASE WHEN metricName = 'Duelling' THEN metricScore END) AS u,
       |        max(CASE WHEN metricName = 'Scoring' THEN metricScore END) AS s
       |      FROM metric GROUP BY profileId) p
       |JOIN (SELECT profileId,
       |        max(CASE WHEN traitName = 'OnBall' THEN traitScore END) AS ob,
       |        max(CASE WHEN traitName = 'Threat' THEN traitScore END) AS th
       |      FROM tr GROUP BY profileId) t USING (profileId)
       |JOIN rating r USING (profileId)
       |ORDER BY p.profileId""".stripMargin
  }

  /** q230/q232 shared oracle: the 42-bit Morton interleave and the box
    * rows — the Column (`Layout.readZBox`) and TVF (`graft_zbox`)
    * surfaces are held hash-for-hash to this one text (the q221/q223
    * twin discipline applied to layout). */
  private val zorderBoxOracle: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       CAST(list_reduce(list_transform(generate_series(0, 41), j ->
      |         (((CASE WHEN j % 2 = 0 THEN l_partkey ELSE l_suppkey END)
      |           >> (j // 2)) & 1) << j), (a, b) -> a + b) AS BIGINT) AS zv
      |FROM lineitem
      |WHERE l_partkey BETWEEN 100 AND 499
      |  AND l_suppkey BETWEEN 1 AND 25
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""
      .stripMargin

  /** Shared by q243 (batch versioned z-layout) and q245 (the STREAMED
    * versioned z-layout) — the q230/q239 twin discipline applied to the
    * table-format path: the mod-256 residues and the 16-bit interleave
    * replayed as a plain filter. */
  private val versionedZOracle: String =
    """WITH z AS (
      |  SELECT l_orderkey, l_linenumber,
      |         l_partkey % 256 AS pk, l_suppkey % 256 AS sk,
      |         CAST(list_reduce(list_transform(generate_series(0, 15), j ->
      |           (((CASE WHEN j % 2 = 0 THEN l_partkey % 256
      |                   ELSE l_suppkey % 256 END)
      |             >> (j // 2)) & 1) << j), (a, b) -> a + b) AS BIGINT) AS zv
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, pk, sk, zv
      |FROM z WHERE pk BETWEEN 50 AND 120 AND sk BETWEEN 1 AND 90
      |ORDER BY l_orderkey, l_linenumber, pk, sk""".stripMargin

  /** Shared by q236 (Column read path) and q240 (the one-call TVF) —
    * the hash-for-hash twin discipline. */
  private val zorderEncodedOracle: String =
    """SELECT strftime(o_orderdate, '%Y-%m-%d') AS odate,
      |       o_orderpriority AS prio, count(*) AS n_orders,
      |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
      |  AND o_orderpriority >= '1-URGENT' AND o_orderpriority <= '2-HIGH'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(
    Q.sql("q27_silver_profiles", q27Oracle) { (s, _) =>
      Silver.run(DemoFixture.playerStats(s), DemoFixture.lineups(s),
        DemoFixture.competitions(s), DemoFixture.teams(s),
        DemoFixture.silverConfig, DemoFixture.metaCols)
        .orderBy("profileId")
    },

    Q.sql("q28_gold_ratings", q28Oracle) { (s, _) =>
      val silver = Silver.run(DemoFixture.playerStats(s), DemoFixture.lineups(s),
        DemoFixture.competitions(s), DemoFixture.teams(s),
        DemoFixture.silverConfig, DemoFixture.metaCols)
      Gold.run(silver, DemoFixture.goldWeights(s),
        Seq("totalPasses", "passesPerNinety", "totalDuels", "goals"),
        GoldConfig(minSampleSize = 2, minMinutes = 150))
        .orderBy("profileId")
    },

    // FULL LIFECYCLE, bronze → silver → gold in one query (SURVEY §3):
    // the provider feed is FETCHED through the Bronze fan-out seam (one
    // flaky match exercises the retry loop), LANDED as per-match JSON
    // files, RE-READ from the landing zone with schema inference, then run
    // through the complete Silver.run → Gold.run pipeline to Ratings. The
    // oracle is exactly q28's — a hash match proves the landing-zone
    // round trip is byte-preserving THROUGH the whole pipeline: any
    // fetch/write/read/inference drift would shift a stat, a z-score, and
    // the final 2dp-rounded Rating.
    Q.sql("q112_lifecycle_bronze_to_gold", q28Oracle) { (s, _) =>
      import s.implicits._
      val land = java.nio.file.Files.createTempDirectory("q112land").toString
      val targets = (1 to 6).map { m =>
        graft.sources.Bronze.FetchTarget(555000L + m,
          s"api/feed/${555000 + m}", s"$land/${555000 + m}.json")
      }
      val api = new graft.sources.Bronze.Fetcher {
        private val tries =
          new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        override def fetch(url: String): graft.sources.Bronze.FetchResponse = {
          val mid = url.substring(url.lastIndexOf('/') + 1).toLong
          val n = tries.merge(url, 1, (a, b) => a + b).intValue
          if (mid == 555003L && n == 1) // retry path inside the lifecycle
            graft.sources.Bronze.FetchResponse(0, "", Some("synthetic flake"))
          else graft.sources.Bronze.FetchResponse(200,
            DemoFixture.matchDoc((mid - 555000L).toInt))
        }
      }
      val report = graft.sources.Bronze.fanOutFetch(s, targets, api,
        parallelism = 4, maxRetries = 3, backoffMs = 1L, sleeper = _ => ())
      val outcomes = report.groupBy("outcome").count()
        .as[(String, Long)].collect().toMap
      require(outcomes.get("rewrite").contains(6L),
        s"lifecycle bronze landing incomplete: $outcomes")
      val raw = s.read.json(s"$land/*.json")
      val silver = Silver.run(raw, DemoFixture.lineups(s),
        DemoFixture.competitions(s), DemoFixture.teams(s),
        DemoFixture.silverConfig, DemoFixture.metaCols)
      Gold.run(silver, DemoFixture.goldWeights(s),
        Seq("totalPasses", "passesPerNinety", "totalDuels", "goals"),
        GoldConfig(minSampleSize = 2, minMinutes = 150))
        .orderBy("profileId")
    },

    // SCD Type-2 dimension maintenance (ops.Scd): the customer dim opens at
    // an initial date; a snapshot reclassifies every 7th customer's segment
    // → their open rows close at the effective date and new versions open.
    // The oracle replays the three branches (keep-open / close / open-new).
    Q.sql("q81_scd2_customers",
      """WITH upd AS (
        |  SELECT c_custkey, 'VIP' AS c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT c_custkey, c_mktsegment, c_acctbal, valid_from, valid_to FROM (
        |  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
        |         DATE '1995-01-01' AS valid_from,
        |         CAST(NULL AS DATE) AS valid_to
        |  FROM customer c LEFT JOIN upd u ON u.c_custkey = c.c_custkey
        |  WHERE u.c_custkey IS NULL
        |  UNION ALL
        |  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
        |         DATE '1995-01-01', DATE '2024-06-01'
        |  FROM customer c JOIN upd u ON u.c_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
        |         DATE '2024-06-01', CAST(NULL AS DATE)
        |  FROM upd u)
        |ORDER BY c_custkey, valid_from""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val cust = graft.io.Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val history = cust
        .withColumn("valid_from", to_date(lit("1995-01-01")))
        .withColumn("valid_to", lit(null).cast("date"))
      val updates = cust.where(col("c_custkey") % 7 === 0)
        .withColumn("c_mktsegment", lit("VIP"))
      graft.ops.Scd.scd2Merge(history, updates,
          keys = Seq("c_custkey"), tracked = Seq("c_mktsegment", "c_acctbal"),
          effectiveDate = "2024-06-01")
        .orderBy("c_custkey", "valid_from")
    },

    // Partition-pruned MERGE INTO parquet at rest (Writers.
    // mergeIntoPartitioned — the fact-table upsert half of the lakehouse
    // pattern; q81 is the dimension/SCD2 half): the full orders history
    // lands month-partitioned, then a late batch re-delivers every 7th
    // order of the last three months at version 2 with doubled prices AND
    // appends brand-new orders — and ONLY those month partitions are
    // rewritten (MergeSpec asserts untouched files byte-identical; merge
    // cost scales with the batch's months, never the table). The oracle
    // replays history ∪ batch with keep-max-version per key, so a hash
    // match proves upsert, insert, survivor, and partition-routing
    // semantics on the re-read table — version_sum pins exactly which
    // rows the batch replaced.
    Q.sql("q123_merge_partitioned",
      """WITH base AS (
        |  SELECT o_orderkey AS k, strftime(o_orderdate, '%Y-%m') AS mon,
        |         o_totalprice AS price
        |  FROM orders),
        |hist AS (SELECT k, mon, price, 1 AS v FROM base),
        |recent AS (SELECT * FROM base WHERE mon >= '2001-06'),
        |batch AS (
        |  SELECT k, mon, price * CAST(2 AS DOUBLE) AS price, 2 AS v
        |  FROM recent WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k + 10000000, mon, price, 2 FROM recent),
        |merged AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |    FROM (SELECT * FROM hist UNION ALL SELECT * FROM batch))
        |  WHERE rn = 1)
        |SELECT mon, count(*) AS n_rows,
        |       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       CAST(SUM(v) AS BIGINT) AS version_sum
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files.createTempDirectory("q123merge").toString + "/orders_m"
      val base = graft.io.Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        col("o_totalprice").as("price"))
      graft.io.Writers.writePartitioned(
        base.withColumn("v", lit(1L)), tbl, "mon")
      val recent = base.where(col("mon") >= "2001-06")
      val batch = recent.where(col("k") % 7 === 0)
        .withColumn("price", col("price") * lit(2.0))
        .unionByName(recent.withColumn("k", col("k") + 10000000L))
        .withColumn("v", lit(2L))
      graft.io.Writers.mergeIntoPartitioned(tbl, batch,
        keyCols = Seq("k"), versionCol = "v", partitionCol = "mon")
      s.read.parquet(tbl)
        .groupBy("mon")
        .agg(count(lit(1)).as("n_rows"),
          Qutil.msum(col("price"), 2).as("total_price"),
          sum(col("v")).as("version_sum"))
        .orderBy("mon")
    },

    // Snapshot diff / CDC report (ops.Scd.snapshotDiff — the audit
    // companion to q81's SCD2 and q123's MERGE): a re-delivered customer
    // snapshot drops every 13th key, re-banks every 11th, re-segments
    // every 19th, and invents keys for every 17th; the diff classifies
    // every key with null-safe per-column change flags and one full-outer
    // join. The oracle replays join, classification, and flags — the
    // per-column counts pin that overlapping edits (a key hit by both the
    // 11 and 19 rules) attribute to BOTH columns, not to a single
    // 'changed' bucket.
    Q.sql("q130_snapshot_diff",
      """WITH oldt AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |  FROM customer),
        |newt AS (
        |  SELECT k,
        |         CASE WHEN k % 19 = 0 THEN 'DIFF' ELSE seg END AS seg,
        |         CASE WHEN k % 11 = 0 THEN bal + CAST(10 AS DOUBLE)
        |              ELSE bal END AS bal
        |  FROM oldt WHERE k % 13 <> 0
        |  UNION ALL
        |  SELECT k + 1000000, seg, bal FROM oldt WHERE k % 17 = 0),
        |j AS (SELECT o.k IS NOT NULL AS has_old, n.k IS NOT NULL AS has_new,
        |             o.seg AS oseg, n.seg AS nseg, o.bal AS obal, n.bal AS nbal
        |      FROM oldt o FULL OUTER JOIN newt n ON n.k = o.k),
        |c AS (SELECT
        |        CASE WHEN has_old AND NOT has_new THEN 'removed'
        |             WHEN has_new AND NOT has_old THEN 'added'
        |             WHEN NOT (oseg IS NOT DISTINCT FROM nseg)
        |               OR NOT (obal IS NOT DISTINCT FROM nbal) THEN 'changed'
        |             ELSE 'unchanged' END AS status,
        |        CASE WHEN has_old AND has_new
        |             THEN NOT (oseg IS NOT DISTINCT FROM nseg) END AS chg_seg,
        |        CASE WHEN has_old AND has_new
        |             THEN NOT (obal IS NOT DISTINCT FROM nbal) END AS chg_bal
        |      FROM j)
        |SELECT status, count(*) AS n,
        |       CAST(SUM(CASE WHEN chg_seg THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_chg_segment,
        |       CAST(SUM(CASE WHEN chg_bal THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_chg_acctbal
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val old = graft.io.Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      val newer = old.where(col("k") % 13 =!= 0)
        .withColumn("seg",
          when(col("k") % 19 === 0, lit("DIFF")).otherwise(col("seg")))
        .withColumn("bal",
          when(col("k") % 11 === 0, col("bal") + lit(10.0)).otherwise(col("bal")))
        .unionByName(old.where(col("k") % 17 === 0)
          .select((col("k") + 1000000L).as("k"), col("seg"), col("bal")))
      graft.ops.Scd.snapshotDiff(old, newer, Seq("k"), Seq("seg", "bal"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          sum(when(col("chg_seg"), 1L).otherwise(0L)).as("n_chg_segment"),
          sum(when(col("chg_bal"), 1L).otherwise(0L)).as("n_chg_acctbal"))
        .orderBy("status")
    },

    // Partition-pruned DELETE at rest (Writers.deleteFromPartitioned —
    // the erasure third of the lakehouse trio with q123's MERGE and q81's
    // SCD2): a GDPR-style request erases every order of the targeted
    // customers within the named months, AND the entire final month (the
    // retracted-batch case — which exercises the fully-emptied-partition
    // branch, where dynamic overwrite alone would silently leave the old
    // files). Only named partitions are read/rewritten; the oracle
    // replays the key anti-join over the re-read table, so a hash match
    // proves targeted rows died, everything else survived, and the empty
    // partition is really gone.
    Q.sql("q139_partitioned_delete",
      """WITH base AS (
        |  SELECT o_orderkey AS k, strftime(o_orderdate, '%Y-%m') AS mon,
        |         o_totalprice AS price, o_custkey
        |  FROM orders),
        |del AS (SELECT k FROM base
        |        WHERE (o_custkey % 37 = 0 AND mon >= '2001-06')
        |           OR mon = '2001-08'),
        |kept AS (SELECT b.mon, b.price FROM base b
        |         WHERE NOT EXISTS (SELECT 1 FROM del d WHERE d.k = b.k))
        |SELECT mon, count(*) AS n_rows,
        |       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files.createTempDirectory("q139del").toString + "/orders_m"
      val base = graft.io.Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        col("o_totalprice").as("price"),
        col("o_custkey"))
      graft.io.Writers.writePartitioned(base, tbl, "mon")
      val del = base.where(
          (col("o_custkey") % 37 === 0 && col("mon") >= "2001-06") ||
            col("mon") === "2001-08")
        .select("k", "mon")
      graft.io.Writers.deleteFromPartitioned(tbl, del,
        keyCols = Seq("k"), partitionCol = "mon")
      s.read.parquet(tbl)
        .groupBy("mon")
        .agg(count(lit(1)).as("n_rows"),
          Qutil.msum(col("price"), 2).as("total_price"))
        .orderBy("mon")
    },

    // Zone-map file skipping (io.ZoneMaps): a range-clustered write +
    // per-file min/max manifest answers a date-range scan reading only the
    // files whose envelope intersects the predicate — the Delta/Iceberg
    // data-skipping pattern over plain parquet. The exact predicate is
    // re-applied to surviving rows, so the oracle is the plain range
    // filter; the spec asserts the skipping rate separately.
    Q.sql("q147_zonemap_skipping",
      """SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-03-01'
        |  AND o_orderdate <= TIMESTAMP '1998-06-30'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files.createTempDirectory("q147zm").toString + "/orders_c"
      val orders = graft.io.Tables.orders(s, d)
      orders.repartitionByRange(8, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(tbl)
      val manifest = graft.io.ZoneMaps.writeManifest(s, tbl, Seq("o_orderdate"))
      val (scan, _, _) = graft.io.ZoneMaps.prunedScan(s, tbl, manifest,
        "o_orderdate",
        java.sql.Timestamp.valueOf("1998-03-01 00:00:00"),
        java.sql.Timestamp.valueOf("1998-06-30 00:00:00"))
      scan.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("n_orders"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("mon")
    },

    // Multi-dimensional Z-order layout (io.Layout): lineitem is rewritten
    // clustered by the Morton interleave of (l_partkey, l_suppkey) into
    // z-bucket DIRECTORIES, and a box predicate on both keys reads only
    // the buckets whose dyadic rectangle intersects the box — planner-level
    // partition pruning (PartitionFilters; LayoutSpec asserts it) where
    // q147 used manifest min/max skipping. The emitted zv column pins the
    // interleave bit-for-bit in the oracle (42-iteration loop — prefix-
    // stable, so the same SQL text is exact at any SF whose keys fit 21
    // bits); a bucket wrongly pruned would drop rows and fail the hash.
    Q.sql("q230_zorder_box", zorderBoxOracle) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 21; val bucketBits = 8
      val tbl = java.nio.file.Files
        .createTempDirectory("q230z").toString + "/lineitem_z"
      graft.io.Layout.writeZClustered(
        graft.io.Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"), bits, bucketBits,
        numFiles = 16, path = tbl)
      val dims = Seq(("l_partkey", 100L, 499L), ("l_suppkey", 1L, 25L))
      val probed = graft.io.Layout.zBoxBuckets(
        dims.map(x => (x._2, x._3)), bits, bucketBits)
      require(probed.size < (1 << bucketBits),
        s"box probes all ${probed.size} buckets — no pruning")
      graft.io.Layout.readZBox(s, tbl, dims, bits, bucketBits)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zv")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    },

    // The ONE-CALL SQL surface for the z-ordered box read (SqlSurface.
    // createZBoxFunction): registration bakes the layout contract (view,
    // dim order, bits, bucketBits); the BOX arrives as call arguments.
    // The registrar unrolls the dyadic bucket-intersection test into an
    // inline predicate on the zb partition column (a SQL body has no
    // driver loop), so directory pruning happens at planning time exactly
    // like q230's isin path — LayoutSpec asserts PartitionFilters on
    // BOTH surfaces, and this query is held hash-for-hash to q230's
    // oracle (SurfaceEquivalenceSpec pins q232 ≙ q230 in CI).
    Q.sql("q232_sql_zbox_one_call", zorderBoxOracle) { (s, d) =>
      val bits = 21; val bucketBits = 8
      val tbl = java.nio.file.Files
        .createTempDirectory("q232z").toString + "/lineitem_z"
      graft.io.Layout.writeZClustered(
        graft.io.Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"), bits, bucketBits,
        numFiles = 16, path = tbl)
      s.read.parquet(tbl).createOrReplaceTempView("lineitem_z")
      graft.functions.SqlSurface.createZBoxFunction(s, "lineitem_z",
        Seq("l_partkey", "l_suppkey"), bits, bucketBits)
      s.sql(
        """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zv
          |FROM graft_zbox(100, 499, 1, 25)
          |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""
          .stripMargin)
    },

    // Targeted row-level delete (io.Deletes): the right-to-be-forgotten
    // lake operation — a key batch is deleted by rewriting ONLY the files
    // that contain matching rows (found by one input_file_name scan, the
    // Delta/Iceberg planner grain); every other file stays byte-identical
    // (DeletesSpec pins names unchanged). The table is a TWO-LEVEL Hive
    // layout (status=/priority= — the first composite a real lake hits)
    // with the delete key range-clustered within files, so a 3-key
    // compliance batch still touches a strict file subset
    // (require-asserted) and BOTH partition columns survive the rewrite.
    // The report READS THE REWRITTEN TABLE; the oracle reads the original
    // minus the keys — a hash match proves the rewrite deleted exactly
    // the batch and nothing else, through the composite layout.
    Q.sql("q233_targeted_delete",
      """SELECT o_orderstatus AS status, count(*) AS n_rows,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM orders
        |WHERE o_custkey NOT IN (7, 501, 999)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q233del").toString + "/orders_d"
      graft.io.Tables.orders(s, d)
        .repartitionByRange(20, col("o_orderstatus"),
          col("o_orderpriority"), col("o_custkey"))
        .sortWithinPartitions("o_orderstatus", "o_orderpriority",
          "o_custkey")
        .write.partitionBy("o_orderstatus", "o_orderpriority").parquet(tbl)
      val r = graft.io.Deletes.deleteKeys(s, tbl, "o_custkey",
        Seq(7L, 501L, 999L), sortCols = Seq("o_custkey"))
      require(r.rowsDeleted > 0 && r.filesTouched < r.filesTotal,
        s"delete did not target a file subset ($r)")
      s.read.parquet(tbl)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("status")
    },

    // TRANSACTIONAL delete + time travel (io.Versioned.deleteWhere —
    // q233's file-targeted rewrite landed as a manifest COMMIT instead of
    // a directory swap): the GDPR batch rewrites only the affected files'
    // survivors into a new commit dir and the new manifest swaps exactly
    // those files, so a reader pinned to the pre-delete version still
    // sees the full table AFTER the delete landed — both reads run after
    // both commits, and the oracle states each version's contents from
    // the key split. require() pins the lake-shape claims the hash can't
    // see: the delete touched a strict file subset (the v2 manifest
    // reuses v1 files verbatim) and no live file was removed.
    Q.sql("q235_versioned_delete_travel",
      """WITH a AS (
        |  SELECT 1 AS version, o_orderstatus AS status, count(*) AS n_rows,
        |         CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS total_price
        |  FROM orders GROUP BY 2),
        |b AS (
        |  SELECT 2 AS version, o_orderstatus AS status, count(*) AS n_rows,
        |         CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS total_price
        |  FROM orders WHERE o_custkey NOT IN (7, 501, 999) GROUP BY 2)
        |SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |ORDER BY version, status""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q235vdel").toString + "/orders_vd"
      val v1 = graft.io.Versioned.commit(
        graft.io.Tables.orders(s, d)
          .repartitionByRange(20, col("o_custkey"))
          .sortWithinPartitions("o_custkey"), tbl)
      val v2 = graft.io.Versioned.deleteWhere(s, tbl,
        col("o_custkey").isin(7L, 501L, 999L), sortCols = Seq("o_custkey"))
      require(v2 == v1 + 1, s"delete must land one commit ($v1 -> $v2)")
      def files(v: Int) = graft.io.Versioned.snapshot(s, tbl, v)
        .select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSet
      val (f1, f2) = (files(v1), files(v2))
      val shared = f1 intersect f2
      require(shared.nonEmpty && shared.size < f1.size,
        s"versioned delete must reuse a strict file subset " +
          s"(${shared.size}/${f1.size})")
      require(f1.forall(f => java.nio.file.Files.exists(
        java.nio.file.Paths.get(new java.net.URI(f)))),
        "a pre-delete file was physically removed before vacuum")
      def agg(version: Int) =
        graft.io.Versioned.snapshot(s, tbl, version)
          .groupBy(col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            Qutil.msum(col("o_totalprice"), 2).as("total_price"))
          .select(lit(version).as("version"), col("status"),
            col("n_rows"), col("key_sum"), col("total_price"))
      agg(v1).unionByName(agg(v2)).orderBy("version", "status")
    },

    // VERSIONED small-file compaction (io.Versioned.compactSmallFiles):
    // q185's OPTIMIZE job as a MANIFEST COMMIT — orders lands as one
    // large commit plus a tail of small append commits (the streaming-
    // ingest shape), then compaction coalesces only the small files into
    // the next commit dir and the new manifest keeps the large files
    // verbatim. The report reads the POST-COMPACTION snapshot; the oracle
    // reads the original table — a hash match proves the commit is
    // row-faithful. require() pins what the hash can't see: the version
    // advanced, the file count shrank, the large commit's files are
    // served from their ORIGINAL paths, and the pre-compaction version
    // still reads intact (snapshot isolation through maintenance).
    Q.sql("q238_versioned_compaction",
      """SELECT o_orderstatus AS status, count(*) AS n_rows,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q238vc").toString + "/orders_vc"
      val orders = graft.io.Tables.orders(s, d)
      // commit 1: the bulk (two large range-clustered files); commits
      // 2..5: small appends — ~1/40 the bulk size per construction at
      // ANY scale factor, so the threshold below is scale-independent
      graft.io.Versioned.commit(
        orders.where(col("o_orderkey") % 16 =!= 0)
          .repartitionByRange(2, col("o_orderkey")), tbl)
      (0 until 4).foreach { k =>
        graft.io.Versioned.commit(
          orders.where(col("o_orderkey") % 16 === 0 &&
            col("o_orderkey") % 64 === (k * 16)), tbl): Unit
      }
      val v5 = graft.io.Versioned.latestVersion(tbl)
      def files(v: Int) = graft.io.Versioned.snapshot(s, tbl, v)
        .select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSet
      val (bulk, before) = (files(1), files(v5))
      val nBefore = graft.io.Versioned.snapshot(s, tbl, v5).count()
      // threshold = the smallest bulk file: the appends (strictly
      // smaller by construction) compact, the bulk files are kept
      val v6 = graft.io.Versioned.compactSmallFiles(s, tbl,
        smallBytes = bulk.map(f => java.nio.file.Files.size(
          java.nio.file.Paths.get(new java.net.URI(f)))).min)
      require(v6 == v5 + 1, s"compaction must land one commit ($v5 -> $v6)")
      val after = files(v6)
      require(after.size < before.size,
        s"compaction must shrink the file count (${before.size} -> ${after.size})")
      require(bulk.subsetOf(after),
        "the large commit's files must be served from their original paths")
      require(graft.io.Versioned.snapshot(s, tbl, v5).count() == nBefore,
        "the pre-compaction version must still read intact")
      graft.io.Versioned.snapshot(s, tbl, v6)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("status")
    },

    // STREAMING ingest into the z-layout with the integrated compaction
    // trigger (Streaming.zLayoutSink) — the q230 layout built by a REAL
    // Structured Streaming query instead of a one-shot write: lineitem is
    // staged as 4 files, a file-source stream (maxFilesPerTrigger=1)
    // replays them as 4 micro-batches through the sink, and the trigger
    // (compactEvery=2) compacts hot buckets INSIDE epochs 1 and 3 — the
    // serialized single-writer shape a long-running ingest runs forever.
    // Held to q230's oracle VERBATIM: the streamed, twice-compacted
    // table must box-read hash-identical to the one-shot clustered
    // write, interleave bits included. require() pins the trigger's
    // effect: every bucket dir ends at/under the file cap.
    Q.sql("q239_streaming_zingest", zorderBoxOracle) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 21; val bucketBits = 8
      val dir = java.nio.file.Files.createTempDirectory("q239zs").toString
      val li = graft.io.Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      li.repartition(4).write.parquet(s"$dir/stage")
      val src = s.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/stage")
      val q = graft.streaming.Streaming.zLayoutSink(src,
        Seq("l_partkey", "l_suppkey"), bits, bucketBits, numFiles = 16,
        path = s"$dir/t", checkpoint = s"$dir/ckpt",
        compactEvery = 2, maxFilesPerDir = 4)
      try q.processAllAvailable() finally q.stop()
      val root = new java.io.File(s"$dir/t")
      val worst = root.listFiles().filter(_.getName.startsWith("zb="))
        .map(b => b.listFiles().count(_.getName.endsWith(".parquet"))).max
      require(worst <= 4,
        s"trigger failed to bound bucket file counts (worst $worst)")
      val dims = Seq(("l_partkey", 100L, 499L), ("l_suppkey", 1L, 25L))
      graft.io.Layout.readZBox(s, s"$dir/t", dims, bits, bucketBits)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zv")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    },

    // ENCODED z-order layout (io.Layout.writeZClusteredEncoded): z-
    // clustering over columns the raw Morton interleave can't take — a
    // TIMESTAMP and a STRING — via the engine-owned order-preserving
    // dimension encoders (persisted value→code dictionaries; dates
    // rank-bucket above the bit budget, priorities dictionary-encode).
    // The box read maps the original-value ranges to code ranges through
    // the encoders, prunes z-buckets with the same exact dyadic math as
    // q230, and applies the exact original-column predicates on top — so
    // the oracle is a plain range filter on orders. require() pins the
    // strict bucket-subset pruning the hash can't see.
    Q.sql("q236_zorder_encoded", zorderEncodedOracle) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 8; val bucketBits = 4
      val tbl = java.nio.file.Files
        .createTempDirectory("q236ze").toString + "/orders_ze"
      graft.io.Layout.writeZClusteredEncoded(
        graft.io.Tables.orders(s, d)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        Seq("o_orderdate", "o_orderpriority"), bits, bucketBits,
        numFiles = 8, path = tbl)
      val box = graft.io.Layout.readZBoxEncoded(s, tbl,
        Seq(("o_orderdate",
          java.sql.Timestamp.valueOf("1996-01-01 00:00:00"),
          java.sql.Timestamp.valueOf("1996-12-31 23:59:59")),
          ("o_orderpriority", "1-URGENT", "2-HIGH")),
        bits, bucketBits)
      val touched = box.select("zb").distinct().count()
      require(touched < (1L << bucketBits),
        s"encoded z-box read must prune buckets ($touched/${1L << bucketBits})")
      box.groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy("odate", "prio")
    },

    // ONE-CALL SQL surface for the ENCODED z-box read (SqlSurface.
    // createEncodedZBoxFunction): registration bakes the layout contract
    // plus the two ENCODER views; the box arrives as TIMESTAMP/STRING
    // call arguments. Code bounds are scalar subqueries over the encoder
    // dictionaries, the dyadic de-interleave predicate prunes zb exactly
    // like q232's, and the exact original-column predicates apply on
    // top — held hash-for-hash to q236's oracle (SurfaceEquivalenceSpec
    // pins q240 ≙ q236 via tvfTwins).
    Q.sql("q240_sql_zbox_encoded_one_call", zorderEncodedOracle) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 8; val bucketBits = 4
      val tbl = java.nio.file.Files
        .createTempDirectory("q240ze").toString + "/orders_ze"
      graft.io.Layout.writeZClusteredEncoded(
        graft.io.Tables.orders(s, d)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        Seq("o_orderdate", "o_orderpriority"), bits, bucketBits,
        numFiles = 8, path = tbl)
      s.read.parquet(tbl).createOrReplaceTempView("orders_ze_sql")
      graft.io.Layout.readEncoder(s, tbl, "o_orderdate")
        .createOrReplaceTempView("enc_odate")
      graft.io.Layout.readEncoder(s, tbl, "o_orderpriority")
        .createOrReplaceTempView("enc_prio")
      graft.functions.SqlSurface.createEncodedZBoxFunction(s,
        "orders_ze_sql", Seq("o_orderdate", "o_orderpriority"),
        Seq("enc_odate", "enc_prio"), bits, bucketBits)
      s.sql(
        """SELECT date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
          |       o_orderpriority AS prio, count(*) AS n_orders,
          |       sum(o_orderkey) AS key_sum
          |FROM graft_zbox_encoded(
          |  TIMESTAMP '1996-01-01 00:00:00',
          |  TIMESTAMP '1996-12-31 23:59:59',
          |  '1-URGENT', '2-HIGH')
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    },

    // ENCODED z-order over a HIGH-CARDINALITY SKEWED id (io.Layout's
    // bounds encoder — the input class the module header advertises): a
    // synthetic hot key (25% of rows collapse onto id 42) rides a
    // ~10k-distinct customer-id tail, far above the 2^8 dictionary
    // budget, so the encoder persists only the 2^8 equal-frequency
    // BOUNDARY values — require() pins that the persisted encoder is
    // config-sized while the dimension's cardinality is not, the property
    // that makes the build/encode path survive 100×. Encoding is the
    // codegen'd binary-search expression (no corpus-sized broadcast —
    // LayoutSpec gates the plan); the box read maps value ranges to code
    // ranges through the boundaries and the exact predicates re-apply, so
    // the oracle is a plain range filter.
    Q.sql("q241_zorder_encoded_skewed_id",
      """WITH sk AS (
        |  SELECT CASE WHEN o_orderkey % 4 = 0 THEN 42
        |              ELSE 100 + o_custkey % 1000 END AS skewkey,
        |         o_orderkey, o_orderdate
        |  FROM orders)
        |SELECT skewkey AS ck, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum
        |FROM sk
        |WHERE skewkey BETWEEN 150 AND 240
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      // bits=6: the 64-code budget sits BELOW the skew dim's cardinality
      // at every scale factor (the 1000-wide residue domain), so the
      // bounds path is exercised from sf0.001 up — the gates run the
      // registry at the smallest SF
      val bits = 6; val bucketBits = 4
      val tbl = java.nio.file.Files
        .createTempDirectory("q241zsk").toString + "/orders_sk"
      val base = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"),
          when(col("o_orderkey") % 4 === 0, 42L)
            .otherwise(lit(100L) + col("o_custkey").cast("long") % 1000L)
            .as("skewkey"))
      graft.io.Layout.writeZClusteredEncoded(base,
        Seq("skewkey", "o_orderdate"), bits, bucketBits,
        numFiles = 8, path = tbl)
      val nDistinct = base.select("skewkey").distinct().count()
      val encRows = graft.io.Layout.readEncoder(s, tbl, "skewkey").count()
      require(nDistinct > (1L << bits) && encRows <= (1L << bits),
        s"bounds encoder not config-sized: $encRows rows for " +
          s"$nDistinct distinct (budget ${1L << bits})")
      val box = graft.io.Layout.readZBoxEncoded(s, tbl,
        Seq(("skewkey", 150L, 240L),
          ("o_orderdate",
            java.sql.Timestamp.valueOf("1996-01-01 00:00:00"),
            java.sql.Timestamp.valueOf("1996-12-31 23:59:59"))),
        bits, bucketBits)
      val touched = box.select("zb").distinct().count()
      require(touched < (1L << bucketBits),
        s"skewed-id z-box read must prune buckets ($touched/${1L << bucketBits})")
      box.groupBy(col("skewkey").as("ck"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy("ck")
    },

    // ORDER-PRESERVING encoder EXTENSION (io.Layout.extendEncoders): the
    // layout is built on pre-1998 orders with a dict-encoded month
    // dimension; the 1998 batch carries months the dictionary never saw.
    // A plain append aborts (require-pinned) — the static-dictionary
    // contract — and the extension assigns the new months codes ABOVE the
    // current max, so resident buckets are untouched by construction
    // (require-pinned file subset) and the appended batch lands. The box
    // read spans the old/new boundary; the oracle is a plain month-string
    // range filter over ALL orders — a hash match proves the extended
    // layout serves both sides of the boundary exactly.
    Q.sql("q242_zorder_encoder_extension",
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS omonth,
        |         o_orderpriority AS prio, o_orderkey
        |  FROM orders)
        |SELECT omonth, prio, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum
        |FROM m
        |WHERE omonth >= '1997-10' AND omonth <= '1998-06'
        |  AND prio >= '1-URGENT' AND prio <= '2-HIGH'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 8; val bucketBits = 4
      val tbl = java.nio.file.Files
        .createTempDirectory("q242zx").toString + "/orders_zx"
      val all = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("omonth"),
          col("o_orderpriority"))
      val old = all.where(col("omonth") < "1998-01")
      val fresh = all.where(col("omonth") >= "1998-01")
      graft.io.Layout.writeZClusteredEncoded(old,
        Seq("omonth", "o_orderpriority"), bits, bucketBits,
        numFiles = 8, path = tbl)
      // the static dictionary rejects the unseen months — loudly
      val e = try {
        graft.io.Layout.appendZClusteredEncoded(fresh,
          Seq("omonth", "o_orderpriority"), bits, bucketBits,
          numFiles = 2, path = tbl); None
      } catch { case t: Throwable => Some(t) }
      require(e.isDefined, "append with unseen months must abort")
      val resident = s.read.parquet(tbl)
        .select(input_file_name()).distinct().collect()
        .map(_.getString(0)).toSet
      val added = graft.io.Layout.extendEncoders(fresh,
        Seq("omonth", "o_orderpriority"), bits, tbl)
      require(added("omonth") >= 1 && added("o_orderpriority") == 0,
        s"extension added $added")
      graft.io.Layout.appendZClusteredEncoded(fresh,
        Seq("omonth", "o_orderpriority"), bits, bucketBits,
        numFiles = 2, path = tbl)
      val after = s.read.parquet(tbl)
        .select(input_file_name()).distinct().collect()
        .map(_.getString(0)).toSet
      require(resident.subsetOf(after) && after.size > resident.size,
        "extension must append without rewriting resident files")
      graft.io.Layout.readZBoxEncoded(s, tbl,
          Seq(("omonth", "1997-10", "1998-06"),
            ("o_orderpriority", "1-URGENT", "2-HIGH")),
          bits, bucketBits)
        .groupBy(col("omonth"), col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy("omonth", "prio")
    },

    // VERSIONED z-layout (io.Layout.writeZClusteredVersioned — manifest
    // entries carrying the zb partition value): the z-layout as a
    // TABLE-FORMAT table. Bulk commit + append commit + snapshot-isolated
    // OPTIMIZE, then the box read resolves the PINNED latest manifest and
    // prunes FILES by bucket from metadata alone (require-pinned strict
    // file subset, no directory listing). Dims are mod-256 key residues
    // so the bucket domain is POPULATED at every scale factor (raw keys
    // under bits=21 leave all top interleave bits zero at small SF — one
    // bucket, nothing to prune); the oracle replays the residues and the
    // 16-bit interleave. require() also pins snapshot isolation: the
    // pre-OPTIMIZE version reads the same rows after the compaction
    // landed.
    Q.sql("q243_versioned_zlayout", versionedZOracle) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 8; val bucketBits = 4
      val tbl = java.nio.file.Files
        .createTempDirectory("q243vz").toString + "/lineitem_vz"
      val li = graft.io.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(256)).cast("long").as("pk"),
          pmod(col("l_suppkey"), lit(256)).cast("long").as("sk"))
      val v1 = graft.io.Layout.writeZClusteredVersioned(
        li.where(col("l_orderkey") % 8 =!= 0), Seq("pk", "sk"),
        bits, bucketBits, numFiles = 16, table = tbl)
      val v2 = graft.io.Layout.writeZClusteredVersioned(
        li.where(col("l_orderkey") % 8 === 0), Seq("pk", "sk"),
        bits, bucketBits, numFiles = 4, table = tbl)
      require(v2 == v1 + 1, "append must land one commit")
      val preOpt = graft.io.Versioned.snapshot(s, tbl, v2).count()
      val v3 = graft.io.Layout.compactZBucketsVersioned(s, tbl,
        smallBytes = 1L << 20)
      require(v3 > v2, "OPTIMIZE must land a commit")
      require(graft.io.Versioned.snapshot(s, tbl, v2).count() == preOpt,
        "pinned pre-OPTIMIZE version changed")
      val dims = Seq(("pk", 50L, 120L), ("sk", 1L, 90L))
      val box = graft.io.Layout.readZBoxVersioned(s, tbl, dims,
        bits, bucketBits)
      def nFiles(df: org.apache.spark.sql.DataFrame) =
        df.select(input_file_name()).distinct().count()
      require(nFiles(box) < nFiles(graft.io.Versioned.snapshot(s, tbl, v3)),
        "manifest metadata failed to prune the box read's file set")
      box.select("l_orderkey", "l_linenumber", "pk", "sk", "zv")
        .orderBy("l_orderkey", "l_linenumber", "pk", "sk")
    },

    // FULL Z-ORDER OPTIMIZE on the versioned z-layout (io.Layout.
    // reclusterZVersioned over io.Versioned.rewriteAll — Delta's
    // OPTIMIZE ZORDER BY): four append commits fragment every bucket,
    // then ONE snapshot-isolated maintenance commit re-interleaves the
    // whole table into zv-contiguous files. require() pins the ≥2×
    // file-count collapse, the manifest-pruned box read staying a strict
    // subset on the rewritten layout, and the pinned pre-OPTIMIZE
    // version still resolving its fragmented files. Held to q243's
    // oracle VERBATIM — the reclustered table box-reads hash-identical.
    Q.sql("q254_versioned_zorder_optimize", versionedZOracle) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 8; val bucketBits = 4
      val tbl = java.nio.file.Files
        .createTempDirectory("q254zo").toString + "/lineitem_zo"
      val li = graft.io.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(256)).cast("long").as("pk"),
          pmod(col("l_suppkey"), lit(256)).cast("long").as("sk"))
      (0 until 4).foreach { m =>
        graft.io.Layout.writeZClusteredVersioned(
          li.where(col("l_orderkey") % 4 === m), Seq("pk", "sk"),
          bits, bucketBits, numFiles = 8, table = tbl): Unit
      }
      def nFiles(df: org.apache.spark.sql.DataFrame) =
        df.select(input_file_name()).distinct().count()
      val fragmented = nFiles(graft.io.Versioned.snapshot(s, tbl))
      val vr = graft.io.Layout.reclusterZVersioned(s, tbl,
        Seq("pk", "sk"), bits, bucketBits, numFiles = 8)
      require(vr == 5, "OPTIMIZE must land exactly one commit")
      val compacted = nFiles(graft.io.Versioned.snapshot(s, tbl, vr))
      require(compacted * 2 <= fragmented,
        s"recluster failed to collapse fragments ($fragmented -> $compacted)")
      val dims = Seq(("pk", 50L, 120L), ("sk", 1L, 90L))
      val box = graft.io.Layout.readZBoxVersioned(s, tbl, dims,
        bits, bucketBits)
      require(nFiles(box) < compacted,
        "manifest pruning lost on the reclustered layout")
      box.select("l_orderkey", "l_linenumber", "pk", "sk", "zv")
        .orderBy("l_orderkey", "l_linenumber", "pk", "sk")
    },

    // STREAMING ingest into the VERSIONED z-layout — q239's real
    // Structured Streaming ingest composed with q243's table format
    // (Streaming.zLayoutVersionedSink): each micro-batch lands as an
    // EXACTLY-ONCE epoch commit (the epoch: manifest tag), the trigger
    // lands versioned OPTIMIZE commits instead of directory swaps, and
    // the post-ingest box read resolves the pinned latest manifest with
    // file-level bucket pruning. Held to q243's oracle VERBATIM: the
    // streamed, twice-compacted versioned table must box-read
    // hash-identical to the batch-committed one. require() pins the
    // epoch accounting (4 tagged epochs), the OPTIMIZE commits landing,
    // and the manifest-pruned file subset.
    Q.sql("q245_streaming_versioned_zlayout", versionedZOracle) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 8; val bucketBits = 4
      val dir = java.nio.file.Files.createTempDirectory("q245vzs").toString
      val tbl = s"$dir/t"
      val li = graft.io.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(256)).cast("long").as("pk"),
          pmod(col("l_suppkey"), lit(256)).cast("long").as("sk"))
      li.repartition(4).write.parquet(s"$dir/stage")
      val src = s.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/stage")
      val q = graft.streaming.Streaming.zLayoutVersionedSink(src,
        Seq("pk", "sk"), bits, bucketBits, numFiles = 4, table = tbl,
        checkpoint = s"$dir/ckpt", compactEvery = 2,
        smallBytes = 1L << 20)
      try q.processAllAvailable() finally q.stop()
      require(graft.io.Versioned.latestTaggedSuffix(tbl, "epoch:")
        .contains(3L), "expected 4 tagged epoch commits")
      require(graft.io.Versioned.latestVersion(tbl) >= 5,
        "OPTIMIZE commits did not land")
      val dims = Seq(("pk", 50L, 120L), ("sk", 1L, 90L))
      val box = graft.io.Layout.readZBoxVersioned(s, tbl, dims,
        bits, bucketBits)
      def nFiles(df: org.apache.spark.sql.DataFrame) =
        df.select(input_file_name()).distinct().count()
      require(nFiles(box) < nFiles(graft.io.Versioned.snapshot(s, tbl)),
        "manifest metadata failed to prune the box read's file set")
      box.select("l_orderkey", "l_linenumber", "pk", "sk", "zv")
        .orderBy("l_orderkey", "l_linenumber", "pk", "sk")
    },

    // VACUUM with a reviewable plan and retention windows (io.Versioned.
    // vacuum — the module's ONE destructive operation, exercised through
    // the registry): v1 is orphaned by an OVERWRITE commit, the DRY RUN
    // reports exactly v1's files while destroying nothing (v1 still
    // reads — require-pinned), a generous TIME window retains everything
    // despite retainLast=1 (the "retain 7 days" policy), and the real
    // count-window sweep then removes exactly the planned files while
    // every retained version keeps reading. The final snapshot is the
    // overwrite ∪ the re-append = the full table, so the oracle is the
    // plain status aggregate — a hash match proves the sweep touched
    // only unreferenced files.
    Q.sql("q246_versioned_vacuum_retention",
      """SELECT o_orderstatus AS status, count(*) AS n_rows,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q246vac").toString + "/orders_vac"
      val orders = graft.io.Tables.orders(s, d)
      val v1 = graft.io.Versioned.commit(orders, tbl)
      val n1 = graft.io.Versioned.snapshot(s, tbl, v1).count()
      graft.io.Versioned.commit(orders.where(col("o_orderkey") % 3 =!= 0),
        tbl, overwrite = true)
      val v3 = graft.io.Versioned.commit(
        orders.where(col("o_orderkey") % 3 === 0), tbl)
      // the dry run PLANS the sweep (exactly the orphaned commit's dir)
      // and performs no destructive action — v1 still reads in full
      val planned = graft.io.Versioned.vacuum(tbl, retainLast = 2,
        dryRun = true)
      require(planned.nonEmpty && planned.forall(_.contains("/c1/")),
        s"dry run must plan exactly the orphaned commit (got $planned)")
      require(graft.io.Versioned.snapshot(s, tbl, v1).count() == n1,
        "dry run destroyed data")
      // time-based retention: everything is younger than a day
      require(graft.io.Versioned.vacuum(tbl, retainLast = 1,
        olderThanMs = 24L * 3600 * 1000, dryRun = true).isEmpty,
        "time window failed to retain young versions")
      // the real sweep removes exactly the plan; retained versions intact
      val removed = graft.io.Versioned.vacuum(tbl, retainLast = 2)
      require(removed.toSet == planned.toSet,
        s"sweep diverged from its dry-run plan ($removed vs $planned)")
      graft.io.Versioned.snapshot(s, tbl, v3)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("status")
    },

    // FILE-STATS data skipping in the versioned manifest (io.Versioned
    // snapshotRange — the Delta/Iceberg min/max model next to
    // snapshotWhere's partition pruning): orders land range-clustered on
    // a bounded key residue with per-file min/max recorded in the
    // manifest, a range read prunes FILES from metadata alone
    // (require-pinned strict subset, no footer reads), a delete INSIDE
    // the range rewrites survivors WITH fresh stats so pruning survives
    // the maintenance commit, and the exact predicates apply on top. The
    // oracle is the plain residue-range filter minus the deleted band.
    Q.sql("q247_versioned_stats_skipping",
      """WITH m AS (
        |  SELECT o_orderkey % 4096 AS k, o_orderkey, o_totalprice
        |  FROM orders)
        |SELECT k // 256 AS kb, count(*) AS n_rows,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM m
        |WHERE k BETWEEN 1000 AND 2000 AND NOT (k BETWEEN 1200 AND 1300)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q247vst").toString + "/orders_st"
      val base = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          pmod(col("o_orderkey"), lit(4096)).cast("long").as("k"))
        .repartitionByRange(12, col("k")).sortWithinPartitions("k")
      val v1 = graft.io.Versioned.commit(base, tbl, statsCols = Seq("k"))
      def nFiles(df: org.apache.spark.sql.DataFrame) =
        df.select(input_file_name()).distinct().count()
      val r1 = graft.io.Versioned.snapshotRange(s, tbl, "k", 1000L, 2000L)
      require(nFiles(r1) < nFiles(graft.io.Versioned.snapshot(s, tbl, v1)),
        "manifest stats failed to prune the range read")
      val v2 = graft.io.Versioned.deleteWhere(s, tbl,
        col("k").between(1200, 1300), sortCols = Seq("k"))
      require(v2 == v1 + 1, "delete must land one commit")
      val r2 = graft.io.Versioned.snapshotRange(s, tbl, "k", 1000L, 2000L)
      require(nFiles(r2) < nFiles(graft.io.Versioned.snapshot(s, tbl, v2)),
        "stats pruning lost through the delete rewrite")
      r2.where(col("k").between(1000, 2000))
        .groupBy((col("k") / 256).cast("long").as("kb"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("kb")
    },

    // STATS SKIPPING × ENCODED DIMENSIONS (io.Layout
    // writeZClusteredEncodedVersioned / readZBoxEncodedVersioned — the
    // composition of q241's encoders, q243's versioned z-layout, and
    // q247's manifest stats): orders commit z-clustered on two encoded
    // STRING dims (month, zero-padded customer residue — both above the
    // 2^5 budget, so the bounds encoders span the full code domain), with
    // per-file min/max of the CODE columns landed in the manifest from
    // the parquet FOOTERS. A value-range box maps to code ranges through
    // the encoders and prunes the pinned manifest on BOTH axes — bucket
    // set AND per-file code stats. require() pins the pruning ladder:
    // the stats-pruned file set is STRICTLY smaller than bucket pruning
    // alone, which is strictly smaller than the full snapshot — the
    // within-bucket zv-range file split is what the code stats exploit
    // and bucket grain cannot. The second commit appends THROUGH the
    // persisted encoders (interior values, binary-search encode — no
    // rebuild); the oracle is the plain two-range string filter.
    Q.sql("q248_versioned_encoded_stats",
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS omonth,
        |         lpad(CAST(o_custkey % 100 AS VARCHAR), 3, '0') AS ck,
        |         o_orderkey
        |  FROM orders)
        |SELECT omonth, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum
        |FROM m
        |WHERE omonth >= '1995-09' AND omonth <= '1996-06'
        |  AND ck >= '040' AND ck <= '089'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val bits = 5; val bucketBits = 2
      val tbl = java.nio.file.Files
        .createTempDirectory("q248ves").toString + "/orders_ves"
      val base = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("omonth"),
          lpad(pmod(col("o_custkey"), lit(100)).cast("string"), 3, "0")
            .as("ck"))
      // bounds encoders on both dims: ~80 months / 100 residues > 2^5
      val v1 = graft.io.Layout.writeZClusteredEncodedVersioned(
        base.where(col("o_orderkey") % 3 =!= 0), Seq("omonth", "ck"),
        bits, bucketBits, numFiles = 12, table = tbl)
      val v2 = graft.io.Layout.writeZClusteredEncodedVersioned(
        base.where(col("o_orderkey") % 3 === 0), Seq("omonth", "ck"),
        bits, bucketBits, numFiles = 12, table = tbl)
      require(v2 == v1 + 1, "append must land one commit")
      val dims = Seq(("omonth", "1995-09", "1996-06"),
        ("ck", "040", "089"))
      val box = graft.io.Layout.readZBoxEncodedVersioned(s, tbl, dims,
        bits, bucketBits)
      def nFiles(df: org.apache.spark.sql.DataFrame) =
        df.select(input_file_name()).distinct().count()
      // the pruning ladder on the MANIFEST-PRUNED file sets (no row
      // predicates — file skipping, not row filtering): stats < buckets
      // < full
      val statsPruned = graft.io.Layout.prunedZBoxEncodedVersioned(
        s, tbl, dims, bits, bucketBits)
      val bucketOnly = {
        val rs = dims.map { case (c, lo, hi) =>
          val r = graft.io.Layout.readEncoder(s, tbl, c).agg(
            max(when(col("value") <= lit(lo), col("code"))),
            max(when(col("value") <= lit(hi), col("code")))).head()
          ((if (r.isNullAt(0)) 0L else r.getLong(0)), r.getLong(1))
        }
        val buckets = graft.io.Layout.zBoxBuckets(rs, bits, bucketBits)
        graft.io.Versioned.snapshotWhere(s, tbl, "zb",
          buckets.map(_.toString).toSet)
      }
      val (nBox, nBucket, nFull) = (nFiles(statsPruned), nFiles(bucketOnly),
        nFiles(graft.io.Versioned.snapshot(s, tbl, v2)))
      require(nBucket < nFull,
        s"bucket pruning failed ($nBucket/$nFull files)")
      require(nBox < nBucket,
        s"code-range stats pruned nothing beyond buckets ($nBox/$nBucket)")
      box.groupBy("omonth")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy("omonth")
    },

    // SCHEMA EVOLUTION on the versioned table (io.Versioned `#schema=`
    // headers): the 1997+ append ADDS a priority column; the snapshot
    // read applies the RECORDED evolved schema, so pre-evolution files
    // read the column as NULL instead of the read schema depending on
    // which file the reader samples — and an append that DROPS a column
    // aborts loudly (require-pinned), never silently shrinking the
    // table. The pinned pre-evolution version keeps its own two-column
    // schema (require-pinned). The oracle states the evolution directly:
    // priority exists only for post-1997 rows, NULL (bucketed as
    // '(pre-evolution)') before.
    Q.sql("q249_versioned_schema_evolution",
      """WITH m AS (
        |  SELECT CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
        |              THEN o_orderpriority END AS prio,
        |         o_orderkey, o_totalprice
        |  FROM orders)
        |SELECT coalesce(prio, '(pre-evolution)') AS prio,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q249evo").toString + "/orders_evo"
      val orders = graft.io.Tables.orders(s, d)
      val cut = lit("1997-01-01").cast("timestamp")
      val v1 = graft.io.Versioned.commit(
        orders.where(col("o_orderdate") < cut)
          .select("o_orderkey", "o_totalprice"), tbl)
      val v2 = graft.io.Versioned.commit(
        orders.where(col("o_orderdate") >= cut)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority").as("prio")), tbl)
      require(v2 == v1 + 1, "evolution append must land one commit")
      // the pinned pre-evolution version keeps its own schema
      require(graft.io.Versioned.snapshot(s, tbl, v1).columns.toSeq ==
        Seq("o_orderkey", "o_totalprice"),
        "pinned pre-evolution version grew a column")
      // a column-dropping append aborts loudly
      val dropped = try {
        graft.io.Versioned.commit(
          orders.limit(1).select("o_orderkey"), tbl): Unit
        false
      } catch { case _: IllegalArgumentException => true }
      require(dropped, "column-dropping append must abort")
      val snap = graft.io.Versioned.snapshot(s, tbl)
      require(snap.columns.toSeq ==
        Seq("o_orderkey", "o_totalprice", "prio"),
        s"evolved schema mismatch: ${snap.columns.toSeq}")
      snap.groupBy(coalesce(col("prio"), lit("(pre-evolution)")).as("prio"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("key_sum"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("prio")
    },

    // MERGE INTO the versioned table (io.Versioned.merge — Delta's
    // upsert as a FILE-TARGETED maintenance commit): the table lands
    // range-clustered on a bounded key residue, the merge source updates
    // one residue band (doubled price) and inserts offset keys; only the
    // files holding matched keys rewrite — require() pins that the
    // post-merge snapshot REUSES untouched files verbatim and retires
    // some (file-targeted, not read-filter-rewrite-everything) and that
    // the pinned pre-merge version still reads the original prices. The
    // oracle states the upsert directly: band rows doubled, inserts
    // appended, everything else untouched.
    Q.sql("q250_versioned_merge",
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_totalprice AS p
        |  FROM orders),
        |merged AS (
        |  SELECT k, CASE WHEN k % 256 BETWEEN 50 AND 80 THEN p * 2
        |                 ELSE p END AS p
        |  FROM base
        |  UNION ALL
        |  SELECT k + 100000000, p FROM base WHERE k % 13 = 0)
        |SELECT (k % 256) // 32 AS band, count(*) AS n_rows,
        |       CAST(SUM(k) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q250mrg").toString + "/orders_mrg"
      val base = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey").cast("long").as("k"),
          pmod(col("o_orderkey"), lit(256)).cast("long").as("kb"),
          col("o_totalprice").as("p"))
        .repartitionByRange(12, col("kb")).sortWithinPartitions("kb")
      val v1 = graft.io.Versioned.commit(base, tbl, statsCols = Seq("kb"))
      val source = base.where(col("kb").between(50, 80))
        .withColumn("p", col("p") * 2)
        .unionByName(base.where(col("k") % 13 === 0)
          .withColumn("k", col("k") + 100000000L)
          .withColumn("kb", pmod(col("k"), lit(256))))
      val v2 = graft.io.Versioned.merge(s, tbl, source, Seq("k"),
        sortCols = Seq("kb"))
      require(v2 == v1 + 1, "merge must land one commit")
      def files(df: org.apache.spark.sql.DataFrame) =
        df.select(input_file_name()).distinct()
          .collect().map(_.getString(0)).toSet
      val (f1, f2) = (files(graft.io.Versioned.snapshot(s, tbl, v1)),
        files(graft.io.Versioned.snapshot(s, tbl, v2)))
      require((f1 intersect f2).nonEmpty,
        "merge rewrote EVERY file — not file-targeted")
      require((f1 diff f2).nonEmpty, "merge retired no files")
      // pinned pre-merge version still reads original prices
      require(graft.io.Versioned.snapshot(s, tbl, v1)
        .where(col("kb").between(50, 80)).agg(sum("p")).head().getDouble(0)
        < graft.io.Versioned.snapshot(s, tbl, v2)
        .where(col("kb").between(50, 80)).agg(sum("p")).head().getDouble(0),
        "pinned pre-merge version saw the update")
      graft.io.Versioned.snapshot(s, tbl, v2)
        .groupBy((col("kb") / 32).cast("long").as("band"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).as("key_sum"),
          Qutil.msum(col("p"), 2).as("total_price"))
        .orderBy("band")
    },

    // STREAMING CDC UPSERT into the versioned table (Streaming.
    // versionedMergeSink over io.Versioned.merge): a real file-source
    // stream replays an initial load plus three update batches (each
    // bumping one key-residue class), every epoch landing as ONE
    // exactly-once tagged MERGE commit. Epoch ORDER is forced through
    // file modification times (the FileStreamSource ordering contract),
    // because upserts do not commute. require() pins the 4 tagged
    // epochs and that the pinned initial-load version still reads the
    // original prices. The oracle states last-writer-wins directly:
    // residue r>0 was updated exactly once by batch r.
    Q.sql("q251_streaming_cdc_merge",
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_totalprice AS p
        |  FROM orders),
        |fin AS (
        |  SELECT k, CASE WHEN k % 4 = 0 THEN p
        |                 ELSE p * (1 + k % 4) END AS p
        |  FROM base)
        |SELECT k % 4 AS r, count(*) AS n_rows,
        |       CAST(SUM(k) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("q251cdc").toString
      val tbl = s"$dir/t"
      val base = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").as("p"))
      val batches = base +: (1 to 3).map(b =>
        base.where(pmod(col("k"), lit(4)) === b)
          .withColumn("p", col("p") * (1 + b)))
      // one parquet file per batch, modification times strictly
      // increasing in batch order — the source's processing order
      val stage = java.nio.file.Paths.get(dir, "stage")
      java.nio.file.Files.createDirectories(stage)
      batches.zipWithIndex.foreach { case (bdf, b) =>
        val raw = s"$dir/raw$b"
        bdf.coalesce(1).write.parquet(raw)
        val part = new java.io.File(raw).listFiles
          .find(_.getName.endsWith(".parquet")).get.toPath
        val target = stage.resolve(f"b$b%02d.parquet")
        java.nio.file.Files.move(part, target)
        java.nio.file.Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - (10 - b) * 60000L))
      }
      val src = s.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      val q = graft.streaming.Streaming.versionedMergeSink(src, tbl,
        Seq("k"), checkpoint = s"$dir/ckpt")
      try q.processAllAvailable() finally q.stop()
      require(graft.io.Versioned.latestTaggedSuffix(tbl, "epoch:")
        .contains(3L), "expected 4 tagged CDC epochs")
      require(graft.io.Versioned.snapshot(s, tbl, 1)
        .agg(sum("p")).head().getDouble(0) <
        graft.io.Versioned.snapshot(s, tbl).agg(sum("p")).head().getDouble(0),
        "pinned initial-load version saw the updates")
      graft.io.Versioned.snapshot(s, tbl)
        .groupBy(pmod(col("k"), lit(4)).as("r"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).as("key_sum"),
          Qutil.msum(col("p"), 2).as("total_price"))
        .orderBy("r")
    },

    // CHANGE DATA FEED (io.Versioned.changes — Delta CDF): the table
    // takes a MERGE (band update + offset inserts) and a DELETE (a
    // disjoint band, which can also catch freshly inserted keys), both
    // recording their row-level changes; the feed read then returns the
    // typed change classes across the commit range — update pre/post
    // images, inserts, deletes — which is what an incremental downstream
    // consumer replays instead of re-reading the table. The oracle
    // derives every class from the same arithmetic; a hash match proves
    // the recorded feed equals the logical row changes exactly.
    Q.sql("q252_versioned_change_feed",
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_totalprice AS p
        |  FROM orders),
        |ups AS (
        |  SELECT k, CASE WHEN k % 256 BETWEEN 50 AND 80 THEN p * 2
        |                 ELSE p END AS p FROM base),
        |ins AS (
        |  SELECT k + 100000000 AS k, p FROM base WHERE k % 13 = 0),
        |merged AS (SELECT * FROM ups UNION ALL SELECT * FROM ins),
        |feed AS (
        |  SELECT 'insert' AS change_type, k, p FROM ins
        |  UNION ALL
        |  SELECT 'update_preimage', k, p FROM base
        |  WHERE k % 256 BETWEEN 50 AND 80
        |  UNION ALL
        |  SELECT 'update_postimage', k, p * 2 FROM base
        |  WHERE k % 256 BETWEEN 50 AND 80
        |  UNION ALL
        |  SELECT 'delete', k, p FROM merged
        |  WHERE k % 256 BETWEEN 150 AND 170)
        |SELECT change_type, count(*) AS n_rows,
        |       CAST(SUM(k) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q252cdf").toString + "/orders_cdf"
      // persisted: base feeds the v1 commit write AND both source branches
      // — unpersisted, the scan + range shuffle ran three times
      val base = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").as("p"))
        .repartitionByRange(12, col("k")).sortWithinPartitions("k")
        .persist()
      val v1 = graft.io.Versioned.commit(base, tbl, statsCols = Seq("k"))
      val source = base.where(pmod(col("k"), lit(256)).between(50, 80))
        .withColumn("p", col("p") * 2)
        .unionByName(base.where(col("k") % 13 === 0)
          .withColumn("k", col("k") + 100000000L))
      val v2 = graft.io.Versioned.merge(s, tbl, source, Seq("k"),
        sortCols = Seq("k"), emitChanges = true)
      val v3 = graft.io.Versioned.deleteWhere(s, tbl,
        pmod(col("k"), lit(256)).between(150, 170), sortCols = Seq("k"),
        emitChanges = true)
      require(v2 == v1 + 1 && v3 == v2 + 1,
        "merge and delete must land one commit each")
      graft.io.Versioned.changes(s, tbl, v1, v3)
        .groupBy(col(graft.io.Versioned.ChangeTypeCol).as("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).as("key_sum"),
          Qutil.msum(col("p"), 2).as("total_price"))
        .orderBy("change_type")
    },

    // CHECK CONSTRAINTS on the versioned table (io.Versioned.addCheck —
    // Delta's ADD CONSTRAINT): the constraint validates the existing
    // rows once at ADD time, then enforces INSIDE every later commit's
    // own write (fused raise_error — no extra validation pass). A batch
    // carrying a violating row aborts the whole commit and releases its
    // claim (require-pinned: the version number does not advance), so
    // the table can never hold a row the constraint forbids — the final
    // aggregate over the two CLEAN commits equals the plain full-table
    // oracle, which is the proof the rejected batch landed nothing.
    Q.sql("q253_versioned_check_constraints",
      """SELECT o_orderstatus AS status, count(*) AS n_rows,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q253chk").toString + "/orders_chk"
      val orders = graft.io.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      graft.io.Versioned.commit(
        orders.where(col("o_orderkey") % 2 === 0), tbl)
      val vc = graft.io.Versioned.addCheck(s, tbl, "price_pos",
        "o_totalprice > 0")
      // a batch with negated prices must abort the WHOLE commit
      val rejected = try {
        graft.io.Versioned.commit(
          orders.where(col("o_orderkey") % 2 =!= 0)
            .withColumn("o_totalprice", -col("o_totalprice")), tbl): Unit
        false
      } catch { case _: Exception => true }
      require(rejected, "violating batch must abort")
      require(graft.io.Versioned.latestVersion(tbl) == vc,
        "rejected batch advanced the version")
      graft.io.Versioned.commit(
        orders.where(col("o_orderkey") % 2 =!= 0), tbl): Unit
      graft.io.Versioned.snapshot(s, tbl)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("status")
    },

    // Snapshot time travel (io.Versioned): commit 1 = history, commit 2 =
    // the 2001 append; reading version 1 AFTER commit 2 landed must see
    // exactly the pre-append table (the manifest, not the directory,
    // defines the snapshot). The oracle states both versions' contents
    // directly from the date split — a hash match proves the v1 read is
    // unaffected by the later commit AND the v2 read unions both commits.
    Q.sql("q165_time_travel",
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS mon, o_totalprice AS p,
        |         o_orderdate AS dt
        |  FROM orders),
        |a AS (SELECT 1 AS version, mon, count(*) AS n_orders,
        |             CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        |      FROM m WHERE dt < TIMESTAMP '2001-01-01' GROUP BY 2),
        |b AS (SELECT 2 AS version, mon, count(*) AS n_orders,
        |             CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        |      FROM m GROUP BY 2)
        |SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |ORDER BY version, mon""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files.createTempDirectory("q165tt").toString + "/orders_v"
      val orders = graft.io.Tables.orders(s, d)
      val cut = lit("2001-01-01").cast("timestamp")
      graft.io.Versioned.commit(orders.where(col("o_orderdate") < cut), tbl)
      graft.io.Versioned.commit(orders.where(col("o_orderdate") >= cut), tbl)
      def agg(version: Int) =
        graft.io.Versioned.snapshot(s, tbl, version)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
          .agg(count(lit(1)).as("n_orders"),
            Qutil.msum(col("o_totalprice"), 2).as("total"))
          .select(lit(version).as("version"), col("mon"),
            col("n_orders"), col("total"))
      agg(1).unionByName(agg(2)).orderBy("version", "mon")
    },

    // Zone-map maintenance under append (io.ZoneMaps.appendManifest over
    // io.Versioned commits — the Iceberg per-snapshot-manifest shape):
    // each commit lands date-clustered and contributes ONLY its own files'
    // stats to the manifest; a range scan spanning both commits prunes
    // from the unioned manifest and still answers exactly. Ingest cost is
    // new-files-proportional — the table is never rescanned.
    Q.sql("q168_zonemap_append",
      """SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-06-01'
        |  AND o_orderdate <= TIMESTAMP '1998-06-30'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files.createTempDirectory("q168za").toString + "/orders_v"
      val manifest = tbl + "_zonemap"
      val orders = graft.io.Tables.orders(s, d)
      val cut = lit("1998-01-01").cast("timestamp")
      def clustered(df: org.apache.spark.sql.DataFrame) =
        df.repartitionByRange(4, col("o_orderdate"))
          .sortWithinPartitions("o_orderdate")
      val v1 = graft.io.Versioned.commit(
        clustered(orders.where(col("o_orderdate") < cut)), tbl)
      graft.io.ZoneMaps.appendManifest(s,
        java.nio.file.Paths.get(tbl, "data", s"c$v1").toString,
        manifest, Seq("o_orderdate"))
      val v2 = graft.io.Versioned.commit(
        clustered(orders.where(col("o_orderdate") >= cut)), tbl)
      graft.io.ZoneMaps.appendManifest(s,
        java.nio.file.Paths.get(tbl, "data", s"c$v2").toString,
        manifest, Seq("o_orderdate"))
      val (scan, _, _) = graft.io.ZoneMaps.prunedScan(s, tbl, manifest,
        "o_orderdate",
        java.sql.Timestamp.valueOf("1997-06-01 00:00:00"),
        java.sql.Timestamp.valueOf("1998-06-30 00:00:00"))
      scan.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("n_orders"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("mon")
    },

    // Small-file compaction fidelity (io.Writers.compactFiles): orders is
    // deliberately fragmented into ~40 small files, compacted into few
    // large ones via the rename-swap, and the REPORT READS THE COMPACTED
    // TABLE — the oracle reads the original, so the hash gate proves the
    // rewrite is byte-faithful (rows, keys, decimal totals), not just
    // that file counts shrank (WritersSpec pins those). This is the
    // OPTIMIZE maintenance job every incrementally-appended lake table
    // runs; at 100 TB it goes per leaf partition.
    Q.sql("q185_compaction_fidelity",
      """SELECT o_orderstatus AS status, count(*) AS n_rows,
        |       CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val tbl = java.nio.file.Files
        .createTempDirectory("q185compact").toString + "/orders_f"
      graft.io.Tables.orders(s, d).repartition(40)
        .write.mode("overwrite").parquet(tbl)
      val (before, after) =
        graft.io.Writers.compactFiles(s, tbl, targetFileBytes = 1L << 22)
      require(after < before,
        s"compaction did not reduce file count ($before -> $after)")
      s.read.parquet(tbl)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          Qutil.msum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("status")
    },

    // CDC latest-wins apply with tombstones (ops.Scd.applyCdc): the
    // events stream becomes a change feed — signup inserts, error
    // deletes, click/view/purchase update — and the final per-user state
    // is the highest-(ts, event_id) event, tombstoned users dropped.
    // ONE key-grain sort-free struct-max aggregate (map-side combinable;
    // no window sort of the feed). The oracle replays it as the
    // independent row_number-desc formulation.
    Q.sql("q186_cdc_apply",
      """WITH feed AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |         CASE event_type WHEN 'signup' THEN 'I'
        |                         WHEN 'error' THEN 'D'
        |                         ELSE 'U' END AS op,
        |         value
        |  FROM events),
        |r AS (
        |  SELECT user_id, us, event_id, op, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY us DESC, event_id DESC) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM feed)
        |SELECT user_id AS key, us AS seq,
        |       CAST(n_changes AS BIGINT) AS n_changes, value
        |FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY key""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val feed = graft.io.Tables.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        col("value"))
      graft.ops.Scd.applyCdc(feed, "user_id", "us", "event_id", "op",
          payloadCols = Seq("value"))
        .orderBy("key")
    },

    // Late-arriving dimension handling (q200): facts referencing dim keys
    // that have not arrived yet get INFERRED placeholder members (so fact
    // loads never drop or orphan rows); when the real dimension slice
    // lands, a priority struct-max backfill replaces the placeholders
    // in ONE key-grain aggregate (the q186 sort-free argmax — real beats
    // inferred, never vice versa). Keys whose dimension never arrives
    // stay placeholders, visible as the UNKNOWN segment. The report pins
    // membership per segment, how many members were backfilled, and that
    // the fact table has ZERO orphans against the final dimension.
    Q.sql("q200_late_arriving_dim",
      """WITH dim0 AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg, 0 AS inferred
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |need AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |inf AS (
        |  SELECT n.k, 'UNKNOWN' AS seg, 1 AS inferred
        |  FROM need n WHERE NOT EXISTS (SELECT 1 FROM dim0 d WHERE d.k = n.k)),
        |d1 AS (SELECT * FROM dim0 UNION ALL SELECT * FROM inf),
        |late AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg, 0 AS inferred
        |  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 5 <> 0),
        |merged AS (
        |  SELECT k,
        |         max(CASE WHEN inferred = 0 THEN 1 ELSE 0 END) AS has_real,
        |         min(CASE WHEN inferred = 0 THEN seg END) AS real_seg,
        |         min(seg) AS any_seg,
        |         max(inferred) AS was_inferred
        |  FROM (SELECT * FROM d1 UNION ALL SELECT * FROM late) u
        |  GROUP BY 1),
        |fin AS (
        |  SELECT k,
        |         CASE WHEN has_real = 1 THEN real_seg ELSE any_seg END AS seg,
        |         CASE WHEN was_inferred = 1 AND has_real = 1
        |              THEN 1 ELSE 0 END AS backfilled
        |  FROM merged),
        |orph AS (
        |  SELECT count(*) AS n_orphans FROM need n
        |  WHERE NOT EXISTS (SELECT 1 FROM fin f WHERE f.k = n.k))
        |SELECT seg AS segment, count(*) AS n_members,
        |       CAST(SUM(backfilled) AS BIGINT) AS n_backfilled,
        |       (SELECT n_orphans FROM orph) AS n_orphans
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val cust = graft.io.Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      val dim0 = cust.where(col("k") % 3 =!= 0)
        .withColumn("inferred", lit(0))
      val need = graft.io.Tables.orders(s, d)
        .select(col("o_custkey").as("k")).distinct()
      val inferred = need.join(dim0.select("k"), Seq("k"), "left_anti")
        .withColumn("seg", lit("UNKNOWN")).withColumn("inferred", lit(1))
      val d1 = dim0.unionByName(inferred)
      val late = cust.where(col("k") % 3 === 0 && col("k") % 5 =!= 0)
        .withColumn("inferred", lit(0))
      val merged = d1.unionByName(late)
        .groupBy("k")
        .agg(
          max(when(col("inferred") === 0, 1).otherwise(0)).as("has_real"),
          min(when(col("inferred") === 0, col("seg"))).as("real_seg"),
          min(col("seg")).as("any_seg"),
          max(col("inferred")).as("was_inferred"))
      val fin = merged.select(col("k"),
        when(col("has_real") === 1, col("real_seg")).otherwise(col("any_seg"))
          .as("seg"),
        when(col("was_inferred") === 1 && col("has_real") === 1, 1)
          .otherwise(0).as("backfilled"))
      val orph = need.join(fin.select("k"), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      fin.groupBy(col("seg").as("segment"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("backfilled")).as("n_backfilled"))
        .crossJoin(broadcast(orph))
        .orderBy("segment")
    })
}
