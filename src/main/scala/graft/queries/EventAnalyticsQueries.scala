package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.catalyst.{CountMinAgg, HllSketchAgg, KmvSketchAgg}
import graft.io.Tables
import graft.ops.Sessions

/** Event-log analytics over `events`: gap sessionization and cohort
  * retention. All comparisons run on exact integers (microsecond epochs,
  * day numbers), so the oracles replay bit-for-bit.
  */
object EventAnalyticsQueries {

  private val GapSeconds = 1800L

  val all: Seq[Q] = Seq(

    // Gap-based sessionization (30-minute inactivity): one row per session
    // with exact microsecond bounds and the decimal-summed value total.
    Q.sql("q53_sessionization",
      s"""WITH t AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS us
         |  FROM events),
         |f AS (
         |  SELECT user_id, event_id, value, us,
         |         CASE WHEN us - lag(us) OVER w > ${GapSeconds * 1000000L}
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (
         |  SELECT user_id, value, us,
         |         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                                ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM f)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |       min(us) AS start_us, max(us) AS end_us,
         |       count(*) AS n_events,
         |       cast(sum(cast(value as decimal(18,4))) as double) AS total_value
         |FROM s GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
      Sessions.sessionize(Tables.events(s, d), "user_id", "ts", "event_id",
          "value", GapSeconds)
        .orderBy("user_id", "session_idx")
    },

    // Ordered funnel view → click → purchase: each step counts users whose
    // step event falls strictly after their previous step's first
    // occurrence. Exact integer microsecond comparisons.
    Q.sql("q57_funnel",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t
        |       FROM e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t
        |       FROM e JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3)
        |ORDER BY step_idx""".stripMargin) { (s, d) =>
      Sessions.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("step_idx")
    },

    // Schema-projected JSON parsing of the semi-structured props column:
    // from_json with an explicit schema (never schema_of_json over data —
    // that is a driver-side sample pass), then plain integer aggregation.
    // The oracle extracts the same field with a shared-RE2 regex, so both
    // engines see identical integers regardless of JSON-library quirks.
    Q.sql("q67_props_stats",
      """WITH p AS (
        |  SELECT event_type,
        |         CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("k",
          from_json(col("props"), lit("k BIGINT"))("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    },

    // Exact heavy hitters via Misra–Gries sketch + exact verify pass
    // (operators.HeavyHitters / catalyst.FreqSketchAgg): keys with strictly
    // more than 1/128 of all events. The oracle is the full groupBy-HAVING
    // formulation — the sketch path must reproduce it exactly, which is
    // precisely the two-pass guarantee.
    Q.sql("q69_heavy_hitters",
      """SELECT user_id, count(*) AS cnt,
        |       (SELECT count(*) FROM events) AS n_total
        |FROM events GROUP BY 1
        |HAVING count(*) * 128 > (SELECT count(*) FROM events)
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.HeavyHitters
        .exactHeavyHitters(s, Tables.events(s, d), "user_id",
          threshold = 128, k = 256)
        .orderBy("user_id")
    },

    // Gaps-and-islands run-length encoding (Sessions.runs): consecutive
    // same-event-type runs per user, exact microsecond bounds.
    Q.sql("q71_state_islands",
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, event_type, us,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                   OR lag(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, event_type, us,
        |         sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS run_idx
        |  FROM f)
        |SELECT user_id, CAST(run_idx AS BIGINT) AS run_idx,
        |       min(event_type) AS state,
        |       min(us) AS start_us, max(us) AS end_us,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, run_idx
        |ORDER BY user_id, run_idx""".stripMargin) { (s, d) =>
      Sessions.runs(Tables.events(s, d), "user_id", "ts", "event_id",
          "event_type")
        .select(col("user_id"), col("run_idx"), col("state"),
          col("start_us"), col("end_us"), col("n_events"))
        .orderBy("user_id", "run_idx")
    },

    // Bounded window frame: 4-event moving average (ROWS BETWEEN 3
    // PRECEDING) and inter-event gap via lag — the time-series smoothing
    // frame. The frame sum is exact decimal, divided by the exact frame
    // count, so partition order can't shift a bit.
    Q.sql("q76_moving_avg",
      """WITH t AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events)
        |SELECT user_id, event_id, us,
        |       us - lag(us) OVER w AS delta_us,
        |       floor(CAST(sum(CAST(value AS DECIMAL(18,4)))
        |               OVER (PARTITION BY user_id ORDER BY us, event_id
        |                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |             / count(*) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |             * 1000000 + 0.5) / 1000000 AS mavg4
        |FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, us, event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val order = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      val frame = order.rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .select(col("user_id"), col("event_id"), col("us"),
          (col("us") - lag("us", 1).over(order)).as("delta_us"),
          Qutil.dround(
            sum(col("value").cast(DecimalType(18, 4))).over(frame)
              .cast("double") / count(lit(1)).over(frame), 6).as("mavg4"))
        .orderBy("user_id", "us", "event_id")
    },

    // Incremental aggregate maintenance: pre-aggregated state for the old
    // half of the log merges with a fresh partial over the new half, and
    // the result provably equals the one-shot full aggregate — which is
    // exactly what the oracle states. Works because every aggregate here
    // is algebraic (counts add; decimal sums add exactly); this is the
    // materialized-rollup refresh pattern where only the new day's sliver
    // is ever re-scanned.
    Q.sql("q77_incremental_agg",
      """SELECT event_type, count(*) AS n,
        |       cast(sum(cast(value as decimal(18,4))) as double) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val split = lit("2024-01-16").cast("date")
      val ev = Tables.events(s, d)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"), Qutil.msum(col("value")).as("total_value"))
      val state = partial(ev.where(to_date(col("ts")) < split))
      val fresh = partial(ev.where(to_date(col("ts")) >= split))
      state.unionByName(fresh)
        .groupBy("event_type")
        .agg(sum("n").as("n"), Qutil.msum(col("total_value")).as("total_value"))
        .orderBy("event_type")
    },

    // Quantile discretization (Stats.quantileBins): per-type quartile
    // boundaries fit exactly (q55's percentile/quantile_cont agreement),
    // rounded onto the shared 6dp grid, then every event binned by
    // boundaries-strictly-below. Summarized per (type, bin).
    Q.sql("q82_quantile_bins",
      """WITH b AS (
        |  SELECT event_type,
        |         floor(quantile_cont(value, 0.25) * 1000000 + 0.5) / 1000000 AS b0,
        |         floor(quantile_cont(value, 0.5)  * 1000000 + 0.5) / 1000000 AS b1,
        |         floor(quantile_cont(value, 0.75) * 1000000 + 0.5) / 1000000 AS b2
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |       CAST((CASE WHEN value > b0 THEN 1 ELSE 0 END) +
        |            (CASE WHEN value > b1 THEN 1 ELSE 0 END) +
        |            (CASE WHEN value > b2 THEN 1 ELSE 0 END) AS BIGINT) AS bin,
        |       count(*) AS n
        |FROM events e JOIN b USING (event_type)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      graft.ops.Stats.quantileBins(Tables.events(s, d), Seq("event_type"),
          "value", Seq(0.25, 0.5, 0.75))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin")
    },

    // Interval-overlap join (AsOf.intervalOverlapJoin): which user sessions
    // overlap a system-wide error incident? Both interval sets come from
    // sessionization (user sessions: 30-min gap; incidents: error events,
    // 10-min gap, one global key — incidents are inherently global and the
    // single-key window holds only error rows). The banded overlap join
    // attributes each pair to the band of its overlap start — no distinct.
    Q.sql("q87_session_incident_overlap",
      s"""WITH t AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         |f AS (
         |  SELECT user_id, event_id, us,
         |         CASE WHEN us - lag(us) OVER w > ${30 * 60 * 1000000L}
         |              THEN 1 ELSE 0 END AS ns
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (
         |  SELECT user_id, us,
         |         sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                       ROWS UNBOUNDED PRECEDING) AS sidx
         |  FROM f),
         |sess AS (
         |  SELECT user_id, CAST(sidx AS BIGINT) AS session_idx,
         |         min(us) AS s_lo, max(us) + 1 AS s_hi
         |  FROM s GROUP BY 1, 2),
         |e AS (SELECT event_id, epoch_us(ts) AS us FROM events
         |      WHERE event_type = 'error'),
         |ef AS (
         |  SELECT us, event_id,
         |         CASE WHEN us - lag(us) OVER w2 > ${10 * 60 * 1000000L}
         |              THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w2 AS (ORDER BY us, event_id)),
         |es AS (
         |  SELECT us, sum(ns) OVER (ORDER BY us, event_id
         |                           ROWS UNBOUNDED PRECEDING) AS iidx
         |  FROM ef),
         |inc AS (SELECT CAST(iidx AS BIGINT) AS incident_idx,
         |               min(us) AS i_lo, max(us) + 1 AS i_hi
         |        FROM es GROUP BY 1)
         |SELECT sess.user_id, sess.session_idx, count(*) AS n_incidents
         |FROM sess JOIN inc
         |  ON sess.s_lo < inc.i_hi AND inc.i_lo < sess.s_hi
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val sess = Sessions.sessionize(ev, "user_id", "ts", "event_id",
          "value", 1800L)
        .select(col("user_id"), col("session_idx"),
          col("start_us").as("s_lo"), (col("end_us") + 1L).as("s_hi"))
      // incidents are inherently global (no key) — sessionizeGlobal's
      // range-partition + carry-in offsets, NOT a constant-key window
      // whose single partition would sort the whole error stream in one
      // task at scale (the registry-wide PlanSpec gate pins this)
      val inc = Sessions.sessionizeGlobal(
          ev.where(col("event_type") === "error"),
          "ts", "event_id", "value", 600L)
        .select(col("session_idx").as("incident_idx"),
          col("start_us").as("i_lo"), (col("end_us") + 1L).as("i_hi"))
      graft.ops.AsOf.intervalOverlapJoin(sess, "s_lo", "s_hi",
          inc, "i_lo", "i_hi", bandWidth = 3600L * 1000000L)
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_incidents"))
        .orderBy("user_id", "session_idx")
    },

    // Cohort retention: first-activity-day cohorts x day offset, distinct
    // active users. Integer day arithmetic end to end.
    Q.sql("q54_retention_cohorts",
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) - DATE '1970-01-01' AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
        |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
        |       count(DISTINCT d.user_id) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Sessions.retentionCohorts(Tables.events(s, d), "user_id", "ts")
        .select(col("cohort_day").cast("long").as("cohort_day"),
          col("day_offset").cast("long").as("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Mergeable HLL sketch rollup: per-event-type distinct user-days via a
    // constant-size HllSketchAgg buffer, then an 'ALL' row produced by
    // MERGING the per-type register arrays (element-wise max) — never
    // rescanning the events — exactly how a 100 TB deployment rolls
    // per-day/per-source sketch tables up to arbitrary windows. The exact
    // count(distinct) column pins sketch accuracy and the oracle rebuilds
    // every register from the deterministic 60-bit md5 hash, so a hash
    // match proves the full register state, the merge, and the estimator
    // bit-for-bit (estimator determinism notes: HllSketchAgg.hllEstimate).
    Q.sql("q118_hll_rollup",
      """WITH k AS (
        |  SELECT event_type,
        |         user_id::VARCHAR || ':' || strftime(ts, '%Y-%m-%d') AS k
        |  FROM events),
        |h AS (
        |  SELECT event_type, k,
        |         ('0x' || substr(md5(k), 1, 15))::BIGINT AS h
        |  FROM k),
        |r AS (
        |  SELECT event_type, h % 64 AS j,
        |         MAX(CASE WHEN h // 64 = 0 THEN 55
        |                  ELSE 55 - length(ltrim(bin(h // 64), '0')) END) AS rho
        |  FROM h GROUP BY 1, 2),
        |fullr AS (
        |  SELECT t.event_type, g.j, coalesce(r.rho, 0) AS rho
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
        |  LEFT JOIN r ON r.event_type = t.event_type AND r.j = g.j),
        |merged AS (
        |  SELECT 'ALL' AS event_type, j, MAX(rho) AS rho FROM fullr GROUP BY 2),
        |regs AS (SELECT * FROM fullr UNION ALL SELECT * FROM merged),
        |est AS (
        |  SELECT event_type,
        |         SUM(1::BIGINT << (55 - rho)) AS intsum,
        |         SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
        |  FROM regs GROUP BY 1),
        |ex AS (
        |  SELECT event_type, count(DISTINCT k) AS exact_distinct FROM h GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL', count(DISTINCT k) FROM h),
        |fin AS (
        |  SELECT e.event_type,
        |         CASE WHEN ((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64 AS DOUBLE))) * CAST(4096 AS DOUBLE)) * CAST(36028797018963968 AS DOUBLE) / CAST(e.intsum AS DOUBLE) <= CAST(160 AS DOUBLE) AND e.v > 0
        |              THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / CAST(e.v AS DOUBLE))
        |              ELSE ((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64 AS DOUBLE))) * CAST(4096 AS DOUBLE)) * CAST(36028797018963968 AS DOUBLE) / CAST(e.intsum AS DOUBLE) END AS est,
        |         x.exact_distinct
        |  FROM est e JOIN ex x ON x.event_type = e.event_type)
        |SELECT event_type,
        |       floor(est * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(100 AS DOUBLE) AS approx_distinct,
        |       exact_distinct
        |FROM fin ORDER BY event_type""".stripMargin) { (s, d) =>
      val keyed = Tables.events(s, d)
        .select(col("event_type"),
          concat_ws(":", col("user_id"), to_date(col("ts"))).as("k"))
        .withColumn("h",
          expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)"))
      val perType = keyed.groupBy("event_type")
        .agg(HllSketchAgg.hllSketch(col("h")).as("regs"),
          countDistinct(col("k")).as("exact_distinct"))
      // 'ALL' = register-wise max across the five per-type sketches; the
      // exact column is the only thing that has to touch the data again.
      val mergedRegs = perType
        .select(posexplode(col("regs")).as(Seq("j", "rho")))
        .groupBy("j").agg(max(col("rho")).as("rho"))
        .agg(expr("transform(array_sort(collect_list(struct(j, rho))), s -> s.rho)")
          .as("regs"))
      val allRow = mergedRegs
        .crossJoin(keyed.agg(countDistinct(col("k")).as("exact_distinct")))
        .select(lit("ALL").as("event_type"),
          HllSketchAgg.hllEstimate("regs").as("approx_distinct"),
          col("exact_distinct"))
      perType
        .select(col("event_type"),
          HllSketchAgg.hllEstimate("regs").as("approx_distinct"),
          col("exact_distinct"))
        .unionByName(allRow)
        .orderBy("event_type")
    },

    // Incremental sketch table AT REST (the q102 composition applied to
    // q118's sketches): history days are aggregated to one 64-register row
    // per (event_type, day), WRITTEN to a day-partitioned table, re-read,
    // and merged with the new batch days' sketches by register max — the
    // raw history events are never touched again. The oracle computes the
    // registers in ONE pass over all raw events with no day split, so a
    // hash match proves the at-rest round trip AND the merge-associativity
    // contract (per-day sketches merged ≡ sketch of the union) on real
    // data, not just in the unit spec. At 100 TB this is the only sane
    // shape for "distinct users over an arbitrary window": the sketch
    // table is O(days × types × 64 bytes) and windows prune partitions.
    Q.sql("q120_hll_incremental",
      """WITH k AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         user_id::VARCHAR || ':' || strftime(ts, '%Y-%m-%d') AS k
        |  FROM events),
        |h AS (
        |  SELECT event_type, day, k,
        |         ('0x' || substr(md5(k), 1, 15))::BIGINT AS h
        |  FROM k),
        |r AS (
        |  SELECT event_type, h % 64 AS j,
        |         MAX(CASE WHEN h // 64 = 0 THEN 55
        |                  ELSE 55 - length(ltrim(bin(h // 64), '0')) END) AS rho
        |  FROM h GROUP BY 1, 2),
        |fullr AS (
        |  SELECT t.event_type, g.j, coalesce(r.rho, 0) AS rho
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
        |  LEFT JOIN r ON r.event_type = t.event_type AND r.j = g.j),
        |est AS (
        |  SELECT event_type,
        |         SUM(1::BIGINT << (55 - rho)) AS intsum,
        |         SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
        |  FROM fullr GROUP BY 1),
        |dd AS (
        |  SELECT event_type, count(DISTINCT day) AS n_days FROM h GROUP BY 1),
        |fin AS (
        |  SELECT e.event_type,
        |         CASE WHEN ((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64 AS DOUBLE))) * CAST(4096 AS DOUBLE)) * CAST(36028797018963968 AS DOUBLE) / CAST(e.intsum AS DOUBLE) <= CAST(160 AS DOUBLE) AND e.v > 0
        |              THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / CAST(e.v AS DOUBLE))
        |              ELSE ((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64 AS DOUBLE))) * CAST(4096 AS DOUBLE)) * CAST(36028797018963968 AS DOUBLE) / CAST(e.intsum AS DOUBLE) END AS est,
        |         d.n_days
        |  FROM est e JOIN dd d ON d.event_type = e.event_type)
        |SELECT event_type,
        |       floor(est * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(100 AS DOUBLE) AS approx_distinct,
        |       n_days
        |FROM fin ORDER BY event_type""".stripMargin) { (s, d) =>
      val cut = "2024-01-21"
      val keyed = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          concat_ws(":", col("user_id"), to_date(col("ts"))).as("k"))
        .withColumn("h",
          expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)"))
      // history: one sketch row per (type, day), at rest, day-partitioned
      graft.io.Writers.replaceManagedTable(
        keyed.where(col("day") < lit(cut).cast("date"))
          .groupBy("event_type", "day")
          .agg(HllSketchAgg.hllSketch(col("h")).as("regs")),
        "graft_hll_daily", partitionCol = Some("day"))
      val batch = keyed.where(col("day") >= lit(cut).cast("date"))
        .groupBy("event_type", "day")
        .agg(HllSketchAgg.hllSketch(col("h")).as("regs"))
      val allSketches = s.table("graft_hll_daily")
        .select("event_type", "day", "regs").unionByName(batch)
      val regsByType = allSketches
        .select(col("event_type"), posexplode(col("regs")).as(Seq("j", "rho")))
        .groupBy("event_type", "j").agg(max(col("rho")).as("rho"))
        .groupBy("event_type")
        .agg(expr("transform(array_sort(collect_list(struct(j, rho))), s -> s.rho)")
          .as("regs"))
      val days = allSketches.groupBy("event_type")
        .agg(countDistinct(col("day")).as("n_days"))
      regsByType.join(days, Seq("event_type"))
        .select(col("event_type"),
          HllSketchAgg.hllEstimate("regs").as("approx_distinct"),
          col("n_days"))
        .orderBy("event_type")
    },

    // Count-Min frequency sketch (the additive twin of q118's HLL): one
    // 4×512 counter matrix per event type from a constant-16KB
    // CountMinAgg buffer, merged to an 'ALL' matrix by ELEMENT-WISE SUM
    // (never rescanning the events), then probed for the top-10 users'
    // frequencies. The oracle rebuilds every probed cell from the
    // deterministic md5 hash fields, so a hash match proves the counter
    // state, the merge, and the min-over-rows estimator exactly; the
    // exact_count column pins the overcount-only guarantee on real data
    // (and is the only thing that would be dropped in production — the
    // sketch exists so "how often did key k occur" never rescans 100 TB).
    Q.sql("q121_cms_freq",
      """WITH k AS (
        |  SELECT user_id::VARCHAR AS k FROM events),
        |h AS (
        |  SELECT k, ('0x' || substr(md5(k), 1, 15))::BIGINT AS h FROM k),
        |cells AS (
        |  SELECT g.i, (h.h >> (9 * g.i)) % 512 AS col, count(*) AS c
        |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g
        |  GROUP BY 1, 2),
        |ex AS (
        |  SELECT k, h, count(*) AS exact_count
        |  FROM h GROUP BY 1, 2
        |  ORDER BY exact_count DESC, k LIMIT 10),
        |est AS (
        |  SELECT ex.k, ex.exact_count, min(c.c) AS est_count
        |  FROM ex JOIN cells c ON c.col = (ex.h >> (9 * c.i)) % 512
        |  GROUP BY 1, 2)
        |SELECT CAST(k AS BIGINT) AS user_id, est_count, exact_count
        |FROM est ORDER BY exact_count DESC, user_id""".stripMargin) { (s, d) =>
      val keyed = Tables.events(s, d)
        .select(col("event_type"), col("user_id").cast("string").as("k"))
        .withColumn("h",
          expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)"))
      val perType = keyed.groupBy("event_type")
        .agg(CountMinAgg.cmsSketch(col("h")).as("m"))
      // 'ALL' = element-wise sum across the per-type matrices — the
      // at-rest rollup op (per-day/source sketch tables add the same way)
      val merged = perType
        .select(posexplode(col("m")).as(Seq("j", "c")))
        .groupBy("j").agg(sum(col("c")).as("c"))
        .agg(expr("transform(array_sort(collect_list(struct(j, c))), s -> CAST(s.c AS BIGINT))")
          .as("m"))
      val probes = keyed.groupBy("k", "h").agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("k")).limit(10)
      probes.crossJoin(merged)
        .select(col("k").cast("bigint").as("user_id"),
          CountMinAgg.cmsEstimate("m", "h").as("est_count"),
          col("exact_count"))
        .orderBy(col("exact_count").desc, col("user_id"))
    },

    // KMV/theta bottom-k sketches: per-event-type sketches of the distinct
    // user universe (constant ≤64-long KmvSketchAgg buffer — no
    // (type, user) distinct pre-shuffle), then ALL pairwise segment
    // overlaps estimated from the sketches ALONE: union sketch = bottom-k
    // of the two sketches' union (closure property), θ = its max,
    // est_union = 63·2^60/θ, est_inter = overlap/64 · est_union. The
    // oracle replays the identical bottom-k selection and estimator
    // arithmetic over the deterministic hashes, and exact_inter pins
    // accuracy on real data. At 100 TB this answers "audience overlap
    // between any two segments" from O(segments × 64) longs at rest.
    Q.sql("q122_kmv_overlap",
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (
        |  SELECT event_type, h,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM h),
        |sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
        |t AS (SELECT DISTINCT event_type FROM h),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM t a JOIN t b ON a.event_type < b.event_type),
        |un AS (
        |  SELECT p.type_a, p.type_b, s.h
        |  FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
        |  GROUP BY 1, 2, 3),
        |ur AS (
        |  SELECT type_a, type_b, h,
        |         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn,
        |         count(*) OVER (PARTITION BY type_a, type_b) AS nu
        |  FROM un),
        |uk AS (SELECT * FROM ur WHERE rn <= 64),
        |fl AS (
        |  SELECT u.type_a, u.type_b, u.h, u.nu,
        |         max(CASE WHEN s.event_type = u.type_a THEN 1 ELSE 0 END) AS in_a,
        |         max(CASE WHEN s.event_type = u.type_b THEN 1 ELSE 0 END) AS in_b
        |  FROM uk u JOIN sk s ON s.h = u.h AND s.event_type IN (u.type_a, u.type_b)
        |  GROUP BY 1, 2, 3, 4),
        |ag AS (
        |  SELECT type_a, type_b, min(nu) AS nu, max(h) AS theta,
        |         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS m
        |  FROM fl GROUP BY 1, 2),
        |ei AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         count(*) AS exact_inter
        |  FROM h a JOIN h b ON b.h = a.h AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT g.type_a, g.type_b, g.nu, g.m,
        |         CASE WHEN g.nu < 64 THEN CAST(g.nu AS DOUBLE)
        |              ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) / CAST(g.theta AS DOUBLE) END AS raw_union,
        |         coalesce(e.exact_inter, 0) AS exact_inter
        |  FROM ag g LEFT JOIN ei e
        |    ON e.type_a = g.type_a AND e.type_b = g.type_b)
        |SELECT type_a, type_b,
        |       floor(raw_union * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(100 AS DOUBLE) AS est_union,
        |       CAST(m AS BIGINT) AS sketch_overlap,
        |       floor((CASE WHEN nu < 64 THEN CAST(m AS DOUBLE)
        |                   ELSE CAST(m AS DOUBLE) / CAST(64 AS DOUBLE) * raw_union END) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(100 AS DOUBLE) AS est_inter,
        |       exact_inter
        |FROM est ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
      val sk = h.groupBy("event_type").agg(KmvSketchAgg.kmvSketch(col("h")).as("s"))
      val pairs = sk.as("a").join(sk.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.s").as("sa"), col("b.s").as("sb"))
      val dh = h.distinct()
      val ei = dh.as("x").join(dh.as("y"),
          col("y.h") === col("x.h") && col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("exact_inter"))
      val rawUnion = "CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE) " +
        s"ELSE CAST(63 AS DOUBLE) * ${KmvSketchAgg.HashSpace} / CAST(theta AS DOUBLE) END"
      pairs
        .withColumn("u", expr("slice(array_sort(array_union(sa, sb)), 1, 64)"))
        .withColumn("nu", expr("size(array_union(sa, sb))"))
        .withColumn("theta", expr("element_at(u, size(u))"))
        .withColumn("m",
          expr("size(filter(u, x -> array_contains(sa, x) AND array_contains(sb, x)))"))
        .withColumn("raw_union", expr(rawUnion))
        .join(ei, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"),
          Qutil.dround(col("raw_union"), 2).as("est_union"),
          col("m").cast("bigint").as("sketch_overlap"),
          Qutil.dround(expr("CASE WHEN nu < 64 THEN CAST(m AS DOUBLE) " +
            "ELSE CAST(m AS DOUBLE) / CAST(64 AS DOUBLE) * raw_union END"), 2)
            .as("est_inter"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
        .orderBy("type_a", "type_b")
    },

    // Incremental histogram-quantile table at rest — the QUANTILE slot of
    // the mergeable family (q120 HLL = distinct, q121 CMS = frequency,
    // q122 KMV = overlap): per (event_type, day) sparse fixed-grid
    // histograms (bucket = floor(value·100) — the 2dp grid) land in a
    // day-partitioned table; merge-on-read is a plain additive rollup with
    // the new batch days; p50/p95/p99 come off the merged cumulative
    // histogram as the smallest bucket with 100·cum ≥ p·n — grid-exact,
    // all-integer, so the oracle (one raw-event pass, no day split)
    // replays it bit-for-bit and a hash match proves the at-rest round
    // trip AND histogram additivity on real data. At 100 TB: quantiles
    // over an arbitrary window read O(days × types × grid) sketch rows,
    // never the events; exact `percentile` (q55) stays the one-shot path.
    Q.sql("q127_histogram_quantile_incremental",
      """WITH b AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS bucket
        |  FROM events),
        |h AS (SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
        |      FROM h GROUP BY 1),
        |c AS (SELECT event_type, bucket,
        |             CAST(sum(n) OVER (PARTITION BY event_type
        |                               ORDER BY bucket) AS BIGINT) AS cum
        |      FROM h),
        |q AS (
        |  SELECT c.event_type, p.p, min(c.bucket) AS qb
        |  FROM c JOIN t ON t.event_type = c.event_type
        |  CROSS JOIN (VALUES (50), (95), (99)) p(p)
        |  WHERE c.cum * 100 >= p.p * t.total
        |  GROUP BY 1, 2)
        |SELECT t.event_type, t.total AS n,
        |       CAST(max(CASE WHEN p = 50 THEN qb END) AS DOUBLE) / CAST(100 AS DOUBLE) AS p50_g,
        |       CAST(max(CASE WHEN p = 95 THEN qb END) AS DOUBLE) / CAST(100 AS DOUBLE) AS p95_g,
        |       CAST(max(CASE WHEN p = 99 THEN qb END) AS DOUBLE) / CAST(100 AS DOUBLE) AS p99_g
        |FROM q JOIN t ON t.event_type = q.event_type
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cut = "2024-01-21"
      val keyed = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          floor(col("value") * 100).cast("long").as("bucket"))
      // history: sparse per-day histograms at rest, day-partitioned
      graft.io.Writers.replaceManagedTable(
        keyed.where(col("day") < lit(cut).cast("date"))
          .groupBy("event_type", "day", "bucket")
          .agg(count(lit(1)).as("n")),
        "graft_hist_daily", partitionCol = Some("day"))
      val batch = keyed.where(col("day") >= lit(cut).cast("date"))
        .groupBy("event_type", "day", "bucket")
        .agg(count(lit(1)).as("n"))
      // merge-on-read: histograms are additive
      val merged = s.table("graft_hist_daily")
        .select("event_type", "bucket", "n").unionByName(batch.drop("day"))
        .groupBy("event_type", "bucket").agg(sum("n").as("n"))
      val tot = merged.groupBy("event_type").agg(sum("n").as("total"))
      val cum = merged.withColumn("cum",
        sum("n").over(Window.partitionBy("event_type").orderBy("bucket")))
      import s.implicits._
      val qb = cum.join(tot, "event_type")
        .crossJoin(Seq(50, 95, 99).toDF("p"))
        .where(col("cum") * 100 >= col("p") * col("total"))
        .groupBy("event_type", "p").agg(min("bucket").as("qb"))
      qb.groupBy("event_type")
        .agg(max(when(col("p") === 50, col("qb"))).as("qb50"),
          max(when(col("p") === 95, col("qb"))).as("qb95"),
          max(when(col("p") === 99, col("qb"))).as("qb99"))
        .join(tot, "event_type")
        .select(col("event_type"), col("total").as("n"),
          (col("qb50").cast("double") / lit(100.0)).as("p50_g"),
          (col("qb95").cast("double") / lit(100.0)).as("p95_g"),
          (col("qb99").cast("double") / lit(100.0)).as("p99_g"))
        .orderBy("event_type")
    },

    // Marketing attribution, both classic models in one report: each
    // purchase's value goes to the user's most recent preceding touch
    // (LAST-touch — the as-of join, q35's operator re-used on a business
    // question) and to the user's first-ever touch at or before the
    // purchase (FIRST-touch — argmin per user + one broadcast-size join).
    // Purchases with no prior touch land in 'none'. The oracle replays
    // joinAsOf's tagged-union window ordering (us, right-first, tie id)
    // verbatim, so tie semantics — the part engines disagree on — are
    // pinned exactly. All time comparisons are integer micros.
    Q.sql("q129_touch_attribution",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value
        |  FROM events),
        |t AS (SELECT * FROM e
        |      WHERE event_type IN ('click', 'view', 'signup')),
        |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
        |un AS (
        |  SELECT user_id, us, 1 AS is_right, event_id AS tie, NULL AS value,
        |         event_type AS touch FROM t
        |  UNION ALL
        |  SELECT user_id, us, 0 AS is_right, NULL, value, NULL FROM p),
        |w AS (
        |  SELECT *, last_value(touch IGNORE NULLS) OVER (
        |           PARTITION BY user_id
        |           ORDER BY us, is_right DESC, coalesce(tie, 0)
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
        |  FROM un),
        |lt AS (SELECT 'last_touch' AS model,
        |              coalesce(carried, 'none') AS touch_type,
        |              count(*) AS n_purchases,
        |              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |       FROM w WHERE is_right = 0 GROUP BY 1, 2),
        |f AS (SELECT user_id, event_type AS ftype, us AS fus FROM (
        |        SELECT user_id, event_type, us,
        |               row_number() OVER (PARTITION BY user_id
        |                                  ORDER BY us, event_id) AS rn
        |        FROM t) WHERE rn = 1),
        |ft AS (SELECT 'first_touch' AS model,
        |              CASE WHEN f.user_id IS NOT NULL AND f.fus <= p.us
        |                   THEN f.ftype ELSE 'none' END AS touch_type,
        |              count(*) AS n_purchases,
        |              CAST(SUM(CAST(p.value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |       FROM p LEFT JOIN f ON f.user_id = p.user_id GROUP BY 1, 2)
        |SELECT * FROM (SELECT * FROM lt UNION ALL SELECT * FROM ft)
        |ORDER BY model, touch_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_id"), col("event_type"), col("value"))
      val touches = e.where(col("event_type")
        .isInCollection(Seq("click", "view", "signup")))
      val purch = e.where(col("event_type") === "purchase")
      val lt = graft.ops.AsOf.joinAsOf(purch, touches, "user_id", "us", "us",
          payloadCols = Seq("event_type", "event_id"),
          tieBreak = Some("event_id"))
        .groupBy(coalesce(col("asof_event_type"), lit("none")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          Qutil.msum(col("value"), 4).as("revenue"))
        .withColumn("model", lit("last_touch"))
      val first = graft.ops.Windows.keepBest(touches, Seq("user_id"),
          Seq(col("us").asc, col("event_id").asc))
        .select(col("user_id"), col("us").as("fus"),
          col("event_type").as("ftype"))
      val ft = purch.join(first, Seq("user_id"), "left")
        .groupBy(when(col("fus").isNotNull && col("fus") <= col("us"),
            col("ftype")).otherwise("none").as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          Qutil.msum(col("value"), 4).as("revenue"))
        .withColumn("model", lit("first_touch"))
      lt.unionByName(ft)
        .select("model", "touch_type", "n_purchases", "revenue")
        .orderBy("model", "touch_type")
    },

    // First-order Markov transition matrix over each user's event stream:
    // consecutive-event (from → to) counts under the exact (micros,
    // event_id) order, with per-from-state probabilities — the
    // session-behavior model behind next-event prediction and funnel
    // drop-off analysis. One user-keyed window (lead) + one pair-grain
    // aggregate; the probability join is states²-sized (config-scale).
    // Integer counts; probabilities are identical divisions 6dp-rounded.
    Q.sql("q133_markov_transitions",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY us, event_id) AS to_type
        |  FROM e),
        |tr AS (SELECT from_type, to_type, count(*) AS n FROM t
        |       WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n) AS tot FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.n,
        |       floor(CAST(tr.n AS DOUBLE) / CAST(tot.tot AS DOUBLE) * 1000000 + 0.5) / 1000000 AS p
        |FROM tr JOIN tot ON tot.from_type = tr.from_type
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d).select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val tr = e
        .withColumn("to_type", lead("event_type", 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy("from_type").agg(sum("n").as("tot"))
      tr.join(tot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          Qutil.dround(col("n").cast("double") / col("tot").cast("double"), 6)
            .as("p"))
        .orderBy("from_type", "to_type")
    },

    // Growth accounting (the DAU ledger): every active (user, day)
    // classifies as new (first day ever) / retained (also active
    // yesterday) / resurrected (active before, but not yesterday), and
    // churn counts users active yesterday who went silent today — the
    // standard product-analytics decomposition (new + retained +
    // resurrected − churned = ΔDAU). One exchange on the user key (min +
    // lag/lead share the window sort), day-grain aggregates after;
    // integer day arithmetic end to end. Days with zero actives report no
    // row (a churn-only day folds into the next active day's ledger).
    Q.sql("q144_growth_accounting",
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |         CAST(ts AS DATE) - DATE '1970-01-01' AS day
        |  FROM events),
        |f AS (SELECT user_id, day,
        |             min(day) OVER (PARTITION BY user_id) AS first_day,
        |             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
        |             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
        |      FROM d),
        |act AS (
        |  SELECT day,
        |         CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |         CAST(SUM(CASE WHEN day <> first_day AND prev_day = day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |         CAST(SUM(CASE WHEN day <> first_day AND prev_day <> day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM f GROUP BY 1),
        |b AS (SELECT max(day) AS mx FROM d),
        |ch AS (SELECT day + 1 AS day, count(*) AS n_churned
        |       FROM f CROSS JOIN b
        |       WHERE day + 1 <= mx AND (next_day IS NULL OR next_day > day + 1)
        |       GROUP BY 1)
        |SELECT a.day, a.n_new, a.n_retained, a.n_resurrected,
        |       CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
        |FROM act a LEFT JOIN ch ON ch.day = a.day
        |ORDER BY a.day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val days = Tables.events(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .distinct()
      val wAll = Window.partitionBy("user_id")
      val wOrd = Window.partitionBy("user_id").orderBy("day")
      val f = days
        .withColumn("first_day", min("day").over(wAll))
        .withColumn("prev_day", lag("day", 1).over(wOrd))
        .withColumn("next_day", lead("day", 1).over(wOrd))
      val act = f.groupBy("day").agg(
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("day") =!= col("first_day") &&
          col("prev_day") === col("day") - 1, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("day") =!= col("first_day") &&
          col("prev_day") =!= col("day") - 1, 1L).otherwise(0L)).as("n_resurrected"))
      val mx = days.agg(max("day").as("mx"))
      val ch = f.crossJoin(broadcast(mx))
        .where(col("day") + 1 <= col("mx") &&
          (col("next_day").isNull || col("next_day") > col("day") + 1))
        .groupBy((col("day") + 1).as("day"))
        .agg(count(lit(1)).as("n_churned"))
      act.join(ch, Seq("day"), "left")
        .select(col("day"), col("n_new"), col("n_retained"),
          col("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy("day")
    },

    // Interval-union coverage (ops.Intervals): each event opens a span of
    // 60·⌊value⌋ seconds; overlapping/touching spans per user merge into
    // maximal islands and covered time counts each second ONCE — the
    // uptime/watch-time primitive where naive SUM(duration) double-counts.
    // One key-partitioned window, integer epoch arithmetic end to end.
    Q.sql("q148_interval_coverage",
      """WITH sp AS (
        |  SELECT user_id, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |         CAST(floor(epoch(ts)) AS BIGINT)
        |           + 60 * CAST(floor(value) AS BIGINT) AS e
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, s, e,
        |         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
        |              THEN 1 ELSE 0 END AS ni
        |  FROM sp
        |  WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (
        |  SELECT user_id, s, e,
        |         SUM(ni) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS isl
        |  FROM f),
        |i AS (
        |  SELECT user_id, isl, min(s) AS i_s, max(e) AS i_e
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |       CAST(SUM(i_e - i_s) AS BIGINT) AS covered
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // ts lands as TIMESTAMP_NTZ; the ltz hop under the UTC session TZ
      // yields the same naive-as-UTC epoch seconds DuckDB's epoch() gives.
      val epochS = col("ts").cast("timestamp_ltz").cast("long")
      val spans = Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        epochS.as("s"),
        (epochS + lit(60L) * floor(col("value")).cast("long")).as("e"))
      graft.ops.Intervals.coverage(spans, "user_id", "s", "e", "event_id")
        .orderBy("user_id")
    },

    // Two-proportion z-test A/B readout: variant = user_id parity,
    // conversion = "user produced this event_type with value > 100",
    // exposure = all users in the variant. One report row per event_type
    // with rates, pooled z and the |z| > 1.96 flag. All inputs are exact
    // integer counts; sqrt/division are correctly-rounded IEEE ops, so the
    // 6dp-rounded statistics replay bit-identically in DuckDB. Scale: two
    // distinct-count aggregates on the (type, variant, user) grain — no
    // per-user state leaves the executors.
    Q.sql("q149_ab_ztest",
      """WITH u AS (SELECT DISTINCT user_id,
        |                  CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v
        |           FROM events),
        |tot AS (SELECT v, count(*) AS n FROM u GROUP BY 1),
        |conv AS (
        |  SELECT event_type,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
        |         count(DISTINCT user_id) AS c
        |  FROM events WHERE value > 100 GROUP BY 1, 2),
        |w AS (
        |  SELECT c.event_type,
        |         MAX(CASE WHEN c.v = 'A' THEN c.c END) AS ca,
        |         MAX(CASE WHEN c.v = 'B' THEN c.c END) AS cb,
        |         MAX(CASE WHEN t.v = 'A' THEN t.n END) AS na,
        |         MAX(CASE WHEN t.v = 'B' THEN t.n END) AS nb
        |  FROM conv c JOIN tot t ON c.v = t.v
        |  GROUP BY 1),
        |z AS (
        |  SELECT event_type, ca, cb, na, nb,
        |         CAST(ca AS DOUBLE) / na AS pa,
        |         CAST(cb AS DOUBLE) / nb AS pb,
        |         CAST(ca + cb AS DOUBLE) / (na + nb) AS p
        |  FROM w)
        |SELECT event_type,
        |       CASE WHEN p > 0 AND p < 1 THEN
        |         floor((pa - pb)
        |               / sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
        |               * 1000000 + 0.5) / 1000000 END AS z_score,
        |       floor(pa * 1000000 + 0.5) / 1000000 AS rate_a,
        |       floor(pb * 1000000 + 0.5) / 1000000 AS rate_b,
        |       CASE WHEN p > 0 AND p < 1 AND abs((pa - pb)
        |              / sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))) > 1.96
        |            THEN 1 ELSE 0 END AS significant
        |FROM z ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val variant = when(col("user_id") % 2 === 0, "A").otherwise("B")
      val tot = ev.select(col("user_id")).distinct()
        .groupBy(variant.as("v")).agg(count(lit(1)).as("n"))
      val conv = ev.where(col("value") > 100)
        .groupBy(col("event_type"), variant.as("v"))
        .agg(count_distinct(col("user_id")).as("c"))
      val w = conv.join(tot, "v")
        .groupBy("event_type")
        .agg(max(when(col("v") === "A", col("c"))).as("ca"),
          max(when(col("v") === "B", col("c"))).as("cb"),
          max(when(col("v") === "A", col("n"))).as("na"),
          max(when(col("v") === "B", col("n"))).as("nb"))
      val pa = col("ca").cast("double") / col("na")
      val pb = col("cb").cast("double") / col("nb")
      val p = (col("ca") + col("cb")).cast("double") / (col("na") + col("nb"))
      val se = sqrt(p * (lit(1) - p) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb")))
      // degenerate experiment (everyone or no one converts): se = 0 —
      // z is undefined, not infinite; flag stays 0 on both sides
      val z = when(p > 0 && p < 1, (pa - pb) / se)
      w.select(col("event_type"),
          Qutil.dround(z, 6).as("z_score"),
          Qutil.dround(pa, 6).as("rate_a"),
          Qutil.dround(pb, 6).as("rate_b"),
          when(abs(z) > 1.96, 1).otherwise(0).as("significant"))
        .orderBy("event_type")
    },

    // Exponentially time-decayed engagement score (7-day half-life,
    // anchored at the corpus max day — recency-weighted user value, the
    // feature-store staple). λ is a fixed literal so the exp() argument is
    // bit-identical in both engines; each term is grid-quantized at 4dp
    // BEFORE the decimal sum (the q134 6dp-ln precedent: libm exp may
    // differ in the last ulp, the grid absorbs it, the decimal sum makes
    // order irrelevant). One aggregate on the user grain after a map-only
    // projection.
    Q.sql("q156_decayed_engagement",
      """WITH b AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
        |t AS (
        |  SELECT user_id,
        |         floor(value * exp(-0.099021
        |                           * (b.mx - CAST(ts AS DATE)))
        |               * 10000 + 0.5) / 10000 AS term
        |  FROM events CROSS JOIN b)
        |SELECT user_id, count(*) AS n_events,
        |       CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS engagement
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val mx = ev.agg(max("day").as("mx"))
      ev.crossJoin(broadcast(mx))
        .withColumn("term", Qutil.dround(
          col("value") * exp(lit(-0.099021) * datediff(col("mx"), col("day"))),
          4))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("term").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .cast("double").as("engagement"))
        .orderBy("user_id")
    },

    // Clamped running balance (ops.Recurrence): bal_i = max(0, bal_{i-1} +
    // delta_i) — a NON-ASSOCIATIVE recurrence no window frame or prefix
    // sum can express, folded sequentially per key after one repartition +
    // in-partition sort (the documented mapPartitions last-resort tier,
    // with the honest per-key-parallelism contract). Integer cents end to
    // end; the oracle replays the recurrence as a recursive CTE stepping
    // rn → rn+1 — a hash match proves every intermediate clamp decision.
    Q.sql("q160_clamped_balance",
      """WITH RECURSIVE seq AS (
        |  SELECT user_id,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) - 10000 AS delta,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |cnt AS (SELECT user_id, count(*) AS n FROM seq GROUP BY 1),
        |r AS (
        |  SELECT user_id, rn,
        |         GREATEST(CAST(0 AS BIGINT), delta) AS bal,
        |         GREATEST(CAST(0 AS BIGINT), delta) AS peak,
        |         CASE WHEN delta < 0 THEN CAST(1 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS resets
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |         GREATEST(CAST(0 AS BIGINT), r.bal + s.delta),
        |         GREATEST(r.peak, GREATEST(CAST(0 AS BIGINT), r.bal + s.delta)),
        |         r.resets + CASE WHEN r.bal + s.delta < 0 THEN 1 ELSE 0 END
        |  FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT r.user_id, r.bal AS final_balance, r.peak AS peak_balance,
        |       r.resets AS n_resets
        |FROM r JOIN cnt c ON c.user_id = r.user_id AND r.rn = c.n
        |ORDER BY r.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"),
        (floor(col("value") * 100 + 0.5).cast("long") - 10000L).as("delta"))
      graft.ops.Recurrence
        .clampedBalanceReport(ev, "user_id", "us", "event_id", "delta")
        .orderBy("user_id")
    },

    // Session entry-point / bounce report (ops.Sessions.bounceReport):
    // 30-min gap sessionization (q53's recurrence), entry event by the
    // deterministic (us, id) struct-min — one gap window, no second
    // window pass — rolled up per entry type with the bounce rate.
    Q.sql("q162_bounce_report",
      s"""WITH t AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |f AS (
         |  SELECT user_id, event_id, event_type, us,
         |         CASE WHEN us - lag(us) OVER w > ${GapSeconds * 1000000L}
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (
         |  SELECT user_id, event_id, event_type, us,
         |         sum(new_session) OVER (PARTITION BY user_id
         |                                ORDER BY us, event_id
         |                                ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM f),
         |s2 AS (
         |  SELECT user_id, sid, event_type,
         |         row_number() OVER (PARTITION BY user_id, sid
         |                            ORDER BY us, event_id) AS rn
         |  FROM s),
         |entry AS (SELECT user_id, sid, event_type AS entry_type
         |          FROM s2 WHERE rn = 1),
         |cnt AS (SELECT user_id, sid, count(*) AS n_events
         |        FROM s GROUP BY 1, 2),
         |sess AS (
         |  SELECT c.user_id, c.sid, e.entry_type, c.n_events
         |  FROM cnt c JOIN entry e USING (user_id, sid))
         |SELECT entry_type, count(*) AS n_sessions,
         |       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_bounces,
         |       floor(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
         |         AS bounce_rate
         |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.ops.Sessions.bounceReport(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type", GapSeconds)
        .orderBy("entry_type")
    },

    // Windowed funnel (Sessions.windowedFunnel): each step must land
    // within 24h of reaching the previous one — the conversion-deadline
    // variant of q57 (whose unbounded form over-counts stale
    // conversions). Same min-aggregate recurrence; the oracle adds the
    // identical upper bound per step.
    Q.sql("q170_windowed_funnel", {
      val w = 24L * 3600 * 1000000
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |s1 AS (SELECT user_id, min(us) AS t FROM e
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.us) AS t
         |       FROM e JOIN s1 ON s1.user_id = e.user_id
         |       WHERE e.event_type = 'click' AND e.us > s1.t
         |         AND e.us <= s1.t + $w GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.us) AS t
         |       FROM e JOIN s2 ON s2.user_id = e.user_id
         |       WHERE e.event_type = 'purchase' AND e.us > s2.t
         |         AND e.us <= s2.t + $w GROUP BY 1)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
         |         count(*) AS n_users FROM s1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3)
         |ORDER BY step_idx""".stripMargin
    }) { (s, d) =>
      graft.ops.Sessions.windowedFunnel(Tables.events(s, d), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"),
          windowUs = 24L * 3600 * 1000000)
        .orderBy("step_idx")
    },

    // Time-to-convert distribution: among q170's full converters, seconds
    // from first view to the (deadline-respecting) purchase — exact
    // linear-interpolated percentiles at 6dp (the q55 discipline). The
    // funnel recurrence reuses the user-key exchange end to end.
    Q.sql("q171_time_to_convert", {
      val w = 24L * 3600 * 1000000
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |s1 AS (SELECT user_id, min(us) AS t FROM e
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.us) AS t
         |       FROM e JOIN s1 ON s1.user_id = e.user_id
         |       WHERE e.event_type = 'click' AND e.us > s1.t
         |         AND e.us <= s1.t + $w GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.us) AS t
         |       FROM e JOIN s2 ON s2.user_id = e.user_id
         |       WHERE e.event_type = 'purchase' AND e.us > s2.t
         |         AND e.us <= s2.t + $w GROUP BY 1),
         |conv AS (
         |  SELECT (s3.t - s1.t) / 1000000.0 AS ttc_s
         |  FROM s3 JOIN s1 ON s1.user_id = s3.user_id)
         |SELECT count(*) AS n_converters,
         |       floor(quantile_cont(ttc_s, 0.5) * 1000000 + 0.5) / 1000000
         |         AS p50_s,
         |       floor(quantile_cont(ttc_s, 0.9) * 1000000 + 0.5) / 1000000
         |         AS p90_s
         |FROM conv""".stripMargin
    }) { (s, d) =>
      val w = 24L * 3600 * 1000000L
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      def first(t: String) = ev.where(col("event_type") === t)
        .groupBy("user_id").agg(min("us").as("t"))
      def bounded(prev: org.apache.spark.sql.DataFrame, t: String) =
        ev.where(col("event_type") === t)
          .join(prev.select(col("user_id"), col("t").as("tprev")), "user_id")
          .where(col("us") > col("tprev") && col("us") <= col("tprev") + w)
          .groupBy("user_id").agg(min("us").as("t"))
      val s1 = first("view")
      val s3 = bounded(bounded(s1, "click"), "purchase")
      s3.join(s1.select(col("user_id"), col("t").as("t1")), "user_id")
        .select(((col("t") - col("t1")) / lit(1000000.0)).as("ttc_s"))
        .agg(count(lit(1)).as("n_converters"),
          Qutil.dround(expr("percentile(ttc_s, 0.5)"), 6).as("p50_s"),
          Qutil.dround(expr("percentile(ttc_s, 0.9)"), 6).as("p90_s"))
    },

    // Cohort LTV curve: cumulative revenue per signup-day cohort by
    // cohort age, normalized per user — the q54 retention matrix's
    // revenue sibling. Raw events compact to the (cohort, age) grid
    // FIRST (calendar² rows), so the prefix-sum window runs on the grid,
    // never the event stream; the running sum stays DECIMAL inside the
    // window, so the cumulative is exact at any order.
    Q.sql("q173_cohort_ltv",
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |         value
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
        |sz AS (SELECT cohort, count(*) AS n_users FROM c GROUP BY 1),
        |g AS (
        |  SELECT c.cohort, e.day - c.cohort AS age,
        |         CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort, age,
        |         CAST(SUM(CAST(rev AS DECIMAL(38,6)))
        |              OVER (PARTITION BY cohort ORDER BY age
        |                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
        |  FROM g)
        |SELECT m.cohort, m.age,
        |       CAST(s.n_users AS BIGINT) AS n_users,
        |       floor(m.cum_rev / s.n_users * 1000000 + 0.5) / 1000000
        |         AS ltv_per_user
        |FROM cum m JOIN sz s ON s.cohort = m.cohort
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val e = Tables.events(s, d).select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        col("value"))
      val c = e.groupBy("user_id").agg(min("day").as("cohort"))
      val sz = c.groupBy("cohort").agg(count(lit(1)).as("n_users"))
      val g = e.join(c, "user_id")
        .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
        .agg(Qutil.msum(col("value"), 4).as("rev"))
      val w = Window.partitionBy("cohort").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
      g.withColumn("cum_rev",
          sum(col("rev").cast(DecimalType(38, 6))).over(w).cast("double"))
        .join(sz, "cohort")
        .select(col("cohort"), col("age"), col("n_users"),
          Qutil.dround(col("cum_rev") / col("n_users"), 6).as("ltv_per_user"))
        .orderBy("cohort", "age")
    },

    // Per-key EWMA (ops.Recurrence.ewmaReport, α = 0.25): the linear
    // sequential recurrence — window-looking, but the closed-form prefix
    // factorization overflows ((1-α)^-n), so it folds like q160. The
    // recursive-CTE oracle steps the identical α·x + (1-α)·s expression,
    // so every intermediate double matches bitwise; only the final report
    // rounds (6dp).
    Q.sql("q174_ewma",
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |cnt AS (SELECT user_id, count(*) AS n FROM seq GROUP BY 1),
        |r AS (
        |  SELECT user_id, rn, value AS s FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT q.user_id, q.rn, 0.25 * q.value + 0.75 * r.s
        |  FROM r JOIN seq q ON q.user_id = r.user_id AND q.rn = r.rn + 1)
        |SELECT r.user_id, c.n,
        |       floor(r.s * 1000000 + 0.5) / 1000000 AS ewma
        |FROM r JOIN cnt c ON c.user_id = r.user_id AND r.rn = c.n
        |ORDER BY r.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("value"))
      graft.ops.Recurrence.ewmaReport(ev, "user_id", "us", "event_id",
          "value", alpha = 0.25)
        .select(col("user_id"), col("n"),
          Qutil.dround(col("ewma"), 6).as("ewma"))
        .orderBy("user_id")
    },

    // Per-key Holt linear smoothing (ops.Recurrence.holtReport,
    // α = 0.5, β = 0.25): level + trend — the two-state member of the
    // sequential-recurrence family (q160 non-linear, q174 linear
    // one-state, this one COUPLED two-state, which kills every window
    // factorization outright). The recursive-CTE oracle carries both
    // states and steps the identical expression shapes, so every
    // intermediate double matches bitwise; the forecast column is the
    // one-step-ahead level + trend.
    Q.sql("q188_holt_linear",
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |cnt AS (SELECT user_id, count(*) AS n FROM seq GROUP BY 1),
        |r AS (
        |  SELECT user_id, rn, value AS l, CAST(0 AS DOUBLE) AS b
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT q.user_id, q.rn,
        |         0.5 * q.value + 0.5 * (r.l + r.b),
        |         0.25 * ((0.5 * q.value + 0.5 * (r.l + r.b)) - r.l)
        |           + 0.75 * r.b
        |  FROM r JOIN seq q ON q.user_id = r.user_id AND q.rn = r.rn + 1)
        |SELECT r.user_id, c.n,
        |       floor(r.l * 1000000 + 0.5) / 1000000 AS level,
        |       floor(r.b * 1000000 + 0.5) / 1000000 AS trend,
        |       floor((r.l + r.b) * 1000000 + 0.5) / 1000000 AS forecast
        |FROM r JOIN cnt c ON c.user_id = r.user_id AND r.rn = c.n
        |ORDER BY r.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("value"))
      graft.ops.Recurrence.holtReport(ev, "user_id", "us", "event_id",
          "value", alpha = 0.5, beta = 0.25)
        .select(col("user_id"), col("n"),
          Qutil.dround(col("level"), 6).as("level"),
          Qutil.dround(col("trend"), 6).as("trend"),
          Qutil.dround(col("level") + col("trend"), 6).as("forecast"))
        .orderBy("user_id")
    },

    // CUPED-adjusted experiment readout (q149's variance-reduction
    // companion): per-user post-period revenue y adjusted by the
    // pre-period covariate x — adj = y − θ(x − x̄), θ the pooled OLS
    // slope from ONE moment aggregate (the q172 machinery) — the
    // standard trick that shrinks A/B variance without biasing the
    // difference (θ and x̄ are pooled across variants). Per-user sums
    // are decimal-exact; moment and adjusted terms live on 6dp grids,
    // so the oracle replays θ, x̄, and every adjusted value.
    Q.sql("q195_cuped_readout",
      """WITH u AS (
        |  SELECT user_id,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |         coalesce(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |                        THEN CAST(value AS DECIMAL(18,4)) END)
        |                  AS DOUBLE), 0) AS x,
        |         coalesce(CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |                        THEN CAST(value AS DECIMAL(18,4)) END)
        |                  AS DOUBLE), 0) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT count(*) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(floor(x * y * 1e6 + 0.5) / 1e6
        |                       AS DECIMAL(38,9))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(floor(x * x * 1e6 + 0.5) / 1e6
        |                       AS DECIMAL(38,9))) AS DOUBLE) AS sxx
        |  FROM u),
        |th AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
        |              sx / n AS xbar FROM m),
        |a AS (SELECT variant, y,
        |             floor((y - theta * (x - xbar)) * 1e6 + 0.5) / 1e6 AS adj
        |      FROM u CROSS JOIN th)
        |SELECT variant, count(*) AS n_users,
        |       floor(CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE)
        |             / count(*) * 1e6 + 0.5) / 1e6 AS raw_mean,
        |       floor(CAST(SUM(CAST(adj AS DECIMAL(38,9))) AS DOUBLE)
        |             / count(*) * 1e6 + 0.5) / 1e6 AS adj_mean
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val cut = lit("2024-01-16").cast("timestamp")
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(col("user_id") % 2 === 0, "A").otherwise("B").as("variant"))
        .agg(
          coalesce(sum(when(col("ts") < cut,
              col("value").cast(DecimalType(18, 4)))).cast("double"), lit(0.0))
            .as("x"),
          coalesce(sum(when(col("ts") >= cut,
              col("value").cast(DecimalType(18, 4)))).cast("double"), lit(0.0))
            .as("y"))
      def dsum(c: org.apache.spark.sql.Column, s9: Boolean = false) =
        sum(c.cast(if (s9) DecimalType(38, 9) else DecimalType(38, 6)))
          .cast("double")
      val m = u.agg(count(lit(1)).as("n"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(Qutil.dround(col("x") * col("y"), 6), s9 = true).as("sxy"),
        dsum(Qutil.dround(col("x") * col("x"), 6), s9 = true).as("sxx"))
      val th = m.select(
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("theta"),
        (col("sx") / col("n")).as("xbar"))
      u.crossJoin(broadcast(th))
        .select(col("variant"), col("y"),
          Qutil.dround(col("y") - col("theta") * (col("x") - col("xbar")), 6)
            .as("adj"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n_users"),
          Qutil.dround(dsum(col("y")) / count(lit(1)), 6).as("raw_mean"),
          Qutil.dround(dsum(col("adj"), s9 = true) / count(lit(1)), 6)
            .as("adj_mean"))
        .orderBy("variant")
    },

    // Nearest as-of join (ops.AsOf.joinAsOfNearest): the view CLOSEST to
    // each purchase, either direction, backward winning ties — pandas
    // merge_asof direction='nearest' (q35 is backward, this completes
    // the direction family; the attribution question is "which touch
    // was nearest the conversion", not "which preceded it"). Two
    // one-shuffle union-carry passes + a per-row pick; the oracle is
    // the INDEPENDENT correlated row_number formulation of both sides.
    Q.sql("q211_asof_nearest",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value
        |  FROM events),
        |p AS (SELECT user_id, event_id, us FROM e
        |      WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS vid, us AS vus, value AS vval
        |      FROM e WHERE event_type = 'view'),
        |b AS (SELECT * FROM (
        |        SELECT p.event_id AS pid, v.vid, v.vus, v.vval,
        |               row_number() OVER (PARTITION BY p.event_id
        |                                  ORDER BY v.vus DESC, v.vid DESC)
        |                 AS rn
        |        FROM p JOIN v ON v.user_id = p.user_id AND v.vus <= p.us)
        |      WHERE rn = 1),
        |f AS (SELECT * FROM (
        |        SELECT p.event_id AS pid, v.vid, v.vus, v.vval,
        |               row_number() OVER (PARTITION BY p.event_id
        |                                  ORDER BY v.vus ASC, v.vid ASC)
        |                 AS rn
        |        FROM p JOIN v ON v.user_id = p.user_id AND v.vus >= p.us)
        |      WHERE rn = 1)
        |SELECT p.user_id, p.event_id, p.us,
        |       CASE WHEN b.vus IS NULL
        |              OR (f.vus IS NOT NULL
        |                  AND (f.vus - p.us) < (p.us - b.vus))
        |            THEN f.vid ELSE b.vid END AS asof_event_id,
        |       CASE WHEN b.vus IS NULL
        |              OR (f.vus IS NOT NULL
        |                  AND (f.vus - p.us) < (p.us - b.vus))
        |            THEN f.vval ELSE b.vval END AS asof_value,
        |       CASE WHEN b.vus IS NULL AND f.vus IS NULL
        |              THEN CAST(NULL AS VARCHAR)
        |            WHEN b.vus IS NULL
        |              OR (f.vus IS NOT NULL
        |                  AND (f.vus - p.us) < (p.us - b.vus))
        |              THEN 'F' ELSE 'B' END AS asof_direction
        |FROM p
        |LEFT JOIN b ON b.pid = p.event_id
        |LEFT JOIN f ON f.pid = p.event_id
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("value"))
      val purchases = e.where(col("event_type") === "purchase")
        .select("user_id", "event_id", "us")
      val views = e.where(col("event_type") === "view")
        .select("user_id", "event_id", "us", "value")
      graft.ops.AsOf.joinAsOfNearest(purchases, views, "user_id",
          "us", "us", payloadCols = Seq("event_id", "value"),
          idCol = "event_id", tieBreak = Some("event_id"))
        .orderBy("event_id")
    },

    // Semi-structured props extraction: the events.props JSON column
    // parsed engine-side (get_json_object — codegen'd path evaluation,
    // no UDF) and profiled per event type — the S-family's JSON surface
    // applied at the row grain, where a 100 TB log's properties actually
    // live. Missing/unparseable keys are counted, not dropped; integer
    // stats stay exact and the mean rides the decimal rule.
    Q.sql("q210_json_props",
      """WITH p AS (
        |  SELECT event_type,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_missing,
        |       min(k) AS k_min, max(k) AS k_max,
        |       floor(CAST(SUM(k) AS DOUBLE) / count(k) * 1e6 + 0.5) / 1e6
        |         AS k_avg
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
          min("k").as("k_min"), max("k").as("k_max"),
          Qutil.dround(sum("k").cast("double") / count(col("k")), 6)
            .as("k_avg"))
        .orderBy("event_type")
    },

    // Duration-capped sessionization (ops.Recurrence.cappedSessions):
    // q53's gap rule PLUS "no session may exceed the cap" — the rule
    // that makes sessionization a true sequential recurrence (each split
    // depends on the running session start, which depends on every
    // earlier split; no window formulation exists — the q160 tier).
    // Gap 1 day, cap 2 days; gap and cap splits counted separately (gap
    // wins ties). Integer microseconds throughout; the recursive-CTE
    // oracle steps (start, last, counters) bit-exact.
    Q.sql("q207_capped_sessions", {
      val gap = 86400000000L
      val cap = 172800000000L
      s"""WITH RECURSIVE seq AS (
         |  SELECT user_id, epoch_us(ts) AS us,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY epoch_us(ts), event_id) AS rn
         |  FROM events),
         |cnt AS (SELECT user_id, count(*) AS n FROM seq GROUP BY 1),
         |r AS (
         |  SELECT user_id, rn, us AS start, us AS last,
         |         CAST(1 AS BIGINT) AS sessions,
         |         CAST(0 AS BIGINT) AS gaps, CAST(0 AS BIGINT) AS caps
         |  FROM seq WHERE rn = 1
         |  UNION ALL
         |  SELECT q.user_id, q.rn,
         |         CASE WHEN q.us - r.last > $gap OR q.us - r.start > $cap
         |              THEN q.us ELSE r.start END,
         |         q.us,
         |         r.sessions + CASE WHEN q.us - r.last > $gap
         |                             OR q.us - r.start > $cap
         |                           THEN 1 ELSE 0 END,
         |         r.gaps + CASE WHEN q.us - r.last > $gap
         |                       THEN 1 ELSE 0 END,
         |         r.caps + CASE WHEN q.us - r.last <= $gap
         |                        AND q.us - r.start > $cap
         |                       THEN 1 ELSE 0 END
         |  FROM r JOIN seq q ON q.user_id = r.user_id AND q.rn = r.rn + 1)
         |SELECT r.user_id, sessions AS n_sessions,
         |       gaps AS n_gap_splits, caps AS n_cap_splits
         |FROM r JOIN cnt c ON c.user_id = r.user_id AND r.rn = c.n
         |ORDER BY r.user_id""".stripMargin
    }) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"))
      graft.ops.Recurrence.cappedSessions(ev, "user_id", "us", "event_id",
          gapUs = 86400000000L, capUs = 172800000000L)
        .orderBy("user_id")
    },

    // Behavioral anomaly scoring via Markov negative log-likelihood:
    // train q133's transition matrix on the FIRST half (Laplace-smoothed
    // over the full type×type grid so unseen transitions stay finite),
    // score every user's SECOND-half transition sequence by mean NLL —
    // users whose navigation contradicts the population model float to
    // the top (bot/fraud/instrumentation triage; the event-stream
    // sibling of q114's text perplexity). The model is a type²-cell
    // broadcast; scoring is one windowed pair pass + a user-grain
    // aggregate with 6dp ln-grid terms decimal-summed.
    Q.sql("q205_markov_anomaly",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
        |         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 2 END
        |           AS half
        |  FROM events),
        |types AS (SELECT DISTINCT event_type AS t FROM e),
        |nt AS (SELECT count(*) AS nt FROM types),
        |trp AS (
        |  SELECT user_id, half, event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id, half
        |                                ORDER BY us, event_id) AS to_type
        |  FROM e),
        |tr1 AS (SELECT from_type, to_type, count(*) AS n FROM trp
        |        WHERE half = 1 AND to_type IS NOT NULL GROUP BY 1, 2),
        |grid AS (
        |  SELECT a.t AS from_type, b.t AS to_type,
        |         coalesce(tr1.n, 0) AS n
        |  FROM types a CROSS JOIN types b
        |  LEFT JOIN tr1 ON tr1.from_type = a.t AND tr1.to_type = b.t),
        |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
        |        FROM grid GROUP BY 1),
        |model AS (
        |  SELECT g.from_type, g.to_type,
        |         floor(ln(CAST(g.n + 1 AS DOUBLE)
        |                  / (tot.tot + (SELECT nt FROM nt)))
        |               * 1e6 + 0.5) / 1e6 AS lnp
        |  FROM grid g JOIN tot ON tot.from_type = g.from_type),
        |ev AS (SELECT user_id, from_type, to_type FROM trp
        |       WHERE half = 2 AND to_type IS NOT NULL)
        |SELECT ev.user_id, count(*) AS n_trans,
        |       floor(-CAST(SUM(CAST(m.lnp AS DECIMAL(38,9))) AS DOUBLE)
        |             / count(*) * 1e6 + 0.5) / 1e6 AS nll
        |FROM ev JOIN model m
        |  ON m.from_type = ev.from_type AND m.to_type = ev.to_type
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val cut = lit("2024-01-16").cast("timestamp")
      val e = Tables.events(s, d).select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"),
        when(col("ts") < cut, 1).otherwise(2).as("half"))
      val types = e.select(col("event_type").as("t")).distinct()
      val ntv = types.agg(count(lit(1)).as("nt"))
      val w = Window.partitionBy("user_id", "half").orderBy("us", "event_id")
      val trp = e.withColumn("to_type", lead("event_type", 1).over(w))
        .where(col("to_type").isNotNull)
        .select(col("user_id"), col("half"),
          col("event_type").as("from_type"), col("to_type"))
      val tr1 = trp.where(col("half") === 1)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val grid = types.select(col("t").as("from_type"))
        .crossJoin(types.select(col("t").as("to_type")))
        .join(tr1, Seq("from_type", "to_type"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val tot = grid.groupBy("from_type").agg(sum("n").as("tot"))
      val model = grid.join(tot, "from_type").crossJoin(broadcast(ntv))
        .select(col("from_type"), col("to_type"),
          Qutil.dround(log((col("n") + 1).cast("double") /
            (col("tot") + col("nt"))), 6).as("lnp"))
      trp.where(col("half") === 2)
        .join(broadcast(model), Seq("from_type", "to_type"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_trans"),
          Qutil.dround(-sum(col("lnp").cast(DecimalType(38, 9)))
            .cast("double") / count(lit(1)), 6).as("nll"))
        .orderBy("user_id")
    },

    // Kaplan–Meier survival curve over user lifetimes — the censoring-
    // aware member of the retention family (q54's cohort matrix counts
    // survivors; KM estimates the survival FUNCTION when the observation
    // window right-censors active users: a user last seen on the final
    // day hasn't churned, and treating them as churned biases retention
    // down). Lifetime = last−first active day; death = lifetime ending
    // before the window edge. Everything reduces to the ≤31-row duration
    // grain: at-risk counts are a reversed cumulative sum, the product
    // ∏(1 − dᵢ/nᵢ) becomes a decimal-summed 6dp ln-grid prefix (the
    // q177 ln discipline) with survival re-exposed through exp (the q94
    // exp-then-round rule). log_survival is the fully-exact column;
    // survival is its 6dp rendering.
    Q.sql("q204_kaplan_meier",
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS f,
        |         CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS l
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(l) AS wend FROM u),
        |lt AS (SELECT user_id, l - f AS dur,
        |              CASE WHEN l < (SELECT wend FROM mx) THEN 1 ELSE 0 END
        |                AS death
        |       FROM u),
        |g AS (SELECT dur, CAST(count(*) AS BIGINT) AS total,
        |             CAST(SUM(death) AS BIGINT) AS deaths
        |      FROM lt GROUP BY 1),
        |r AS (SELECT dur, deaths,
        |             CAST(SUM(total) OVER (ORDER BY dur DESC
        |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |      FROM g),
        |t AS (SELECT dur, deaths, n_risk,
        |             floor(ln(1 - CAST(deaths AS DOUBLE) / n_risk)
        |                   * 1e6 + 0.5) / 1e6 AS lnterm
        |      FROM r WHERE deaths > 0),
        |c AS (SELECT dur, deaths, n_risk,
        |             CAST(SUM(CAST(lnterm AS DECIMAL(38,9)))
        |                  OVER (ORDER BY dur ASC ROWS UNBOUNDED PRECEDING)
        |                  AS DOUBLE) AS log_surv
        |      FROM t)
        |SELECT dur AS duration, n_risk AS n_at_risk, deaths AS n_deaths,
        |       floor(log_surv * 1e6 + 0.5) / 1e6 AS log_survival,
        |       floor(exp(log_surv) * 1e6 + 0.5) / 1e6 AS survival
        |FROM c ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val day = (unix_micros(col("ts").cast("timestamp")) /
        lit(86400000000L)).cast("long")
      val u = Tables.events(s, d).groupBy("user_id")
        .agg(min(day).as("f"), max(day).as("l"))
      val wend = u.agg(max("l").as("wend"))
      val lt = u.crossJoin(broadcast(wend))
        .select((col("l") - col("f")).as("dur"),
          when(col("l") < col("wend"), 1L).otherwise(0L).as("death"))
      val g = lt.groupBy("dur")
        .agg(count(lit(1)).as("total"), sum("death").as("deaths"))
      val wDesc = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAsc = Window.orderBy(col("dur").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      g.withColumn("n_risk", sum("total").over(wDesc))
        .where(col("deaths") > 0)
        .withColumn("lnterm",
          Qutil.dround(log(lit(1.0) -
            col("deaths").cast("double") / col("n_risk")), 6))
        .withColumn("log_surv",
          sum(col("lnterm").cast(DecimalType(38, 9))).over(wAsc)
            .cast("double"))
        .select(col("dur").as("duration"), col("n_risk").as("n_at_risk"),
          col("deaths").as("n_deaths"),
          Qutil.dround(col("log_surv"), 6).as("log_survival"),
          Qutil.dround(exp(col("log_surv")), 6).as("survival"))
        .orderBy("duration")
    },

    // Two-sample Kolmogorov–Smirnov drift test per event type — q177's
    // PSI flags bucket-mass drift; KS is the classical distribution-free
    // test with a known critical value. Values land on a cent grid (the
    // production variant: ECDFs over a BOUNDED bucket grain, not the raw
    // value grain, so the windows sort thousands of buckets, never rows);
    // D = max |ECDF₁ − ECDF₂| at the bucket jumps, exact integer
    // cumulative counts. Significance at α=0.05: D > 1.358·√((n1+n2)/(n1·n2)).
    Q.sql("q201_ks_drift",
      """WITH b AS (
        |  SELECT event_type,
        |         CAST(floor(value * 100) AS BIGINT) AS bucket,
        |         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 2 END
        |           AS half
        |  FROM events),
        |g AS (
        |  SELECT event_type, bucket,
        |         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS c1,
        |         CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS c2
        |  FROM b GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n1,
        |             CAST(SUM(c2) AS BIGINT) AS n2
        |      FROM g GROUP BY 1),
        |c AS (
        |  SELECT g.event_type,
        |         CAST(SUM(c1) OVER (PARTITION BY g.event_type ORDER BY bucket
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS cum1,
        |         CAST(SUM(c2) OVER (PARTITION BY g.event_type ORDER BY bucket
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS cum2
        |  FROM g),
        |d AS (
        |  SELECT c.event_type,
        |         max(abs(CAST(cum1 AS DOUBLE) / n.n1
        |                 - CAST(cum2 AS DOUBLE) / n.n2)) AS ks
        |  FROM c JOIN n ON n.event_type = c.event_type
        |  GROUP BY 1)
        |SELECT d.event_type, n.n1, n.n2,
        |       floor(d.ks * 1e6 + 0.5) / 1e6 AS ks_d,
        |       CAST(CASE WHEN d.ks > 1.358 * sqrt((n.n1 + n.n2)
        |                      / (CAST(n.n1 AS DOUBLE) * n.n2))
        |                 THEN 1 ELSE 0 END AS INTEGER) AS significant
        |FROM d JOIN n ON n.event_type = d.event_type
        |ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cut = lit("2024-01-16").cast("timestamp")
      val g = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("bucket"),
          when(col("ts") < cut, 1).otherwise(2).as("half"))
        .groupBy("event_type", "bucket")
        .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"),
          sum(when(col("half") === 2, 1L).otherwise(0L)).as("c2"))
      val n = g.groupBy("event_type")
        .agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      val ks = g
        .withColumn("cum1", sum("c1").over(w))
        .withColumn("cum2", sum("c2").over(w))
        .join(n, "event_type")
        .groupBy("event_type")
        .agg(max(abs(col("cum1").cast("double") / col("n1") -
          col("cum2").cast("double") / col("n2"))).as("ks"))
      ks.join(n, "event_type")
        .select(col("event_type"), col("n1"), col("n2"),
          Qutil.dround(col("ks"), 6).as("ks_d"),
          when(col("ks") > lit(1.358) *
              sqrt((col("n1") + col("n2")) /
                (col("n1").cast("double") * col("n2"))), 1)
            .otherwise(0).as("significant"))
        .orderBy("event_type")
    },

    // Sequence-conformance audit: purchases with NO prior view by the
    // same user — the event-ordering business rule every funnel assumes,
    // checked explicitly (instrumentation bugs and bot traffic both
    // surface here). One prefix-window flag (seen-a-view-before-me,
    // (us, event_id) order) + one user-grain aggregate; violations
    // pin the lowest offending event id so the report is actionable.
    Q.sql("q189_sequence_conformance",
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, event_type,
        |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING) AS seen_view
        |  FROM t)
        |SELECT user_id, count(*) AS n_purchases,
        |       CAST(SUM(CASE WHEN coalesce(seen_view, 0) = 0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |       min(CASE WHEN coalesce(seen_view, 0) = 0
        |                THEN event_id END) AS first_violation_id
        |FROM f WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val f = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("seen_view",
          max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
      val violated = coalesce(col("seen_view"), lit(0)) === 0
      f.where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(violated, 1L).otherwise(0L)).as("n_violations"),
          min(when(violated, col("event_id"))).as("first_violation_id"))
        .orderBy("user_id")
    },

    // Session path matrix (Sessions.sessionPaths): (entry, exit) event
    // types per session — the navigation-flow report. Entry and exit come
    // from struct-min/struct-max in ONE session-grain aggregate (the q162
    // no-second-sort rule); single-event sessions land on the diagonal.
    Q.sql("q175_session_paths",
      s"""WITH t AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |f AS (
         |  SELECT user_id, event_id, event_type, us,
         |         CASE WHEN us - lag(us) OVER w > ${GapSeconds * 1000000L}
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (
         |  SELECT user_id, event_id, event_type, us,
         |         sum(new_session) OVER (PARTITION BY user_id
         |                                ORDER BY us, event_id
         |                                ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM f),
         |s2 AS (
         |  SELECT user_id, sid, event_type,
         |         row_number() OVER (PARTITION BY user_id, sid
         |                            ORDER BY us, event_id) AS rna,
         |         row_number() OVER (PARTITION BY user_id, sid
         |                            ORDER BY us DESC, event_id DESC) AS rnz
         |  FROM s),
         |sess AS (
         |  SELECT a.user_id, a.sid, a.event_type AS entry_type,
         |         z.event_type AS exit_type
         |  FROM (SELECT * FROM s2 WHERE rna = 1) a
         |  JOIN (SELECT * FROM s2 WHERE rnz = 1) z
         |    ON z.user_id = a.user_id AND z.sid = a.sid)
         |SELECT entry_type, exit_type, count(*) AS n_sessions
         |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      graft.ops.Sessions.sessionPaths(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type", GapSeconds)
        .orderBy("entry_type", "exit_type")
    },

    // Peak concurrent sessions per day (Sessions.peakConcurrency): the
    // capacity-planning sweep line over q53's session grain — sessions
    // clip to the days they touch, boundaries (+1/−1) prefix-sum inside a
    // DAY-partitioned window, and the per-day max is the peak. Closed
    // intervals (end+1µs), ends-before-starts at equal instants, total
    // (us, delta, user, idx) order — all replayed by the oracle.
    Q.sql("q179_peak_concurrency",
      s"""WITH t AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         |f AS (
         |  SELECT user_id, event_id, us,
         |         CASE WHEN us - lag(us) OVER w > ${GapSeconds * 1000000L}
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (
         |  SELECT user_id, us,
         |         sum(new_session) OVER (PARTITION BY user_id
         |                                ORDER BY us, event_id
         |                                ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM f),
         |sess AS (SELECT user_id, sid, min(us) AS st, max(us) + 1 AS en
         |         FROM s GROUP BY 1, 2),
         |clip AS (
         |  SELECT user_id, sid, day,
         |         GREATEST(st, day * 86400000000) AS lo,
         |         LEAST(en, (day + 1) * 86400000000) AS hi
         |  FROM (SELECT user_id, sid, st, en,
         |               unnest(generate_series(
         |                 CAST(floor(st / 86400000000) AS BIGINT),
         |                 CAST(floor((en - 1) / 86400000000) AS BIGINT)))
         |                 AS day
         |        FROM sess)),
         |b AS (
         |  SELECT day, lo AS us, CAST(1 AS BIGINT) AS delta, user_id, sid
         |  FROM clip
         |  UNION ALL
         |  SELECT day, hi, CAST(-1 AS BIGINT), user_id, sid FROM clip),
         |c AS (
         |  SELECT day,
         |         sum(delta) OVER (PARTITION BY day
         |                          ORDER BY us, delta, user_id, sid
         |                          ROWS UNBOUNDED PRECEDING) AS conc
         |  FROM b)
         |SELECT day, CAST(count(*) // 2 AS BIGINT) AS n_sessions,
         |       CAST(max(conc) AS BIGINT) AS peak_concurrency
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sessions = graft.ops.Sessions.sessionize(Tables.events(s, d),
        "user_id", "ts", "event_id", "value", GapSeconds)
      graft.ops.Sessions.peakConcurrency(sessions,
          "user_id", "session_idx", "start_us", "end_us")
        .orderBy("day")
    })
}
