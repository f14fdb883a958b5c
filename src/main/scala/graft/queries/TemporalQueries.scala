package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.AsOf

/** Temporal operators Spark lacks as built-ins, composed declaratively
  * (ops.AsOf) and verified against DuckDB's native ASOF / inequality joins.
  */
object TemporalQueries {

  val all: Seq[Q] = Seq(

    // As-of join: each event attached to the user's latest order at or
    // before the event time. DuckDB runs its native ASOF JOIN; the engine
    // runs the union+window composition — results must agree exactly.
    Q.sql("q35_asof_join",
      """SELECT e.event_id,
        |       CAST(epoch(o.o_orderdate) AS BIGINT) AS asof_epoch
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val orders = Tables.orders(s, d)
        .withColumnRenamed("o_custkey", "user_id")
        .select("user_id", "o_orderdate")
      AsOf.joinAsOf(events, orders, "user_id", "ts", "o_orderdate",
          payloadCols = Seq("o_orderdate"))
        .select(col("event_id"),
          col("asof_o_orderdate").cast("timestamp").cast("long").as("asof_epoch"))
        .orderBy("event_id")
    },

    // Range (band) join: orders bucketed into price bands via the
    // banded equi-join (no broadcast-nested-loop), oracled by a plain
    // inequality join.
    Q.sql("q36_range_join",
      """SELECT band_name, count(*) AS n,
        |       cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS total
        |FROM orders
        |JOIN (VALUES ('low', 0.0, 150000.0),
        |             ('mid', 150000.0, 300000.0),
        |             ('high', 300000.0, 100000000.0)) b(band_name, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = Seq(("low", 0.0, 150000.0), ("mid", 150000.0, 300000.0),
        ("high", 300000.0, 100000000.0)).toDF("band_name", "lo", "hi")
      AsOf.rangeJoin(Tables.orders(s, d), "o_totalprice", bands, "lo", "hi",
          bandWidth = 150000.0)
        .groupBy("band_name")
        .agg(count(lit(1)).as("n"), Qutil.msum(col("o_totalprice")).as("total"))
        .orderBy("band_name")
    },

    // Daily-grid gap fill + forward fill (Sessions.gapFillForward — the
    // distributed pandas resample('D').last().ffill()): per user, the last
    // event value each day under the exact (micros, event_id) order, a
    // sequence-exploded grid over the user's own active span, and missing
    // days carrying the previous value via last(ignoreNulls). The oracle
    // replays grid, last-per-day, and carry with generate_series +
    // IGNORE NULLS, so a hash match proves all three; n_filled pins
    // exactly which grid days were synthesized.
    Q.sql("q125_gap_fill_forward",
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |         epoch_us(ts) AS us, event_id, value
        |  FROM events),
        |obs AS (
        |  SELECT user_id, day, value AS obs FROM (
        |    SELECT user_id, day, value,
        |           row_number() OVER (PARTITION BY user_id, day
        |                              ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |span AS (SELECT user_id, min(day) AS mn, max(day) AS mx
        |         FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS day
        |         FROM span),
        |j AS (SELECT g.user_id, g.day, o.obs
        |      FROM grid g LEFT JOIN obs o
        |        ON o.user_id = g.user_id AND o.day = g.day),
        |f AS (SELECT user_id, day, obs,
        |             last_value(obs IGNORE NULLS)
        |               OVER (PARTITION BY user_id ORDER BY day
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS carried
        |      FROM j)
        |SELECT user_id, count(*) AS n_days,
        |       CAST(SUM(CASE WHEN obs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_filled,
        |       CAST(SUM(CAST(carried AS DECIMAL(18,4))) AS DOUBLE)
        |         AS carried_sum
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.ops.Sessions.gapFillForward(Tables.events(s, d),
          "user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("is_filled"), 1L).otherwise(0L)).as("n_filled"),
          Qutil.msum(col("carried"), 4).as("carried_sum"))
        .orderBy("user_id")
    },

    // Rolling-window anomaly detection (Sessions.rollingAnomalies): each
    // event judged against the mean ± 3σ of its user's PREVIOUS 20 events
    // (current row excluded; <10 predecessors = warm-up, not evaluated).
    // Exact decimal Σx/Σx² in the frame; the oracle replays the identical
    // moment arithmetic (association order and all), so the strict->
    // threshold decisions are engine-exact. The streaming sibling of the
    // batch z-score (q05): state is an O(n) ring buffer per key.
    Q.sql("q132_rolling_anomaly",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events),
        |w AS (
        |  SELECT user_id, value,
        |         CAST(SUM(CAST(value AS DECIMAL(28,8))) OVER win AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(value * value AS DECIMAL(28,8))) OVER win AS DOUBLE) AS s2,
        |         COUNT(*) OVER win AS n_prev
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |a AS (
        |  SELECT user_id, n_prev,
        |         CASE WHEN n_prev >= 10 THEN
        |           abs(value - s1 / n_prev) >
        |             CAST(3 AS DOUBLE) *
        |             sqrt(greatest((s2 - n_prev * (s1 / n_prev) * (s1 / n_prev))
        |                             / (n_prev - 1),
        |                           CAST(0 AS DOUBLE)))
        |         END AS anomaly
        |  FROM w)
        |SELECT user_id, count(*) AS n_events,
        |       CAST(SUM(CASE WHEN n_prev >= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_evaluated,
        |       CAST(SUM(CASE WHEN anomaly THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_anomalies
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.ops.Sessions.rollingAnomalies(Tables.events(s, d),
          "user_id", "ts", "event_id", "value", n = 20, k = 3.0, minObs = 10)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("n_prev") >= 10, 1L).otherwise(0L)).as("n_evaluated"),
          sum(when(col("anomaly") === true, 1L).otherwise(0L)).as("n_anomalies"))
        .orderBy("user_id")
    },

    // Point-in-time SCD2 lookup: each event joins the dimension VERSION
    // that was valid at the event's time (every 7th customer re-segments
    // to VIP mid-stream, so events straddle the change) — the
    // time-travel-correct enrichment that prevents training-data leakage
    // from future attributes. Spark-first: SCD2 intervals are contiguous
    // per key, so "the version valid at t" ≡ as-of join on valid_from
    // (ops.AsOf.joinAsOf — ONE key-partitioned window, no range join, no
    // BroadcastNestedLoop). The oracle states the INTERVAL semantics
    // (vf ≤ day < vt) directly — a hash match proves the as-of
    // composition implements them exactly.
    Q.sql("q141_pit_lookup",
      """WITH c AS (SELECT c_custkey AS user_id, c_mktsegment AS seg
        |           FROM customer),
        |v AS (SELECT user_id, seg, DATE '1995-01-01' AS vf,
        |             CASE WHEN user_id % 7 = 0 THEN DATE '2024-01-15' END AS vt
        |      FROM c
        |      UNION ALL
        |      SELECT user_id, 'VIP', DATE '2024-01-15', NULL
        |      FROM c WHERE user_id % 7 = 0),
        |e AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events),
        |j AS (SELECT e.value, v.seg FROM e JOIN v ON v.user_id = e.user_id
        |      AND e.day >= v.vf AND (v.vt IS NULL OR e.day < v.vt))
        |SELECT seg AS segment, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
      val versions = cust
        .withColumn("vf", lit("1995-01-01").cast("date"))
        .unionByName(cust.where(col("user_id") % 7 === 0)
          .withColumn("seg", lit("VIP"))
          .withColumn("vf", lit("2024-01-15").cast("date")))
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      graft.ops.AsOf.joinAsOf(ev, versions, "user_id", "day", "vf",
          payloadCols = Seq("seg"))
        .groupBy(col("asof_seg").as("segment"))
        .agg(count(lit(1)).as("n_events"),
          Qutil.msum(col("value"), 4).as("total_value"))
        .orderBy("segment")
    },

    // Rolling 7-day distinct active users per day — the DAU/WAU panel.
    // Sliding DISTINCT windows can't use frame aggregation (distinct
    // state isn't subtractable), so the scalable form compacts to the
    // (day, user) grain FIRST, then each observation claims the ≤7 target
    // days it supports (sequence explode — map-only ×7 on the compacted
    // grain, never on raw events) and one count(distinct) per target day
    // finishes it. Integer day arithmetic end to end.
    Q.sql("q143_rolling_active_users",
      """WITH d AS (
        |  SELECT DISTINCT CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |         user_id
        |  FROM events),
        |b AS (SELECT max(day) AS mx FROM d),
        |x AS (SELECT day + i AS day, user_id
        |      FROM d CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i)),
        |f AS (SELECT x.day, x.user_id FROM x CROSS JOIN b WHERE x.day <= b.mx)
        |SELECT day, count(DISTINCT user_id) AS active_7d
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val days = Tables.events(s, d)
        .select(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .as("day"),
          col("user_id"))
        .distinct()
      val mx = days.agg(max("day").as("mx"))
      days
        .withColumn("i", explode(expr("sequence(0, 6)")))
        .withColumn("day", (col("day") + col("i")).cast("long"))
        .crossJoin(broadcast(mx))
        .where(col("day") <= col("mx"))
        .groupBy("day")
        .agg(count_distinct(col("user_id")).as("active_7d"))
        .orderBy("day")
    },

    // Semi-additive period-end rollup: a balance-like measure sums across
    // ACCOUNTS but not across TIME — each (user, day) contributes its
    // LAST observation (by event time, id tie-break), then days sum
    // across users. The BI staple plain SUM gets silently wrong. One
    // (user, day)-keyed argmax window + a day-grain decimal aggregate.
    Q.sql("q166_period_end_balance",
      """WITH e AS (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, value,
        |         epoch_us(ts) AS us, event_id
        |  FROM events),
        |last AS (
        |  SELECT user_id, day, value FROM (
        |    SELECT user_id, day, value,
        |           row_number() OVER (PARTITION BY user_id, day
        |                              ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1)
        |SELECT day, count(*) AS n_accounts,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |         AS eod_total
        |FROM last GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"))
      graft.ops.Windows.keepBest(e, Seq("user_id", "day"),
          Seq(col("us").desc, col("event_id").desc))
        .groupBy("day")
        .agg(count(lit(1)).as("n_accounts"),
          Qutil.msum(col("value"), 4).as("eod_total"))
        .orderBy("day")
    })
}
