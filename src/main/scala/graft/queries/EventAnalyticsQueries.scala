package graft.queries

import org.apache.spark.sql.functions._
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
    })
}
