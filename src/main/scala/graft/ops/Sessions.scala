package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over an (id, timestamp) log: gap-based
  * sessionization and cohort retention — the standard OLAP companions to
  * the hourly rollups in `streaming.Streaming`.
  *
  * Scale: both are single-exchange designs. Sessionization shuffles once on
  * the user key (the window), then aggregates on (user, session) — which is
  * a prefix of the window partitioning, so no second exchange. Retention is
  * two aggregates joined on the user key. Timestamps are compared as exact
  * integer microseconds (unix_micros), never as doubles.
  */
object Sessions {

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapSeconds`. Returns one row per
    * session: (user, session_idx, start_us, end_us, n_events, total_value).
    * Ties on ts break by the event id column for total determinism. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 eventIdCol: String, valueCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(eventIdCol).asc)
    val gapUs = gapSeconds * 1000000L
    val flagged = events
      // cast covers TIMESTAMP_NTZ sources (unix_micros wants LTZ); the
      // session runs UTC, so the conversion is instant-preserving
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__new",
        when(col("__us") - lag("__us", 1).over(w) > gapUs, 1L).otherwise(lit(0L)))
      .withColumn("session_idx", sum("__new").over(w))
    flagged.groupBy(col(userCol), col("session_idx"))
      .agg(
        min("__us").as("start_us"),
        max("__us").as("end_us"),
        count(lit(1)).as("n_events"),
        graft.queries.Qutil.msum(col(valueCol)).as("total_value"))
  }

  /** [[sessionize]] over a GLOBAL timeline (no key — system incidents,
    * machine-wide alert storms) without the single-partition window the
    * naive `PARTITION BY lit(0)` formulation plans: at 100 TB even a
    * filter-reduced error stream is TB-scale, and one task sorting it is
    * the classic deadstop (the PlanSpec registry gate exists to catch
    * exactly that). Same two-pass recipe as [[Windows.globalIndex]]:
    *
    *  1. range-partition on (ts, id) — disjoint intervals of the total
    *     order — and compute each row's LOCAL new-session flag and local
    *     prefix sum with a partition-local window (lag is null at each
    *     partition head, so head flags are 0 locally);
    *  2. from the partition-count-sized stats frame (first/last us, local
    *     flag sum per partition), decide each partition HEAD's true flag
    *     by comparing against the previous non-empty partition's last
    *     event, and prefix-sum the per-partition session starts into a
    *     carry-in offset — global idx = local idx + offset, exactly the
    *     single-scan recurrence (the head row's flag is 0 in the local
    *     sum, so adding its boundary bit to the whole partition is the
    *     identity the spec pins against the reference formulation).
    *
    * The only unpartitioned window runs over the ≤ numParts-row stats
    * frame. Returns (session_idx, start_us, end_us, n_events,
    * total_value) at the session grain. */
  def sessionizeGlobal(events: DataFrame, tsCol: String, eventIdCol: String,
                       valueCol: String, gapSeconds: Long,
                       numParts: Int = 0): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val n = if (numParts > 0) numParts
      else events.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted: the range-parted frame feeds BOTH the stats/offsets
    // subtree and the final join, and the __pid alignment between them is
    // only guaranteed when repartitionByRange evaluates once — exchange
    // reuse usually delivers that, but it is a planner optimization
    // (spark.sql.exchange.reuse, canonicalization) not a contract; the
    // cache makes it unconditional. Caller-released (PinnedFrames).
    val parted = graft.PinnedFrames.pin(events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .repartitionByRange(n, col("__us"), col(eventIdCol))
      .withColumn("__pid", spark_partition_id())
      .persist())
    val lw = Window.partitionBy("__pid")
      .orderBy(col("__us").asc, col(eventIdCol).asc)
    val local = parted
      .withColumn("__new",
        when(col("__us") - lag("__us", 1).over(lw) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("__sloc", sum("__new").over(lw))
    // partition stats: ≤ n rows; lag over __pid skips empty partitions by
    // construction (they have no stats row)
    val stats = local.groupBy("__pid")
      .agg(min(struct(col("__us"), col(eventIdCol))).getField("__us").as("__first"),
        max(struct(col("__us"), col(eventIdCol))).getField("__us").as("__last"),
        sum("__new").as("__starts"))
    val sw = Window.orderBy("__pid")
    val pw = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = stats
      .withColumn("__head",
        when(col("__first") - lag("__last", 1).over(sw) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("__off",
        coalesce(sum(col("__starts") + col("__head")).over(pw), lit(0L))
          + col("__head"))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn("session_idx", col("__sloc") + col("__off"))
      .groupBy("session_idx")
      .agg(
        min("__us").as("start_us"),
        max("__us").as("end_us"),
        count(lit(1)).as("n_events"),
        graft.queries.Qutil.msum(col(valueCol)).as("total_value"))
  }

  /** Ordered funnel: how many users performed step 1, then step 2 strictly
    * after their first step 1, then step 3 strictly after that, and so on.
    * Step k is one aggregate on the user key joined to step k-1's
    * reach-time — every stage partitions by the same key, so after the
    * first shuffle the exchanges are reused; per-step state is one
    * timestamp per user. Returns (step_idx, step, n_users). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = events.select(col(userCol),
      col(typeCol).as("__type"),
      unix_micros(col(tsCol).cast("timestamp")).as("__us"))
    val first = ev.where(col("__type") === steps.head)
      .groupBy(userCol).agg(min("__us").as("__t"))
    val reaches = steps.tail.scanLeft(first) { (prev, step) =>
      ev.where(col("__type") === step)
        .join(prev.select(col(userCol), col("__t").as("__tprev")), userCol)
        .where(col("__us") > col("__tprev"))
        .groupBy(userCol).agg(min("__us").as("__t"))
    }
    reaches.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** [[funnel]] with a conversion deadline: step k counts only if it
    * happens within `windowUs` of reaching step k-1 (product analytics'
    * "converted within 24h" — the unbounded funnel over-counts stale
    * conversions). Same per-step min-aggregate recurrence and exchange
    * reuse; only the join predicate gains the upper bound. */
  def windowedFunnel(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, steps: Seq[String],
                     windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = events.select(col(userCol),
      col(typeCol).as("__type"),
      unix_micros(col(tsCol).cast("timestamp")).as("__us"))
    val first = ev.where(col("__type") === steps.head)
      .groupBy(userCol).agg(min("__us").as("__t"))
    val reaches = steps.tail.scanLeft(first) { (prev, step) =>
      ev.where(col("__type") === step)
        .join(prev.select(col(userCol), col("__t").as("__tprev")), userCol)
        .where(col("__us") > col("__tprev") &&
          col("__us") <= col("__tprev") + windowUs)
        .groupBy(userCol).agg(min("__us").as("__t"))
    }
    reaches.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Gaps-and-islands run-length encoding: collapse consecutive events with
    * the same state value (per user, ordered by ts then event id) into one
    * row per run — the standard change-point compaction for state logs
    * (SCD-style history building, alert-storm collapse). Same exchange
    * discipline as sessionize: one shuffle on the user key; the run
    * aggregate groups on (user, run_idx), a prefix of the window
    * partitioning, so the exchange is reused. Returns (user, state,
    * run_idx, start_us, end_us, n_events). */
  def runs(events: DataFrame, userCol: String, tsCol: String,
           eventIdCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(eventIdCol).asc)
    val flagged = events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__chg",
        when(lag(stateCol, 1).over(w).isNull ||
          lag(stateCol, 1).over(w) =!= col(stateCol), 1L).otherwise(lit(0L)))
      .withColumn("run_idx", sum("__chg").over(w))
    flagged.groupBy(col(userCol), col("run_idx"))
      .agg(
        first(stateCol).as("state"),
        min("__us").as("start_us"),
        max("__us").as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Daily-grid gap fill + forward fill — the distributed form of pandas
    * `resample('D').last().ffill()` per key (the reference stack's idiom
    * for sensor/metric panels with missing days). Per (key, day) the LAST
    * observation wins under the exact (micros, tie-id) total order — one
    * `max(struct(...))` aggregate, no window; each key's grid spans its
    * own [first, last] active day (`sequence` explode — map-only); missing
    * days carry the previous value via `last(ignoreNulls)` over a
    * day-ordered window.
    *
    * Scale: 1 (key, day) aggregate, 1 key-grain span aggregate, 1 grid⋈obs
    * equi-join, 1 key-partitioned window — all hash-distributed on the
    * key; per-key window state is one carried value. Grid size is
    * keys × span-days (bounded by calendar, not events); a 100 TB event
    * log compacts to the (key, day) grain BEFORE the grid join, so the
    * join sides are day-grain-sized. Output: (key, day, obs, carried,
    * is_filled) with `carried` null-free from each key's first day on. */
  def gapFillForward(events: DataFrame, userCol: String, tsCol: String,
                     tieCol: String, valueCol: String): DataFrame = {
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
    val obs = events
      .select(col(userCol), day.as("day"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(tieCol).cast("long").as("__tie"),
        col(valueCol).as("__v"))
      .groupBy(col(userCol), col("day"))
      .agg(max(struct(col("__us"), col("__tie"), col("__v")))
        .getField("__v").as("obs"))
    val grid = obs.groupBy(userCol)
      .agg(min("day").as("__mn"), max("day").as("__mx"))
      .select(col(userCol), explode(expr("sequence(__mn, __mx)")).as("day"))
    val w = Window.partitionBy(userCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(userCol, "day"), "left")
      .withColumn("carried", last(col("obs"), ignoreNulls = true).over(w))
      .withColumn("is_filled", col("obs").isNull)
  }

  /** Rolling-window anomaly detection: flag events whose value deviates
    * more than `k` sample standard deviations from the mean of the
    * PREVIOUS `n` events of the same key (the current row is excluded —
    * an anomaly must not dilute the baseline that judges it). Exact
    * decimal Σx and Σx² in the frame make the moments order-independent
    * and engine-exact; the σ arithmetic then runs on identical doubles.
    * Rows with fewer than `minObs` predecessors are not evaluated (warm-up
    * — a 2-row baseline flags everything).
    *
    * One exchange on the key; per-key window state is the n-row ring
    * buffer — O(n) bounded, the scalable direction (keys are the
    * parallelism). Appends `n_prev`, `anomaly` (null while warming up). */
  def rollingAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: String,
                       n: Int, k: Double, minObs: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(col(tsCol).cast("timestamp")), col(tieCol))
      .rowsBetween(-n, -1)
    val dec = DecimalType(28, 8)
    val out = events
      .withColumn("__s1", sum(col(valueCol).cast(dec)).over(w).cast("double"))
      .withColumn("__s2",
        sum((col(valueCol) * col(valueCol)).cast(dec)).over(w).cast("double"))
      .withColumn("n_prev", count(lit(1)).over(w))
    val mean = col("__s1") / col("n_prev")
    val varS = (col("__s2") - col("n_prev") * mean * mean) /
      (col("n_prev") - lit(1))
    out.withColumn("anomaly",
        when(col("n_prev") >= minObs,
          abs(col(valueCol) - mean) > lit(k) * sqrt(greatest(varS, lit(0.0)))))
      .drop("__s1", "__s2")
  }

  /** Cohort retention: users are cohorted by their first activity day;
    * output counts distinct active users per (cohort day, day offset).
    * Days are exact integers (days since epoch / day differences). */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val days = events.select(col(userCol),
      datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date")).as("day"))
    val cohort = days.groupBy(userCol).agg(min("day").as("cohort_day"))
    days.join(cohort, userCol)
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Entry-point/bounce report: sessionize by inactivity gap (the
    * [[sessionize]] recurrence), pick each session's ENTRY event by the
    * deterministic (ts, id) struct-min — no second window pass — and roll
    * up per entry type: sessions started there, single-event "bounces",
    * and the bounce rate. The landing-page analytics staple, one gap
    * window + two aggregates. */
  def bounceReport(events: DataFrame, userCol: String, tsCol: String,
                   eventIdCol: String, typeCol: String,
                   gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("__us").asc, col(eventIdCol).asc)
    val gapUs = gapSeconds * 1000000L
    val flagged = events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__new",
        when(col("__us") - lag("__us", 1).over(w) > gapUs, 1L).otherwise(lit(0L)))
      .withColumn("session_idx", sum("__new").over(w))
    val sessions = flagged.groupBy(col(userCol), col("session_idx"))
      .agg(
        min(struct(col("__us").as("u"), col(eventIdCol).as("i"),
          col(typeCol).as("t"))).getField("t").as("entry_type"),
        count(lit(1)).as("n_events"))
    sessions.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate", graft.queries.Qutil.dround(
        col("n_bounces").cast("double") / col("n_sessions"), 6))
  }

  /** Session path matrix: per session, the (entry, exit) event-type pair
    * — both picked from ONE session-grain aggregate via struct-min and
    * struct-max over (ts, id, type), so the gap window's sort is the only
    * sort. Counts per (entry, exit) pair are the navigation-flow report. */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
                   eventIdCol: String, typeCol: String,
                   gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("__us").asc, col(eventIdCol).asc)
    val gapUs = gapSeconds * 1000000L
    val flagged = events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__new",
        when(col("__us") - lag("__us", 1).over(w) > gapUs, 1L).otherwise(lit(0L)))
      .withColumn("session_idx", sum("__new").over(w))
    flagged.groupBy(col(userCol), col("session_idx"))
      .agg(
        min(struct(col("__us").as("u"), col(eventIdCol).as("i"),
          col(typeCol).as("t"))).getField("t").as("entry_type"),
        max(struct(col("__us").as("u"), col(eventIdCol).as("i"),
          col(typeCol).as("t"))).getField("t").as("exit_type"))
      .groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** Peak concurrent sessions per day — the capacity-planning sweep line.
    * Input is the session grain (key, start_us, end_us); each session is
    * clipped to the days it touches (≤ span-days explode — map-only),
    * boundaries become (+1 at start, −1 past end) events, and a
    * DAY-PARTITIONED prefix sum + max gives the peak. Sessions are closed
    * intervals ([s, e] — end+1µs exclusive), so a one-event session still
    * occupies its instant; at equal timestamps ends process before starts
    * (delta ascending), with (key, idx) completing a total order.
    *
    * Scale shape: the sweep is per DAY, never global — the window sorts
    * one day's boundaries, and days are independent partitions. (A
    * global-timeline variant would be the q83-style two-pass prefix:
    * per-partition sums + carry-in offsets.) */
  def peakConcurrency(sessions: DataFrame, keyCol: String, idxCol: String,
                      startUsCol: String, endUsCol: String): DataFrame = {
    val DayUs = 86400000000L
    val s = sessions.select(col(keyCol).as("k"), col(idxCol).as("idx"),
      col(startUsCol).as("s"), (col(endUsCol) + 1L).as("e"))
    val clipped = s
      .withColumn("day",
        explode(sequence(floor(col("s") / DayUs).cast("long"),
          floor((col("e") - 1) / DayUs).cast("long"))))
      .withColumn("lo", greatest(col("s"), col("day") * DayUs))
      .withColumn("hi", least(col("e"), (col("day") + 1) * DayUs))
    val bounds = clipped
      .select(col("day"), col("lo").as("us"), lit(1L).as("delta"),
        col("k"), col("idx"))
      .unionByName(clipped.select(col("day"), col("hi").as("us"),
        lit(-1L).as("delta"), col("k"), col("idx")))
    val w = Window.partitionBy("day")
      .orderBy(col("us"), col("delta"), col("k"), col("idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    bounds
      .withColumn("conc", sum(col("delta")).over(w))
      .groupBy("day")
      .agg((count(lit(1)) / 2).cast("long").as("n_sessions"),
        max(col("conc")).as("peak_concurrency"))
  }
}
