package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Non-associative sequential recurrences — the operator class window
  * functions CANNOT express: a clamped running balance
  * `bal_i = max(0, bal_{i-1} + delta_i)` depends on every prefix through a
  * non-linear function, so there is no frame aggregation, no prefix sum,
  * no two-pass trick that computes it (contrast `ops.Windows`' running
  * sums, which are associative and stay in declarative window land).
  *
  * This is the documented LAST-RESORT tier (d) of the operator preference
  * order: repartition by key + in-partition secondary sort + one
  * sequential fold per key inside `mapPartitions`. The honest scale
  * contract:
  *  - parallelism is per KEY (a key's rows must fold in order — inherent
  *    to the semantics, not the implementation);
  *  - one shuffle (the repartition) + one in-partition sort, the same cost
  *    as any windowed aggregation over the key;
  *  - state is O(1) per key (the running balance/peak/reset counters) and
  *    rows stream through the iterator — nothing is materialized
  *    per-partition;
  *  - all arithmetic is integer (callers pass deltas in minor units), so
  *    results are engine-exact and the recurrence is replayable as a
  *    DuckDB recursive CTE.
  */
object Recurrence {

  final case class BalanceReport(user_id: Long, final_balance: Long,
                                 peak_balance: Long, n_resets: Long)

  /** Fold `(key, ts, id, delta)` rows — ordered by (ts, id) within each
    * key — through the clamped-balance recurrence; one report row per key.
    * `n_resets` counts rows where the unclamped balance went negative. */
  def clampedBalance(rows: Dataset[(Long, Long, Long, Long)])
  : Dataset[BalanceReport] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
      .mapPartitions { it =>
        new Iterator[BalanceReport] {
          private var cur = Option.empty[BalanceReport]
          private var pending = Option.empty[BalanceReport]
          private def fold(r: (Long, Long, Long, Long)): Unit = {
            val (k, _, _, delta) = r
            cur match {
              case Some(s) if s.user_id == k =>
                val raw = s.final_balance + delta
                val bal = math.max(0L, raw)
                cur = Some(BalanceReport(k, bal,
                  math.max(s.peak_balance, bal),
                  s.n_resets + (if (raw < 0) 1L else 0L)))
              case other =>
                pending = other // previous key complete — emit it
                val raw = delta
                val bal = math.max(0L, raw)
                cur = Some(BalanceReport(k, bal, bal,
                  if (raw < 0) 1L else 0L))
            }
          }
          def hasNext: Boolean = pending.nonEmpty || it.hasNext || cur.nonEmpty
          def next(): BalanceReport = {
            while (pending.isEmpty && it.hasNext) fold(it.next())
            pending match {
              case Some(p) => pending = None; p
              case None => // input exhausted: flush the last key
                val last = cur.get; cur = None; last
            }
          }
        }
      }
  }

  /** DataFrame front door: selects/casts the four columns and returns the
    * per-key report frame. */
  def clampedBalanceReport(df: DataFrame, keyCol: String, tsCol: String,
                           idCol: String, deltaCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    clampedBalance(df.select(
      col(keyCol).cast("long").as("_1"), col(tsCol).cast("long").as("_2"),
      col(idCol).cast("long").as("_3"), col(deltaCol).cast("long").as("_4"))
      .as[(Long, Long, Long, Long)])
      .toDF()
  }

  final case class EwmaReport(user_id: Long, n: Long, ewma: Double)

  /** Per-key EWMA — s_i = α·x_i + (1-α)·s_{i-1}, s_1 = x_1 — the linear
    * member of the sequential-recurrence family. It LOOKS window-friendly
    * (the closed form is a weighted prefix sum) but the
    * prefix-factorization s_i = α(1-α)^i Σ x_j(1-α)^{-j} overflows
    * (0.75^-10000 ≈ 10^1249), so the honest scalable form is the same
    * repartition + secondary-sort + streaming fold as [[clampedBalance]].
    * Left-to-right fold with a fixed expression shape (α·x + (1-α)·s) —
    * IEEE-deterministic, so a recursive-CTE oracle replays it bitwise
    * when α is exactly representable (0.25 is). One report row per key:
    * (key, n, final ewma). */
  def ewmaReport(df: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, xCol: String, alpha: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("_1"), col(tsCol).cast("long").as("_2"),
        col(idCol).cast("long").as("_3"), col(xCol).cast("double").as("_4"))
      .as[(Long, Long, Long, Double)]
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
      .mapPartitions { it =>
        new Iterator[EwmaReport] {
          private var cur = Option.empty[EwmaReport]
          private var pending = Option.empty[EwmaReport]
          private def fold(r: (Long, Long, Long, Double)): Unit = {
            val (k, _, _, x) = r
            cur match {
              case Some(s) if s.user_id == k =>
                cur = Some(EwmaReport(k, s.n + 1,
                  alpha * x + (1 - alpha) * s.ewma))
              case other =>
                pending = other
                cur = Some(EwmaReport(k, 1L, x))
            }
          }
          def hasNext: Boolean = pending.nonEmpty || it.hasNext || cur.nonEmpty
          def next(): EwmaReport = {
            while (pending.isEmpty && it.hasNext) fold(it.next())
            pending match {
              case Some(p) => pending = None; p
              case None => val last = cur.get; cur = None; last
            }
          }
        }
      }
      .toDF()
  }

  final case class CappedSessionReport(user_id: Long, n_sessions: Long,
                                       n_gap_splits: Long, n_cap_splits: Long)

  /** Sessionization with a MAX-DURATION cap — the variant plain window
    * sessionization cannot express: q53's gap rule is declarative
    * (a split depends only on the previous row), but "a session may not
    * exceed `capUs` regardless of activity" makes each split depend on
    * the running session START, which depends on every earlier split —
    * a true sequential recurrence (the analytics-SQL folklore example of
    * non-window-able logic; billing meters and security-token windows
    * need exactly this rule). Same honest fold tier as
    * [[clampedBalance]]: repartition by key + secondary sort + O(1)
    * state (session start, last ts, counters). All integer arithmetic —
    * the oracle replays it as a recursive CTE, bit-exact. A new session
    * starts when the inactivity gap exceeds `gapUs` OR the current event
    * would stretch the session past `capUs`; the two causes are counted
    * separately (gap wins the tie when both hold). */
  def cappedSessions(df: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, gapUs: Long, capUs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("_1"), col(tsCol).cast("long").as("_2"),
        col(idCol).cast("long").as("_3"))
      .as[(Long, Long, Long)]
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
      .mapPartitions { it =>
        final case class St(key: Long, start: Long, last: Long,
                            sessions: Long, gaps: Long, caps: Long)
        new Iterator[CappedSessionReport] {
          private var cur = Option.empty[St]
          private var pending = Option.empty[CappedSessionReport]
          private def report(s: St) =
            CappedSessionReport(s.key, s.sessions, s.gaps, s.caps)
          private def fold(r: (Long, Long, Long)): Unit = {
            val (k, us, _) = r
            cur match {
              case Some(s) if s.key == k =>
                if (us - s.last > gapUs)
                  cur = Some(St(k, us, us, s.sessions + 1, s.gaps + 1, s.caps))
                else if (us - s.start > capUs)
                  cur = Some(St(k, us, us, s.sessions + 1, s.gaps, s.caps + 1))
                else
                  cur = Some(s.copy(last = us))
              case other =>
                pending = other.map(report)
                cur = Some(St(k, us, us, 1L, 0L, 0L))
            }
          }
          def hasNext: Boolean = pending.nonEmpty || it.hasNext || cur.nonEmpty
          def next(): CappedSessionReport = {
            while (pending.isEmpty && it.hasNext) fold(it.next())
            pending match {
              case Some(p) => pending = None; p
              case None => val last = cur.get; cur = None; report(last)
            }
          }
        }
      }
      .toDF()
  }

  final case class HoltReport(user_id: Long, n: Long, level: Double,
                              trend: Double)

  /** Per-key Holt linear (double exponential) smoothing — EWMA's
    * two-state sibling: a level AND a trend, so the one-step forecast
    * (level + trend) tracks drifting series instead of lagging them.
    *   l_i = α·x_i + (1−α)·(l_{i−1} + b_{i−1})
    *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1};  l_1 = x_1, b_1 = 0.
    * Coupled two-state recurrences have no window/prefix factorization
    * at all (even EWMA's overflowing closed form doesn't exist here), so
    * this is the same honest fold tier as [[ewmaReport]]: repartition by
    * key + secondary sort + one streaming O(1)-state fold. Fixed
    * expression shapes (the exact forms above, reusing the freshly
    * computed l_i inside b_i) — IEEE-deterministic, so a two-column
    * recursive-CTE oracle replays every intermediate bitwise when α and
    * β are exactly representable (0.5 and 0.25 are). One report row per
    * key: (key, n, final level, final trend). */
  def holtReport(df: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, xCol: String, alpha: Double,
                 beta: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("_1"), col(tsCol).cast("long").as("_2"),
        col(idCol).cast("long").as("_3"), col(xCol).cast("double").as("_4"))
      .as[(Long, Long, Long, Double)]
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
      .mapPartitions { it =>
        new Iterator[HoltReport] {
          private var cur = Option.empty[HoltReport]
          private var pending = Option.empty[HoltReport]
          private def fold(r: (Long, Long, Long, Double)): Unit = {
            val (k, _, _, x) = r
            cur match {
              case Some(s) if s.user_id == k =>
                val l = alpha * x + (1 - alpha) * (s.level + s.trend)
                val b = beta * (l - s.level) + (1 - beta) * s.trend
                cur = Some(HoltReport(k, s.n + 1, l, b))
              case other =>
                pending = other
                cur = Some(HoltReport(k, 1L, x, 0.0))
            }
          }
          def hasNext: Boolean = pending.nonEmpty || it.hasNext || cur.nonEmpty
          def next(): HoltReport = {
            while (pending.isEmpty && it.hasNext) fold(it.next())
            pending match {
              case Some(p) => pending = None; p
              case None => val last = cur.get; cur = None; last
            }
          }
        }
      }
      .toDF()
  }
}
