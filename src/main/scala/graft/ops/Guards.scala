package graft.ops

import org.apache.spark.sql.DataFrame

/** F9 — empty/threshold guards for the re-run model
  * (LOADERS/GOLD-data-loader.py:437-443): the reference skips a season when
  * the eligible frame is empty or under a profile-count threshold, instead
  * of writing a degenerate distribution fit.
  */
object Guards {

  /** True when `df` has at least `minRows` rows. Counts a `limit(minRows)`
    * slice — Spark stops scanning as soon as the limit is hit, so this never
    * pays a full count on a large frame. */
  def hasAtLeast(df: DataFrame, minRows: Int): Boolean =
    df.limit(minRows).count() >= minRows

  /** Run `write` only when the frame clears the threshold; returns whether
    * it ran. The reference's "Zero eligible entries, skipping season" /
    * "under the profiles_threshold" branches. */
  def writeIfAtLeast(df: DataFrame, minRows: Int)(write: DataFrame => Unit): Boolean = {
    val ok = hasAtLeast(df, minRows)
    if (ok) write(df)
    else org.slf4j.LoggerFactory.getLogger(getClass)
      .warn(s"Guards: frame under $minRows rows, skipping write")
    ok
  }
}
