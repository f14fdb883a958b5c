package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution fitting and standardisation (SURVEY.md §2.6 A4/A5, §2.8 C11).
  *
  * The reference computes group mean/std in pandas (sample std, ddof=1,
  * LOADERS/GOLD-data-loader.py:446-448) on one path and scipy zscore
  * (population, ddof=0, DEPRECATED/statsbomb-gold-temp-v2.py:141-143) on
  * another; the engine parameterises ddof and defaults to the live (sample)
  * path (SURVEY.md §7.4 item 1).
  */
object Stats {

  sealed trait Ddof
  case object Sample extends Ddof      // pandas default, ddof=1 — live gold path
  case object Population extends Ddof  // scipy zscore, ddof=0 — deprecated path

  private def stdFn(ddof: Ddof): Column => Column = ddof match {
    case Sample     => stddev_samp
    case Population => stddev_pop
  }

  /** A4 — per-group mean and std for a set of stat columns; one hash
    * aggregate, map-side partials, no window. Output columns are
    * `<stat>_mean` / `<stat>_std`. */
  def groupStats(df: DataFrame, keys: Seq[String], stats: Seq[String],
                 ddof: Ddof = Sample): DataFrame = {
    val aggs = stats.flatMap { s =>
      Seq(avg(col(s)).as(s + "_mean"), stdFn(ddof)(col(s)).as(s + "_std"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** C11 — z-score transform with the reference's exact null semantics
    * (LOADERS/GOLD-data-loader.py:219-234,465-469):
    * null stat → 0 (mean-impute in z-space), zero-variance group → 0.
    * Adds `zs_<stat>` per input stat; computed with window aggregates so the
    * stat columns shuffle once on the group keys.
    */
  def zscore(df: DataFrame, keys: Seq[String], stats: Seq[String],
             ddof: Ddof = Sample, prefix: String = "zs_"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val zcols = stats.map { s =>
      val mean = avg(col(s)).over(w)
      val sd = stdFn(ddof)(col(s)).over(w)
      val z = when(sd.isNull || sd === 0d, lit(0d))
        .otherwise((col(s) - mean) / sd)
      coalesce(z, lit(0d)).as(prefix + s)
    }
    df.select((df.columns.map(col).toIndexedSeq ++ zcols): _*)
  }

  /** C10 — flip the sign of configured inverse stats (turnovers, fouls…)
    * after z-scoring (LOADERS/GOLD-data-loader.py:325-326,470-471). */
  def invertStats(df: DataFrame, inverse: Seq[String]): DataFrame = {
    val inv = inverse.toSet
    df.select(df.columns.map { c =>
      if (inv(c)) (col(c) * -1d).as(c) else col(c)
    }: _*)
  }
}
