package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling (SURVEY.md §2.6 A9/A10): the reference's inline
  * describe()/isna()/std!=0 guards, as one-pass aggregations.
  */
object Profiling {

  /** A10 — per-column null and zero percentages, long format
    * (STAGING/scrape_champion_CIA_players.ipynb cells 7-8). One aggregation
    * over the table; the per-column rows come from a literal explode, not
    * per-column jobs. */
  def nullZeroProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(avg(when(col(c).isNull, 1d).otherwise(0d)).as(s"__null_$c"),
          avg(when(col(c) === 0, 1d).otherwise(0d)).as(s"__zero_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__null_$c").as("null_pct"),
        col(s"__zero_$c").as("zero_pct"))
    }
    wide.select(explode(array(pairs: _*)).as("p")).select("p.*")
  }

  /** A9 — distribution validation: min/max/std per stat with the reference's
    * guard semantics (zero variance is an error; values far outside the
    * z-score range draw warnings, DEPRECATED/statsbomb-gold-temp-v2.py:
    * 441-449). Returns (column, min, max, std, zeroVariance, outOfRange). */
  def distributionChecks(df: DataFrame, cols: Seq[String],
                         lo: Double = -1.5, hi: Double = 6.5): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
          stddev_samp(col(c)).as(s"__std_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__min_$c").as("min"), col(s"__max_$c").as("max"),
        col(s"__std_$c").as("std"),
        (coalesce(col(s"__std_$c"), lit(0d)) === 0d).as("zeroVariance"),
        (col(s"__min_$c") < lo || col(s"__max_$c") > hi).as("outOfRange"))
    }
    wide.select(explode(array(pairs: _*)).as("p")).select("p.*")
  }
}
