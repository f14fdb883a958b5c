package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * pattern): assert completeness / uniqueness / range / set-membership over
  * a table and emit one report row per expectation with the measured
  * fraction and a pass flag.
  *
  * Scale design: every row-local expectation compiles to a conditional
  * count inside ONE shared aggregate — profiling a 100 TB table costs one
  * scan regardless of how many expectations are attached (the q31
  * single-pass-profiling rule). Uniqueness needs a distinct count and runs
  * as its own two-level aggregate (the A6 Expand-avoidance rule: fusing a
  * distinct into the mixed aggregate would shuffle every row un-combined);
  * the report join is over one-row frames. Fractions are exact integer
  * ratios — deterministic in any engine.
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    def threshold: Double
  }
  /** Fraction of non-null values. */
  final case class Completeness(column: String, threshold: Double = 1.0)
    extends Expectation { def name = s"completeness($column)" }
  /** distinct(cols) / count(*). */
  final case class Uniqueness(columns: Seq[String], threshold: Double = 1.0)
    extends Expectation { def name = s"uniqueness(${columns.mkString(",")})" }
  /** Fraction of values inside [lo, hi] (nulls fail). */
  final case class InRange(column: String, lo: Double, hi: Double,
                           threshold: Double = 1.0)
    extends Expectation { def name = s"in_range($column)" }
  /** Fraction of values inside the allow-set (nulls fail). */
  final case class InSet(column: String, values: Seq[String],
                         threshold: Double = 1.0)
    extends Expectation { def name = s"in_set($column)" }

  private def conditionOf(e: Expectation): Option[Column] = e match {
    case Completeness(c, _) => Some(col(c).isNotNull)
    case InRange(c, lo, hi, _) => Some(col(c) >= lo && col(c) <= hi)
    case InSet(c, vs, _) => Some(col(c).isin(vs: _*))
    case _: Uniqueness => None
  }

  /** One report row per expectation: (expectation, value, threshold,
    * passed, n). `value` is the measured fraction at 6dp. */
  def report(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    val rowLocal = expectations.flatMap(e => conditionOf(e).map(e -> _))
    val uniques = expectations.collect { case u: Uniqueness => u }

    val baseAggs = count(lit(1)).as("__n") +:
      rowLocal.zipWithIndex.map { case ((_, cond), i) =>
        sum(when(cond, 1L).otherwise(0L)).as(s"__c$i")
      }
    val base = df.agg(baseAggs.head, baseAggs.tail: _*)

    // one two-level distinct aggregate per uniqueness expectation
    // (uniqueness sets are usually 0-1 per table; each is its own scan-free
    // re-aggregation of the same shuffle when keys share a prefix)
    val withUniques = uniques.zipWithIndex.foldLeft(base) { case (acc, (u, i)) =>
      val d = df.select(u.columns.map(col): _*).distinct()
        .agg(count(lit(1)).as(s"__d$i"))
      acc.crossJoin(d)
    }

    val frac = (c: Column) =>
      graft.queries.Qutil.dround(c.cast("double") / col("__n"), 6)
    val rows = rowLocal.zipWithIndex.map { case ((e, _), i) =>
      (e, frac(col(s"__c$i")))
    } ++ uniques.zipWithIndex.map { case (u, i) => (u, frac(col(s"__d$i"))) }

    // widen to long form by exploding a literal struct array over the ONE
    // metrics row — a union of per-expectation selects would re-execute
    // the aggregate (and re-scan the table) once per branch
    val structs = rows.map { case (e, value) =>
      struct(
        lit(e.name).as("expectation"),
        value.as("value"),
        lit(e.threshold).as("threshold"),
        (value >= e.threshold).as("passed"),
        col("__n").as("n"))
    }
    withUniques.select(explode(array(structs: _*)).as("r")).select("r.*")
  }

  /** Bucket-granular table integrity diff (Merkle-lite): compare two
    * copies of a table (replica, migration target, backup restore) by
    * per-bucket CHECKSUMS instead of row-by-row — each side reduces to
    * `buckets` rows of (count, additive hash sum), and only buckets
    * whose summaries disagree need the expensive row-level diff
    * (q130's snapshotDiff, scoped to the flagged buckets). At 100 TB
    * this turns "compare two tables" into two scans + a buckets-sized
    * join; the additive long sum of row hashes is order- and
    * partition-free, so layout differences between the copies never
    * false-positive.
    *
    * Row hash: md5 over the string forms of `hashCols` joined on the
    * \u0001 field separator (an empty-string join would collide across
    * field boundaries: ('ab','c') vs ('a','bc')), nulls encoded as the
    * \u0002 sentinel (so NULL ≠ empty string); bucket: md5 of the key
    * column mod `buckets` — all replayable in SQL via chr(1)/chr(2).
    * Callers hash STABLE string forms (ints, cents, epoch micros),
    * never engine-formatted doubles or timestamps. Collisions:
    * a bucket disagreeing is PROOF of difference; agreement is
    * probabilistic (a 32-bit-per-row additive sum — the standard
    * checksum trade, tightened by more hash bits if needed).
    *
    * Returns one row per DIFFERING bucket:
    * (bucket, n_a, n_b, sum_a, sum_b). Empty result = copies agree. */
  def integrityDiff(a: DataFrame, b: DataFrame, keyCol: String,
                    hashCols: Seq[String], buckets: Int): DataFrame = {
    import graft.functions.TextFunctions.md5Int
    def summary(df: DataFrame, pfx: String): DataFrame = {
      val row = md5Int(concat_ws("\u0001",
        hashCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))
      df.groupBy(pmod(md5Int(col(keyCol).cast("string")), lit(buckets.toLong))
          .as("bucket"))
        .agg(count(lit(1)).as(s"n_$pfx"), sum(row).as(s"sum_$pfx"))
    }
    summary(a, "a").join(summary(b, "b"), Seq("bucket"), "full_outer")
      .where(!(col("n_a") <=> col("n_b")) || !(col("sum_a") <=> col("sum_b")))
      .select(col("bucket"), col("n_a"), col("n_b"),
        col("sum_a"), col("sum_b"))
  }
}
