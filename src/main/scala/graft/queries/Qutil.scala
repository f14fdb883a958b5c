package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine float determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Doubles summed in different orders differ in final ulps, and
  * money-like data sits exactly on round() boundaries (e.g. a true sum of
  * ….435 rounding to .43 in one engine and .44 in the other — observed at
  * sf0.01). Two rules kill this class of flake:
  *
  *  1. `msum`: sum money columns as DECIMAL of the term — decimal addition
  *     is exact and associative, and the double→decimal(38,s) conversion of
  *     a ≤(s-2)-decimal-place true value agrees between Spark and DuckDB —
  *     so both engines produce bit-identical sums.
  *  2. `dround`: round via floor(x·10^k + 0.5)/10^k — only IEEE ops that
  *     behave identically in both engines given identical input bits, unlike
  *     round(), whose half-up tie handling is implemented differently
  *     (Spark: exact BigDecimal of the shortest repr; DuckDB: scaled-double
  *     nearbyint) and disagrees on decimal-aligned values.
  *
  * The SQL oracle mirrors: `CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)`
  * and `floor(x * 10^k + 0.5) / 10^k`.
  */
object Qutil {

  /** Deterministic half-up rounding; same IEEE ops as the SQL
    * `floor(x * p + 0.5) / p`. */
  def dround(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Exact, order-independent sum of a money-like double column (true value
    * has ≤ scale-2 decimal places). Result cast back to double.
    * Precision 18 keeps Spark's Decimal long-backed (no BigDecimal boxing in
    * the hot aggregate); terms must stay < 10^(18-scale). */
  def msum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean: decimal sum divided by count — identical double division
    * on both engines. */
  def mavg(c: Column, scale: Int = 4): Column =
    msum(c, scale) / count(lit(1))
}
