package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. Column aliases MUST match
  * between the two — the driver's compare sorts columns by name before
  * hashing. Both sides carry an identical ORDER BY so row order can never
  * be the source of a mismatch, and floating aggregates are rounded on both
  * sides to absorb summation-order ulps.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
