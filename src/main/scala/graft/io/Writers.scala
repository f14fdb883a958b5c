package graft.io

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2.2). */
object Writers {

  /** K1 — partitioned parquet with dynamic partition overwrite: re-running a
    * subset of seasons replaces only the touched partitions
    * (ADAPTERS/SILVER-adapter-wyscout.py:495-503). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit = {
    df.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .option("compression", "snappy")
      .parquet(path)
  }

  /** Bucketed managed table: co-locates both sides of a recurring
    * fact-fact join (e.g. lineitem⋈orders on orderkey) so the join runs
    * without any Exchange — the 100 TB answer to the plan's dominant
    * shuffle (see SCALE.md). Requires saveAsTable (bucket metadata lives in
    * the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)

  /** K2 — single-file debug CSV (ADAPTERS/SILVER-adapter-wyscout.py:505-511).
    * coalesce(1) is for debug output only — never on the main path. */
  def debugCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K9 — duplicates report: every row whose key combination occurs more
    * than once, written as a debug CSV before the dedup resolves them
    * (DEPRECATED/statsbomb-silver.py:209-217, `keep=False` semantics: ALL
    * members of each duplicate group are reported, not just the losers).
    * Returns the duplicate-row count; nothing is written when it is zero.
    * Diagnostic sink: the single count() action and coalesce(1) are the
    * debug-path trade-off, never on the main path. */
  def duplicatesReport(df: DataFrame, keys: Seq[String], path: String): Long = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, count, lit}
    val w = Window.partitionBy(keys.map(col): _*)
    val dups = df.withColumn("__n", count(lit(1)).over(w))
      .where(col("__n") > 1).drop("__n")
      .persist()
    val n = dups.count()
    if (n > 0) debugCsv(dups, path)
    dups.unpersist()
    n
  }

  /** K8 — per-aggregation-period fan-out: one filtered write per period
    * table (STAGING/GOLD-data-loader-experiment-form.py:552-576). */
  def writePerPeriod(df: DataFrame, pathFor: String => String,
                     periods: Seq[String], partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    periods.foreach { p =>
      writePartitioned(df.where(col("aggregationPeriod") === p), pathFor(p), partitionCol)
    }
  }
}
