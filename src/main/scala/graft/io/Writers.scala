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
