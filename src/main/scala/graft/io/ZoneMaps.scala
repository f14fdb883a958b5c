package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map (min/max statistics) file skipping — the data-skipping index
  * every lake table format (Delta/Iceberg/Hudi) plans with, expressed
  * engine-side over plain parquet directories.
  *
  * A clustered write ([[Writers.writeZOrdered]], `repartitionByRange`)
  * makes each file cover a narrow slice of the cluster column; the
  * manifest ([[Writers.scanManifest]]) records per-file min/max; a range
  * query then touches only the files whose [min,max] envelope intersects
  * the predicate. The exact predicate is still applied to the surviving
  * rows, so pruning can never change the answer — only the bytes read.
  *
  * Scale shape at 100 TB:
  *  - the manifest is one row per FILE (a 100 TB table at 128 MB/file is
  *    ~800k rows — metadata-sized), persisted as a sidecar next to the
  *    data and refreshed incrementally on append;
  *  - the pruned file list is collected on the driver — exactly what the
  *    Delta/Iceberg planner does with its manifest before task planning;
  *    it is bounded by the file count, never the row count;
  *  - the read of the surviving files still gets parquet row-group
  *    pushdown on top (the predicate is re-applied), so skipping composes
  *    with, rather than replaces, the scan-level filters.
  */
object ZoneMaps {

  /** Build and persist the min/max manifest sidecar for `path`. */
  def writeManifest(spark: SparkSession, path: String,
                    auditCols: Seq[String]): String = {
    val side = path.stripSuffix("/") + "_zonemap"
    Writers.scanManifest(spark, path, auditCols)
      .write.mode("overwrite").parquet(side)
    side
  }

  /** Incremental manifest maintenance: scan ONLY `newDataDir` (a fresh
    * commit/append directory — e.g. one `io.Versioned` commit) and append
    * its per-file stats to an existing manifest. This is the Iceberg
    * per-snapshot-manifest shape: ingest cost is proportional to the NEW
    * files, never a rescan of the table, which is what keeps zone maps
    * maintainable on a table that takes appends forever. */
  def appendManifest(spark: SparkSession, newDataDir: String,
                     manifestPath: String, auditCols: Seq[String]): Unit =
    Writers.scanManifest(spark, newDataDir, auditCols)
      .write.mode("append").parquet(manifestPath)

  /** Files whose [min_col, max_col] envelope intersects [lo, hi].
    * Null-stat files (all-null column) are kept — skipping must be
    * conservative. */
  def pruneFiles(spark: SparkSession, manifestPath: String,
                 zoneCol: String, lo: Any, hi: Any): (Seq[String], Int) = {
    val m = spark.read.parquet(manifestPath)
    val total = m.count().toInt
    val kept = m.where(
        col(s"min_$zoneCol").isNull ||
          (col(s"max_$zoneCol") >= lit(lo) && col(s"min_$zoneCol") <= lit(hi)))
      .select("file").collect().map(_.getString(0)).toSeq
    (kept, total)
  }

  /** Range scan that reads only the manifest-surviving files, then applies
    * the exact predicate. Returns the frame plus (filesRead, filesTotal)
    * for skipping-rate assertions. */
  def prunedScan(spark: SparkSession, path: String, manifestPath: String,
                 zoneCol: String, lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val (files, total) = pruneFiles(spark, manifestPath, zoneCol, lo, hi)
    val df =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    (df.where(col(zoneCol) >= lit(lo) && col(zoneCol) <= lit(hi)),
      files.size, total)
  }
}
