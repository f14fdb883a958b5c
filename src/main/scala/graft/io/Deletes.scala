package graft.io

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted row-level deletion over plain parquet — the
  * right-to-be-forgotten / compliance operation every lake table needs:
  * rewrite ONLY the files that contain a matching row and leave every
  * other file byte-untouched. At 100 TB the difference between this and
  * a naive `read.filter.write` is the whole table: a GDPR batch of a few
  * thousand user ids scattered over a petabyte touches a bounded set of
  * files (tighter still when the table is clustered so the delete key
  * correlates with file ranges — the [[Layout]]/[[Writers.writeZOrdered]]
  * layouts make deletes cheap too, not just reads).
  *
  * Shape: one scan finds the affected FILE list (driver-collected —
  * bounded by file count, the Delta/Iceberg planner's grain), one job
  * rewrites only those files with matching rows dropped, then the swap
  * removes the originals and moves the rewritten files in. Single-writer
  * maintenance semantics like [[Writers.compactFiles]] /
  * `Similarity.compactIvfIndex`: the swap window is not transactional
  * against concurrent readers — run it like compaction, from the table's
  * one maintenance writer (or behind a [[Versioned]] commit).
  *
  * NULL discipline: a row where the predicate evaluates NULL is NOT a
  * match — it is kept, not silently dropped (`coalesce(pred, false)` on
  * both the match count and the keep filter).
  */
object Deletes {

  final case class DeleteReport(filesTouched: Int, filesTotal: Int,
                                rowsDeleted: Long)

  /** Delete rows matching `pred`. Handles flat directories and one level
    * of `col=value` partition directories (the [[Writers]]/[[Layout]]
    * layouts); partition columns are preserved through the rewrite, and
    * `sortCols` restores the table's within-file clustering order in the
    * rewritten files (pass the table's cluster key so repeated delete
    * batches stay file-targeted instead of progressively scattering). */
  def deleteWhere(spark: SparkSession, path: String, pred: Column,
                  sortCols: Seq[String] = Nil): DeleteReport = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val top = fs.listStatus(root).toSeq
    val partDirs = top.filter(d => d.isDirectory && d.getPath.getName.contains("="))
    val partCols = partDirs.map(_.getPath.getName.split("=")(0)).distinct
    require(partCols.size <= 1,
      s"deleteWhere handles at most one partition level; found $partCols")
    partDirs.foreach { d =>
      val nested = fs.listStatus(d.getPath)
        .filter(x => x.isDirectory && x.getPath.getName.contains("="))
      require(nested.isEmpty,
        s"nested partition directories under ${d.getPath} are not supported")
    }
    def parquetCount(p: org.apache.hadoop.fs.Path): Int = {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val totalFiles = parquetCount(root)
    val matchP = coalesce(pred, lit(false))
    val all = spark.read.option("basePath", path).parquet(path)
    // ONE discovery scan yields both the affected file list and the
    // deleted-row count (per-file match counts) — no second pass over
    // the affected files just to count
    val perFile = all.where(matchP)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect()
    val affected = perFile.map(_.getString(0))
    val rowsDeleted = perFile.map(_.getLong(1)).sum
    if (affected.isEmpty) return DeleteReport(0, totalFiles, 0L)

    val aff = spark.read.option("basePath", path).parquet(affected.toSeq: _*)
    // keep FILE LOCALITY through the rewrite: grouping survivors by their
    // source file (plus restoring `sortCols` order within each output
    // file) preserves the clustering that made this delete targeted, so
    // the NEXT compliance batch still touches a file subset instead of
    // progressively degrading toward whole-table rewrites
    val keep = aff.where(!matchP).withColumn("__src", input_file_name())
    val tmp = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".delete.tmp")
    fs.delete(tmp, true)
    // leading the sort with the partition column lets the dynamic-
    // partition writer accept our ordering instead of re-sorting (which
    // would destroy the restored sortCols order)
    val sortKeys = (partCols ++ Seq("__src") ++ sortCols).map(col)
    val w = keep.repartition(affected.length, col("__src"))
      .sortWithinPartitions(sortKeys: _*)
      .drop("__src")
    (if (partCols.nonEmpty) w.write.partitionBy(partCols.head) else w.write)
      .mode("overwrite").parquet(tmp.toString)

    // swap: drop the originals, then move the rewritten files into place
    // (fresh task UUID file names — no collision with resident files)
    affected.foreach { f =>
      require(fs.delete(new org.apache.hadoop.fs.Path(f), false),
        s"failed to remove $f")
    }
    val qTmp = fs.makeQualified(tmp).toString
    val qRoot = fs.makeQualified(root)
    val it = fs.listFiles(tmp, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) {
        val rel = fs.makeQualified(f).toString.stripPrefix(qTmp).stripPrefix("/")
        val dst = new org.apache.hadoop.fs.Path(qRoot, rel)
        fs.mkdirs(dst.getParent)
        require(fs.rename(f, dst), s"failed to move $f into place")
      }
    }
    fs.delete(tmp, true)
    DeleteReport(affected.length, totalFiles, rowsDeleted)
  }

  /** Key-batch convenience (`keyCol IN keys`): the GDPR-batch shape.
    * `keys` is driver-side and config-sized (a compliance batch, not a
    * corpus) — for corpus-scale delete sets, express the set as a
    * predicate or run batched calls. */
  def deleteKeys(spark: SparkSession, path: String, keyCol: String,
                 keys: Seq[Any], sortCols: Seq[String] = Nil): DeleteReport = {
    require(keys.nonEmpty, "empty key batch")
    deleteWhere(spark, path, col(keyCol).isin(keys: _*), sortCols)
  }
}
