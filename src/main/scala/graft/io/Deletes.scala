package graft.io

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
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
  * moves the rewritten files in and only AFTERWARDS removes the
  * originals. Crash durability: an `_delete_inflight` marker (landed by
  * atomic rename before the first destructive action) records the
  * planned swap; every crash state leaves at least one complete copy of
  * every surviving row, and the next `deleteWhere` (or an explicit
  * [[recover]]) COMPLETES the interrupted swap from the marker instead
  * of discarding staged data. The only transient anomaly a crash can
  * leave is duplicate survivor rows (original + rewritten copy), which
  * recovery removes — never row loss.
  *
  * Concurrent READERS are still not isolated from the swap window —
  * single-writer maintenance semantics like [[Writers.compactFiles]] /
  * [[Compaction]]. For snapshot-isolated deletes use
  * [[Versioned.deleteWhere]], which lands the same rewrite as an atomic
  * manifest commit.
  *
  * NULL discipline: a row where the predicate evaluates NULL is NOT a
  * match — it is kept, not silently dropped (`coalesce(pred, false)` on
  * both the match count and the keep filter).
  */
object Deletes {

  final case class DeleteReport(filesTouched: Int, filesTotal: Int,
                                rowsDeleted: Long)

  private val markerName = "_delete_inflight"

  private def tmpPath(path: String) =
    new HPath(path.stripSuffix("/") + ".delete.tmp")

  /** Ordered partition-column spine of a Hive-layout directory tree:
    * every level's `col=value` directories must agree on the column name
    * and nest identically (ragged or mixed layouts are a corrupt table,
    * not a supported input). Empty for flat directories. */
  private def partitionSpine(fs: FileSystem, root: HPath): Seq[String] = {
    val dirs = fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.contains("=") &&
        !d.getPath.getName.startsWith("_") && !d.getPath.getName.startsWith("."))
    if (dirs.isEmpty) Nil
    else {
      val cols = dirs.map(_.getPath.getName.split("=")(0)).distinct
      require(cols.size == 1,
        s"inconsistent partition columns under $root: $cols")
      val subs = dirs.map(d => partitionSpine(fs, d.getPath)).distinct
      require(subs.size == 1,
        s"ragged partition nesting under $root: $subs")
      cols.head +: subs.head
    }
  }

  /** Complete an interrupted swap recorded in `_delete_inflight`:
    * staged files still in the tmp dir are moved in (a missing source
    * means that rename already happened — its destination must exist),
    * then the listed originals are removed, then marker + tmp dir are
    * cleared. Idempotent; called automatically at the start of every
    * [[deleteWhere]]. */
  def recover(spark: SparkSession, path: String): Boolean = {
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    recoverInflight(fs, root, path)
  }

  private def recoverInflight(fs: FileSystem, root: HPath,
                              path: String): Boolean = {
    val marker = new HPath(root, markerName)
    // a crashed marker WRITE leaves only the staging name — never a
    // half-written live marker (the rename below is the commit point)
    fs.delete(new HPath(root, markerName + ".staging"), false)
    if (!fs.exists(marker)) return false
    val in = fs.open(marker)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = text.split('\n').filter(_.nonEmpty)
    val originals = lines.collect { case l if l.startsWith("O\t") =>
      l.stripPrefix("O\t") }
    val moves = lines.collect { case l if l.startsWith("M\t") =>
      val Array(src, dst) = l.stripPrefix("M\t").split('\t'); (src, dst) }
    moves.foreach { case (src, dst) =>
      val s = new HPath(src); val d = new HPath(dst)
      if (fs.exists(s)) {
        fs.mkdirs(d.getParent)
        require(fs.rename(s, d), s"recovery failed to move $s")
      } else require(fs.exists(d),
        s"recovery: staged file $src vanished without reaching $dst")
    }
    originals.foreach { f =>
      val p = new HPath(f)
      if (fs.exists(p)) require(fs.delete(p, false), s"failed to remove $f")
    }
    require(fs.delete(marker, false), s"failed to clear $marker")
    fs.delete(tmpPath(path), true)
    true
  }

  /** Land the swap plan via write-to-staging + atomic rename: the marker
    * either exists complete or not at all. */
  private def writeMarker(fs: FileSystem, root: HPath,
                          originals: Seq[String],
                          moves: Seq[(String, String)]): HPath = {
    val staging = new HPath(root, markerName + ".staging")
    val marker = new HPath(root, markerName)
    val out = fs.create(staging, true)
    try {
      val body = (originals.map(o => s"O\t$o") ++
        moves.map { case (s, d) => s"M\t$s\t$d" }).mkString("\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    require(fs.rename(staging, marker), s"failed to land $marker")
    marker
  }

  /** Survivor rewrite shared by [[deleteWhere]] and
    * [[Versioned.deleteWhere]]: keep FILE LOCALITY through the rewrite by
    * grouping survivors by their source file (a working column whose name
    * is derived to never shadow table data) and restoring `sortCols`
    * order within each output file — the clustering that made the delete
    * targeted survives it, so the NEXT compliance batch still touches a
    * file subset instead of progressively degrading toward whole-table
    * rewrites. `partCols` lead the sort so a dynamic-partition writer
    * accepts the ordering instead of re-sorting. */
  private[io] def rewriteSurvivors(aff: org.apache.spark.sql.DataFrame,
      keepPred: Column, nFiles: Int, partCols: Seq[String],
      sortCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val srcCol = Iterator.from(0)
      .map(i => if (i == 0) "__src" else s"__src$i")
      .find(c => !aff.columns.contains(c)).get
    aff.where(keepPred).withColumn(srcCol, input_file_name())
      .repartition(nFiles, col(srcCol))
      .sortWithinPartitions((partCols ++ Seq(srcCol) ++ sortCols).map(col): _*)
      .drop(srcCol)
  }

  /** Delete rows matching `pred`. Handles flat directories and any depth
    * of Hive `col=value` partition directories (the [[Writers]]/[[Layout]]
    * layouts, including composites like `zb=` under a date level);
    * partition columns are preserved through the rewrite, and `sortCols`
    * restores the table's within-file clustering order in the rewritten
    * files (pass the table's cluster key so repeated delete batches stay
    * file-targeted instead of progressively scattering). */
  def deleteWhere(spark: SparkSession, path: String, pred: Column,
                  sortCols: Seq[String] = Nil): DeleteReport = {
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    recoverInflight(fs, root, path)
    val partCols = partitionSpine(fs, root)
    def parquetCount(p: HPath): Int = {
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
    // input_file_name returns a fully URI-ENCODED string; Hive-escaped
    // partition values (spaces, %) make the raw string unreadable as a
    // path (Spark's path parser decodes once more). Round-trip through
    // java.net.URI → Hadoop Path, whose toString is the form both the
    // FS layer and spark.read accept for every escaping case
    // (DeletesSpec pins a table with space/% partition values).
    val affected = perFile
      .map(r => new HPath(new java.net.URI(r.getString(0))).toString)
    val rowsDeleted = perFile.map(_.getLong(1)).sum
    if (affected.isEmpty) return DeleteReport(0, totalFiles, 0L)

    val aff = spark.read.option("basePath", path).parquet(affected.toSeq: _*)
    val tmp = tmpPath(path)
    fs.delete(tmp, true)
    val w = rewriteSurvivors(aff, !matchP, affected.length, partCols,
      sortCols)
    (if (partCols.nonEmpty) w.write.partitionBy(partCols: _*) else w.write)
      .mode("overwrite").parquet(tmp.toString)

    // plan the swap: every staged parquet file and its destination
    // (fresh task UUID file names — no collision with resident files)
    val qTmp = fs.makeQualified(tmp).toString
    val qRoot = fs.makeQualified(root)
    val moves = {
      val b = Seq.newBuilder[(String, String)]
      val it = fs.listFiles(tmp, true)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) {
          val q = fs.makeQualified(f)
          val rel = q.toString.stripPrefix(qTmp).stripPrefix("/")
          b += ((q.toString, new HPath(qRoot, rel).toString))
        }
      }
      b.result()
    }
    // land the plan, THEN act: rename the rewritten files in first (a
    // crash here leaves transient duplicate survivor rows, recoverable
    // from the marker), and only then delete the originals — no crash
    // state ever holds the last copy of a surviving row in a dir a retry
    // would wipe
    val qAffected = affected.map(f => fs.makeQualified(new HPath(f)).toString)
    writeMarker(fs, root, qAffected.toSeq, moves)
    moves.foreach { case (src, dst) =>
      val d = new HPath(dst)
      fs.mkdirs(d.getParent)
      require(fs.rename(new HPath(src), d), s"failed to move $src into place")
    }
    qAffected.foreach { f =>
      require(fs.delete(new HPath(f), false), s"failed to remove $f")
    }
    require(fs.delete(new HPath(root, markerName), false),
      "failed to clear the inflight marker")
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
