package graft.io

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-partition-directory small-file compaction — the shared engine
  * behind `Similarity.compactIvfIndex` (cell= dirs) and
  * [[Layout]] z-bucket compaction (zb= dirs): any layout that takes
  * dynamic appends accumulates ≥1 new parquet file per touched partition
  * per batch, so scan cost grows with APPEND COUNT instead of data size.
  * Directories over `maxFilesPerDir` are rewritten to one file each:
  * pruned read of only the hot partitions (cold ones are never listed or
  * read), one task per hot partition, per-directory swap via FS
  * rename. Row content is untouched, so reads return identical results
  * pre/post and partition pruning is preserved (IvfAppendSpec and
  * LayoutSpec both pin this on their layouts). Single-writer maintenance
  * semantics, like [[Writers.compactFiles]]; for snapshot-isolated
  * compaction use [[Versioned.compact]].
  *
  * Crash durability: the swap renames each live directory ASIDE (to an
  * underscore-prefixed name readers ignore), renames the staged
  * replacement in, then deletes the aside copy — every intermediate
  * crash state retains at least one complete copy of each partition, and
  * the next run's recovery pass either restores the aside copy (live dir
  * missing → the crash hit between the two renames) or clears it (live
  * dir present → the staged data already landed). */
object Compaction {

  private val asidePrefix = "_compact_old_"

  /** Aside name for a live partition dir. The dir name is percent-
    * ENCODED ('%' then '='): Spark's partition discovery ignores an
    * underscore-prefixed name only when it contains NO '=' (verified
    * against HadoopFSUtils.shouldFilterOutPathName in the Spark 4.1.2
    * jars) — a raw `_compact_old_cell=3` would be listed as a CONFLICTING
    * partition column and make the whole table unreadable for as long as
    * the aside exists (the crash window this protocol is for). The
    * encoding is reversible, so recovery can restore the exact name. */
  private[io] def asideName(dirName: String): String =
    asidePrefix + dirName.replace("%", "%25").replace("=", "%3D")

  private[io] def dirNameOfAside(aside: String): String =
    aside.stripPrefix(asidePrefix).replace("%3D", "=").replace("%25", "%")

  /** Heal any interrupted swap from a prior crashed run: an aside dir
    * with no live twin is renamed back (its data is the only copy); one
    * WITH a live twin is a leftover duplicate of already-landed data and
    * is removed. Idempotent; runs at the start of every
    * [[compactPartitionedDirs]]. */
  private def recoverAsides(fs: FileSystem, root: HPath): Unit = {
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(asidePrefix))
      .foreach { a =>
        val live = new HPath(root, dirNameOfAside(a.getPath.getName))
        if (!fs.exists(live))
          require(fs.rename(a.getPath, live),
            s"recovery failed to restore ${a.getPath}")
        else
          require(fs.delete(a.getPath, true),
            s"recovery failed to clear ${a.getPath}")
      }
  }

  /** PUBLIC crash recovery — run [[recoverAsides]] on a table whose last
    * maintenance job may have died mid-swap, WITHOUT waiting for the next
    * compaction pass to happen to run: a crash between the two renames
    * leaves a partition's only copy under the reader-ignored aside name,
    * and every read of that partition silently returns zero rows until
    * the aside is restored. [[Deletes.recover]] is the same contract for
    * the delete marker protocol; operators should run both after a
    * crashed maintenance job (idempotent, cheap — one directory listing
    * when there is nothing to heal). Returns true when anything was
    * restored or cleared. */
  def recover(spark: SparkSession, path: String): Boolean = {
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return false
    val had = fs.listStatus(root).exists(d =>
      d.isDirectory && d.getPath.getName.startsWith(asidePrefix))
    recoverAsides(fs, root)
    had
  }

  /** Compact every `partCol=value` directory under `path` whose parquet
    * file count exceeds `maxFilesPerDir`. `sortCols` restores the layout's
    * within-file order in the rewritten files (zv for the z-order layout
    * — compaction must not silently un-cluster what the writer sorted).
    * Returns the compacted partition values (directory-name strings,
    * sorted).
    *
    * Safety: a value whose directory name does not round-trip through
    * cast-to-string (URL-escaped characters, the null partition
    * `__HIVE_DEFAULT_PARTITION__`) would make the pruned read select
    * nothing while the swap replaces the live directory — data loss. The
    * null-partition dir is therefore skipped outright, and the swap
    * verifies the staged replacement EXISTS before touching the live
    * directory, so any other encoding mismatch aborts with nothing
    * destroyed. */
  def compactPartitionedDirs(spark: SparkSession, path: String,
                             partCol: String, maxFilesPerDir: Int,
                             sortCols: Seq[String] = Nil): Seq[String] = {
    require(maxFilesPerDir >= 1, "maxFilesPerDir must be ≥ 1")
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    recoverAsides(fs, root)
    val prefix = s"$partCol="
    val hot = fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(prefix))
      .filter(_.getPath.getName != s"${prefix}__HIVE_DEFAULT_PARTITION__")
      .filter { d =>
        fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) >
          maxFilesPerDir
      }
      .map(_.getPath.getName.stripPrefix(prefix))
      .sorted
    if (hot.nonEmpty) {
      val tmp = new HPath(path + "_compact_tmp")
      fs.delete(tmp, true)
      // pruned read built from the hot directories DIRECTLY (basePath
      // keeps the partition column): the previous full-table read +
      // partition filter re-listed EVERY partition directory through
      // InMemoryFileIndex on each trigger — a per-trigger discovery job
      // over the whole layout just to select the hot subset this function
      // already enumerated above (guide §6; the streaming sinks run this
      // every compactEvery epochs forever). Partition-type inference over
      // the hot subset equals the full listing's for the layouts this
      // serves (zb/cell — uniformly numeric dir names); a layout mixing
      // numeric and non-numeric values in ONE partition column would
      // infer differently and may not round-trip — the staging-existence
      // check below still aborts with nothing destroyed in that case.
      val pruned = spark.read.option("basePath", path)
        .parquet(hot.map(v => s"$path/$prefix$v"): _*)
        .repartition(hot.size, col(partCol))
      val ordered =
        if (sortCols.isEmpty) pruned
        else pruned.sortWithinPartitions((partCol +: sortCols).map(col): _*)
      ordered.write.partitionBy(partCol).mode("overwrite").parquet(tmp.toString)
      // verify EVERY staged dir exists before touching ANY live one — an
      // encoding mismatch must abort with zero destructive actions taken
      hot.foreach { v =>
        require(fs.exists(new HPath(tmp, s"$prefix$v")),
          s"compaction staging missing for $partCol=$v — the directory " +
            "name does not round-trip through cast-to-string; aborting " +
            "before touching live data")
      }
      // aside → in → drop aside: at every instant at least one complete
      // copy of the partition exists under a name recovery understands
      hot.foreach { v =>
        val src = new HPath(tmp, s"$prefix$v")
        val dst = new HPath(root, s"$prefix$v")
        val aside = new HPath(root, asideName(s"$prefix$v"))
        require(fs.rename(dst, aside), s"compaction aside failed for $partCol=$v")
        require(fs.rename(src, dst), s"compaction swap failed for $partCol=$v")
        require(fs.delete(aside, true), s"compaction cleanup failed for $partCol=$v")
      }
      fs.delete(tmp, true)
    }
    hot
  }
}
