package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal snapshot-versioned parquet table — the table-format kernel
  * (Delta/Iceberg's core idea) expressed engine-side: data files are
  * IMMUTABLE once written, and a numbered manifest lists exactly the files
  * belonging to each version. Readers resolve a manifest, never a
  * directory listing, so:
  *  - time travel = read an old manifest (q165);
  *  - snapshot isolation = a reader holding version N is untouched by any
  *    later commit (new files are invisible until their manifest lands);
  *  - commits are atomic at the manifest-file level (staging write +
  *    ATOMIC_MOVE rename), the same unit every real table format relies
  *    on.
  *
  * Layout: `<table>/data/c<N>/part-*.parquet` per commit,
  * `<table>/_versions/<N>` = newline-separated entry list. An entry is a
  * data DIR (whole-commit grain — append/overwrite commits) or an
  * individual parquet FILE (the grain [[deleteWhere]] and
  * [[compactSmallFiles]] need to retire a file subset while older
  * manifests keep resolving it). Manifests are metadata-sized; the
  * parquet reader accepts both grains directly.
  *
  * MAINTENANCE AS COMMITS (the transactional counterpart of
  * [[Deletes]]/[[Compaction]]'s directory-swap operations): a versioned
  * delete or compaction writes ONLY NEW files and lands a new manifest —
  * no live file is ever renamed or removed, so a reader pinned to
  * version N sees identical results before, during, and after the
  * operation, and a crash mid-operation leaves at worst an orphaned
  * data dir that [[vacuum]] clears. Physical removal of retired files is
  * deferred to [[vacuum]], the explicit retention boundary. */
object Versioned {

  private def versionsDir(table: String) = Paths.get(table, "_versions")

  def latestVersion(table: String): Int = {
    val d = versionsDir(table)
    if (!Files.exists(d)) 0
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toInt).foldLeft(0)(math.max)
  }

  private def manifestEntries(table: String, v: Int): Seq[String] =
    Files.readAllLines(versionsDir(table).resolve(v.toString),
      StandardCharsets.UTF_8).asScala.toSeq

  /** Land manifest `v` atomically: full write to a staging name, then an
    * ATOMIC_MOVE rename — a reader never observes a partial manifest and
    * a crash mid-write leaves only the staging file. */
  private def landManifest(table: String, v: Int,
                           entries: Seq[String]): Unit = {
    Files.createDirectories(versionsDir(table))
    val staging = versionsDir(table).resolve(s"$v.staging")
    Files.write(staging,
      entries.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(staging, versionsDir(table).resolve(v.toString),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Every parquet file a manifest entry resolves to, absolute paths
    * (dir entries enumerate their current listing; immutability of
    * committed dirs makes that deterministic until [[vacuum]]). */
  private def expandFiles(entry: String): Seq[String] = {
    val p = Paths.get(entry)
    if (Files.isDirectory(p))
      Files.walk(p).iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(_.toAbsolutePath.toString).toSeq.sorted
    else Seq(p.toAbsolutePath.toString)
  }

  private def fileOfUri(uri: String): String =
    Paths.get(new java.net.URI(uri)).toAbsolutePath.toString

  /** Append `df` as a new commit; returns the new version number.
    * `overwrite = true` starts the file list fresh (replace semantics). */
  def commit(df: DataFrame, table: String, overwrite: Boolean = false): Int = {
    val v = latestVersion(table) + 1
    val dataDir = Paths.get(table, "data", s"c$v").toString
    df.write.parquet(dataDir)
    val prev =
      if (overwrite || v == 1) Seq.empty
      else manifestEntries(table, v - 1)
    landManifest(table, v, prev :+ dataDir)
    v
  }

  /** Read the table as of `version` (defaults to latest). */
  def snapshot(spark: SparkSession, table: String,
               version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(table))
    require(v >= 1, s"no commits in $table")
    spark.read.parquet(manifestEntries(table, v): _*)
  }

  /** SNAPSHOT-ISOLATED row-level delete — [[Deletes.deleteWhere]]'s
    * file-targeted shape expressed as a manifest commit: one discovery
    * scan finds the affected files, ONLY their survivors are rewritten
    * into the next commit dir (file-locality preserved: survivors stay
    * grouped by source file, `sortCols` restores within-file order), and
    * the new manifest lists untouched files at file grain plus the new
    * dir. Nothing live is renamed or removed, so concurrent readers on
    * any pinned version are never exposed to a partial table and a crash
    * anywhere leaves every landed version fully readable. Returns the new
    * version (the current one when nothing matched — no empty commits).
    *
    * NULL discipline as [[Deletes.deleteWhere]]: a NULL-predicate row is
    * kept. */
  def deleteWhere(spark: SparkSession, table: String, pred: Column,
                  sortCols: Seq[String] = Nil): Int = {
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val allFiles = manifestEntries(table, v).flatMap(expandFiles).distinct
    val df = spark.read.parquet(allFiles: _*)
    val matchP = coalesce(pred, lit(false))
    val affected = df.where(matchP)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => fileOfUri(r.getString(0))).toSet
    if (affected.isEmpty) return v
    val aff = spark.read.parquet(affected.toSeq: _*)
    val srcCol = Iterator.from(0)
      .map(i => if (i == 0) "__src" else s"__src$i")
      .find(c => !aff.columns.contains(c)).get
    val newDir = Paths.get(table, "data", s"c${v + 1}").toString
    aff.where(!matchP).withColumn(srcCol, input_file_name())
      .repartition(affected.size, col(srcCol))
      .sortWithinPartitions((Seq(srcCol) ++ sortCols).map(col): _*)
      .drop(srcCol)
      .write.parquet(newDir)
    landManifest(table, v + 1,
      allFiles.filterNot(affected.contains) :+ newDir)
    v + 1
  }

  /** SNAPSHOT-ISOLATED small-file compaction — the OPTIMIZE commit:
    * files under `smallBytes` are coalesced (no shuffle — partition
    * concatenation preserves row order and clustering) into ~`smallBytes`
    * outputs in the next commit dir; the new manifest keeps every large
    * file at file grain and swaps the small ones for the new dir. Same
    * isolation story as [[deleteWhere]]: pinned readers never see the
    * transition; retired small files stay on disk for older versions
    * until [[vacuum]]. Returns the new version (current when <2 small
    * files — nothing to gain). */
  def compactSmallFiles(spark: SparkSession, table: String,
                        smallBytes: Long): Int = {
    require(smallBytes > 0, "smallBytes must be positive")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val allFiles = manifestEntries(table, v).flatMap(expandFiles).distinct
    val sized = allFiles.map(f => f -> Files.size(Paths.get(f)))
    val (small, big) = sized.partition(_._2 < smallBytes)
    if (small.size < 2) return v
    val nOut = math.max(1,
      math.ceil(small.map(_._2).sum.toDouble / smallBytes).toInt)
    val newDir = Paths.get(table, "data", s"c${v + 1}").toString
    spark.read.parquet(small.map(_._1): _*)
      .coalesce(nOut).write.parquet(newDir)
    landManifest(table, v + 1, big.map(_._1) :+ newDir)
    v + 1
  }

  /** Physically remove data files referenced by NO retained manifest and
    * drop manifests older than the retention window (the last
    * `retainLast` versions). This is the ONLY destructive operation in
    * the module — everything else strictly adds files; time travel below
    * the retention boundary stops working, by declaration, exactly like
    * Delta's VACUUM. Returns the removed file paths. */
  def vacuum(table: String, retainLast: Int = 1): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val keep = math.max(1, v - retainLast + 1) to v
    val referenced = keep.flatMap(k =>
      manifestEntries(table, k).flatMap(expandFiles)).toSet
    val dataRoot = Paths.get(table, "data")
    val removed = Seq.newBuilder[String]
    if (Files.exists(dataRoot)) {
      val all = Files.walk(dataRoot).iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(_.toAbsolutePath).toSeq
      all.filterNot(f => referenced.contains(f.toString)).foreach { f =>
        Files.delete(f); removed += f.toString
      }
      // prune commit dirs emptied of parquet files (crash-orphaned dirs
      // from an unlanded commit clear here too)
      Files.list(dataRoot).iterator().asScala.toSeq.foreach { d: Path =>
        if (Files.isDirectory(d) && !Files.walk(d).iterator().asScala
          .exists(f => Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))) {
          Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
        }
      }
    }
    (1 until keep.head).foreach { k =>
      Files.deleteIfExists(versionsDir(table).resolve(k.toString)): Unit
    }
    removed.result()
  }
}
