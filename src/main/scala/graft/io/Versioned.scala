package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-versioned parquet table — the table-format kernel
  * (Delta/Iceberg's core idea) expressed engine-side: data files are
  * IMMUTABLE once written, and a numbered manifest lists exactly the files
  * belonging to each version. Readers resolve a manifest, never a
  * directory listing, so:
  *  - time travel = read an old manifest (q165);
  *  - snapshot isolation = a reader holding version N is untouched by any
  *    later commit (new files are invisible until their manifest lands);
  *  - commits are atomic at the manifest-file level (one rename-sized
  *    write), the same unit every real table format relies on.
  *
  * Layout: `<table>/data/c<N>/part-*.parquet` per commit,
  * `<table>/_versions/<N>` = newline-separated data-dir list. Manifests
  * are metadata-sized (one line per commit dir here; one per file in a
  * real format — the q147 zone-map argument for why driver-side manifest
  * work is the right planning cost at 100 TB). */
object Versioned {

  private def versionsDir(table: String) = Paths.get(table, "_versions")

  def latestVersion(table: String): Int = {
    val d = versionsDir(table)
    if (!Files.exists(d)) 0
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString.toInt).foldLeft(0)(math.max)
  }

  /** Append `df` as a new commit; returns the new version number.
    * `overwrite = true` starts the file list fresh (replace semantics). */
  def commit(df: DataFrame, table: String, overwrite: Boolean = false): Int = {
    val v = latestVersion(table) + 1
    val dataDir = Paths.get(table, "data", s"c$v").toString
    df.write.parquet(dataDir)
    val prev =
      if (overwrite || v == 1) Seq.empty
      else Files.readAllLines(versionsDir(table).resolve((v - 1).toString),
        StandardCharsets.UTF_8).asScala.toSeq
    Files.createDirectories(versionsDir(table))
    Files.write(versionsDir(table).resolve(v.toString),
      (prev :+ dataDir).mkString("\n").getBytes(StandardCharsets.UTF_8))
    v
  }

  /** Read the table as of `version` (defaults to latest). */
  def snapshot(spark: SparkSession, table: String,
               version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(table))
    require(v >= 1, s"no commits in $table")
    val dirs = Files.readAllLines(versionsDir(table).resolve(v.toString),
      StandardCharsets.UTF_8).asScala.toSeq
    spark.read.parquet(dirs: _*)
  }
}
