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

  /** Latest LANDED version — claim files (`<v>.claim`) and staging names
    * are ignored, so an in-flight or crashed commit never changes what
    * readers resolve. */
  def latestVersion(table: String): Int = {
    val d = versionsDir(table)
    if (!Files.exists(d)) 0
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toInt).foldLeft(0)(math.max)
  }

  /** OPTIMISTIC CONCURRENCY for the manifest log: atomically claim the
    * next version number via `Files.createFile` (CREATE_NEW semantics —
    * exactly one writer wins each number; a loser advances and retries),
    * so two concurrent commits can never both land the same manifest
    * with one silently replacing the other (rename(2) overwrites — the
    * single-writer caveat this removes). A claim whose writer dies
    * before landing leaves a numbered gap; [[awaitPredecessor]] bounds
    * how long a successor waits for it before failing loudly. */
  private def claimVersion(table: String): Int = {
    Files.createDirectories(versionsDir(table))
    var v = latestVersion(table) + 1
    while (true) {
      // also skip numbers another writer has claimed but not landed
      if (!Files.exists(versionsDir(table).resolve(v.toString))) {
        try {
          Files.createFile(versionsDir(table).resolve(s"$v.claim"))
          return v
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => ()
        }
      }
      v += 1
    }
    v // unreachable
  }

  /** Default bound on how long a commit waits for its predecessor's
    * manifest to land; override per commit for workloads whose single
    * commits legitimately run long (a large rewrite at real scale). */
  val defaultPredecessorTimeoutMs: Long = 120000L

  /** Wait for manifest v-1 to land (the claimer ahead of us is writing
    * its data files). A dead predecessor would hang the log, so the wait
    * is bounded: on timeout the commit FAILS LOUDLY (releasing its own
    * claim) rather than landing a manifest that silently omits the
    * predecessor's rows. */
  private def awaitPredecessor(table: String, v: Int,
                               timeoutMs: Long): Unit = {
    if (v == 1) return
    val prev = versionsDir(table).resolve((v - 1).toString)
    val t0 = System.nanoTime()
    while (!Files.exists(prev)) {
      if ((System.nanoTime() - t0) / 1000000 > timeoutMs)
        throw new IllegalStateException(
          s"manifest ${v - 1} of $table has not landed within $timeoutMs " +
            "ms of being claimed. If that writer is STILL RUNNING (a " +
            "slow large commit), retry with a larger " +
            "predecessorTimeoutMs — do NOT remove its claim file. Only " +
            s"after confirming the writer is dead: verify data/c${v - 1} " +
            "is orphaned, remove both, and retry — removing a LIVE " +
            "writer's claim lets two commits land the same version, " +
            "silently dropping one")
      Thread.sleep(50)
    }
  }

  private def manifestEntries(table: String, v: Int): Seq[String] =
    Files.readAllLines(versionsDir(table).resolve(v.toString),
      StandardCharsets.UTF_8).asScala.toSeq

  /** Version numbers of all claim files currently present. */
  private def claimNumbers(table: String): Seq[Int] =
    Files.list(versionsDir(table)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".claim") &&
        n.stripSuffix(".claim").nonEmpty &&
        n.stripSuffix(".claim").forall(_.isDigit))
      .map(_.stripSuffix(".claim").toInt).toSeq.sorted

  /** Land manifest `v` atomically and CREATE-NEW: the full content goes
    * to a PER-WRITER staging name (a shared name would let one racer
    * truncate another's bytes mid-move), then a hard link claims the
    * target — link(2) fails atomically if the target exists, so even two
    * writers holding the same number (an operator cleared a LIVE
    * writer's claim) can never silently replace a landed manifest; the
    * loser gets a loud error. A reader never observes a partial
    * manifest; a crash mid-land leaves only a staging file. */
  private def landManifest(table: String, v: Int,
                           entries: Seq[String]): Unit = {
    Files.createDirectories(versionsDir(table))
    val target = versionsDir(table).resolve(v.toString)
    val staging = versionsDir(table).resolve(
      s"$v.staging.${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(staging,
      entries.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try Files.createLink(target, staging)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(staging)
        throw new IllegalStateException(
          s"manifest $v of $table already exists — refusing to replace a " +
            "landed commit (was a live writer's claim file removed?)")
    }
    Files.deleteIfExists(staging): Unit
  }

  /** Release a claimed version after an IN-PROCESS failure: remove the
    * partial data dir (best-effort) and the claim file, so the number can
    * be re-claimed and the log never wedges on a failed write — a
    * successor blocked in [[awaitPredecessor]] unblocks as soon as a new
    * writer re-claims and lands the number. (A hard JVM crash still
    * leaks its claim; the awaitPredecessor error documents the manual
    * recovery.)
    *
    * If manifest `v` EXISTS, the data dir is NOT touched: that means a
    * second writer held the same number (a cleared live claim) and
    * LANDED it — this writer's failure must not destroy the directory
    * that landed manifest references. */
  private def abandonClaim(table: String, v: Int, dataDir: Path): Unit = {
    val landed = Files.exists(versionsDir(table).resolve(v.toString))
    try {
      if (!landed && Files.exists(dataDir))
        Files.walk(dataDir).iterator().asScala.toSeq.reverse
          .foreach(f => Files.deleteIfExists(f): Unit)
    } catch { case _: Exception => () } // best-effort; vacuum sweeps later
    Files.deleteIfExists(versionsDir(table).resolve(s"$v.claim")): Unit
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
    * `overwrite = true` starts the file list fresh (replace semantics).
    *
    * Concurrency: the version number is CLAIMED atomically before any
    * write, and the entry list is built from the predecessor manifest
    * AFTER it lands — concurrent appends serialize into consecutive
    * versions, each containing all prior commits; none is ever silently
    * replaced (VersionedSpec races N threads and checks every commit's
    * rows survive into the final snapshot). */
  def commit(df: DataFrame, table: String, overwrite: Boolean = false,
             predecessorTimeoutMs: Long = defaultPredecessorTimeoutMs): Int = {
    val v = claimVersion(table)
    val dataDir = Paths.get(table, "data", s"c$v")
    try {
      df.write.parquet(dataDir.toString)
      awaitPredecessor(table, v, predecessorTimeoutMs)
      val prev =
        if (overwrite || v == 1) Seq.empty
        else manifestEntries(table, v - 1)
      landManifest(table, v, prev :+ dataDir.toString)
    } catch {
      case t: Throwable => abandonClaim(table, v, dataDir); throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$v.claim"))
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
  /** Claim the next version for a MAINTENANCE commit (delete/compaction):
    * unlike an append, a maintenance commit REWRITES part of the base
    * snapshot's file list, so its base must still be the immediate
    * predecessor at claim time — a commit that landed in between means
    * the rewritten list is stale, and the operation aborts with a
    * conflict error (the caller re-reads and retries) instead of
    * landing a manifest that silently drops the interleaved commit. */
  private def claimMaintenance(table: String, base: Int): Int = {
    val v = claimVersion(table)
    if (v != base + 1) {
      Files.deleteIfExists(versionsDir(table).resolve(s"$v.claim"))
      throw new java.util.ConcurrentModificationException(
        s"maintenance on $table based on version $base lost the race " +
          s"(next free version is $v) — re-read the snapshot and retry")
    }
    v
  }

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
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      Deletes.rewriteSurvivors(aff, !matchP, affected.size, Nil, sortCols)
        .write.parquet(newDir.toString)
      // an all-matching delete leaves survivors empty and the commit dir
      // without data files — listing it in the manifest would make the
      // snapshot unreadable; and a manifest with NO entries at all is not
      // representable (snapshot has no schema to return)
      val survived = expandFiles(newDir.toString).nonEmpty
      val entries = allFiles.filterNot(affected.contains) ++
        (if (survived) Seq(newDir.toString) else Nil)
      require(entries.nonEmpty,
        s"deleteWhere would remove EVERY row of $table — a manifest " +
          "cannot represent a schema-less empty table; land an explicit " +
          "empty frame via commit(emptyDf, overwrite = true) instead")
      landManifest(table, nv, entries)
    } catch {
      case t: Throwable => abandonClaim(table, nv, newDir); throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    nv
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
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      spark.read.parquet(small.map(_._1): _*)
        .coalesce(nOut).write.parquet(newDir.toString)
      landManifest(table, nv, big.map(_._1) :+ newDir.toString)
    } catch {
      case t: Throwable => abandonClaim(table, nv, newDir); throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    nv
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
    // an IN-FLIGHT commit (claim above the latest landed version) has a
    // data dir no manifest references YET — the unreferenced-file sweep
    // below would destroy the data its manifest is about to reference.
    // Refuse loudly; run vacuum after it lands (or clear claims whose
    // writers are confirmed dead). Check-then-act caveat: a writer
    // claiming AFTER this check can still race the sweep (the deletion
    // list is re-checked against claims once more below to narrow the
    // window), so vacuum carries the same single-maintenance-writer
    // discipline as the directory-swap operations — run it from the
    // table's maintenance owner, not concurrently with ingest.
    def inflightClaims(): Seq[Int] = claimNumbers(table).filter(_ > v)
    val inflight = inflightClaims()
    require(inflight.isEmpty,
      s"vacuum refused: in-flight commit claim(s) ${inflight.mkString(", ")} " +
        s"on $table — their data dirs are not yet manifest-referenced and " +
        "would be destroyed; vacuum after they land, or clear the claims " +
        "of writers confirmed dead")
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
      val toDelete = all.filterNot(f => referenced.contains(f.toString))
      // second look after enumerating the deletion list: a commit that
      // claimed while we walked would lose its files to the sweep
      val late = inflightClaims()
      require(late.isEmpty,
        s"vacuum aborted before deleting anything: commit claim(s) " +
          s"${late.mkString(", ")} appeared during the file walk")
      toDelete.foreach { f =>
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
    // orphaned claims of writers that died before landing: any claim at
    // or below the latest LANDED version can never land (the number is
    // burned), and its data dir was cleared by the walk above; staging
    // leftovers from crashed manifest lands clear the same way
    claimNumbers(table).filter(_ <= v).foreach { k =>
      Files.deleteIfExists(versionsDir(table).resolve(s"$k.claim")): Unit
    }
    Files.list(versionsDir(table)).iterator().asScala.toSeq
      .filter(_.getFileName.toString.contains(".staging"))
      .foreach(Files.deleteIfExists(_): Unit)
    removed.result()
  }
}
