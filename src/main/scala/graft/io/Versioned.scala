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
  * manifests keep resolving it), optionally carrying a PARTITION VALUE
  * ([[commitPartitioned]] — [[snapshotWhere]] then prunes files from the
  * manifest alone, the Delta/Iceberg metadata-pruning model the zb=/cell=
  * layouts compose with). A `#tag=` header line records an idempotency
  * tag atomically with the commit (the streaming sink's exactly-once
  * epoch boundary). Manifests are metadata-sized; the parquet reader
  * accepts both grains directly.
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

  /** Every `Files.list`/`Files.walk` call site drains the stream into a
    * materialized Seq inside try/finally close — the NIO streams hold a
    * directory file descriptor until closed, and the streaming sinks run
    * this machinery every micro-batch for the lifetime of the ingest, so
    * leaking one FD per call is an exhaustion bug, not a style nit. */
  private def listDir(d: Path): Seq[Path] = {
    val s = Files.list(d)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def walkDir(d: Path): Seq[Path] = {
    val s = Files.walk(d)
    try s.iterator().asScala.toSeq finally s.close()
  }

  // --- manifest line format ---
  //
  // A manifest is newline-separated lines, oldest format first:
  //   <path>                      data dir or parquet file (whole grain)
  //   <path>\t<col>=<value>       parquet FILE carrying its partition
  //                               value — the grain [[commitPartitioned]]
  //                               writes so reads can prune FILES by
  //                               partition value from the manifest alone
  //                               (no Hive directory listing — the
  //                               Delta/Iceberg metadata-pruning model)
  //   #key=value                  header comment (e.g. the idempotency
  //                               tag [[commit]] records); never a path
  // Paths may not contain tabs or leading '#'; partition values are
  // stored exactly as the writer's partition-directory segment encodes
  // them (Spark's Hive escaping), so they round-trip verbatim.

  // An entry line is `path` plus tab-separated `key=value` metadata
  // fields: a plain `col=value` pair is the file's PARTITION value
  // ([[commitPartitioned]]); an `s:col=min..max` pair is a FILE STAT
  // (long-valued inclusive range — the Delta/Iceberg data-skipping
  // model: [[snapshotRange]] prunes files whose range cannot intersect a
  // predicate, no footer reads, no directory listing).
  private def parseEntryAll(line: String): (String, Seq[(String, String)]) = {
    val parts = line.split('\t')
    (parts.head, parts.tail.toSeq.map { meta =>
      val eq = meta.indexOf('=')
      (meta.substring(0, eq), meta.substring(eq + 1))
    })
  }

  private def parseEntry(line: String): (String, Option[(String, String)]) = {
    val (path, metas) = parseEntryAll(line)
    (path, metas.find(!_._1.startsWith("s:")))
  }

  private def formatEntry(path: String,
                          meta: Option[(String, String)]): String =
    formatEntryAll(path, meta.toSeq)

  private def formatEntryAll(path: String,
                             metas: Seq[(String, String)]): String =
    (path +: metas.map { case (k, v) => s"$k=$v" }).mkString("\t")

  /** Latest LANDED version — claim files (`<v>.claim`) and staging names
    * are ignored, so an in-flight or crashed commit never changes what
    * readers resolve. */
  def latestVersion(table: String): Int = {
    val d = versionsDir(table)
    if (!Files.exists(d)) 0
    else listDir(d)
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

  private def manifestLines(table: String, v: Int): Seq[String] =
    Files.readAllLines(versionsDir(table).resolve(v.toString),
      StandardCharsets.UTF_8).asScala.toSeq

  /** Path-bearing manifest lines of version `v` (header comments
    * filtered; partition metadata retained on each line). */
  private def manifestEntries(table: String, v: Int): Seq[String] =
    manifestLines(table, v).filterNot(_.startsWith("#"))

  /** The idempotency tag recorded in version `v`'s manifest header, if
    * any — landed atomically WITH the entry list (one file, one
    * CREATE-NEW link), so a tag can never exist without its commit or
    * vice versa. */
  def versionTag(table: String, v: Int): Option[String] =
    manifestLines(table, v).find(_.startsWith("#tag="))
      .map(_.stripPrefix("#tag="))

  /** Largest numeric suffix among landed tags with the given prefix
    * (e.g. prefix "epoch:" over tags "epoch:7") — the streaming sink's
    * replay boundary, resolved ONCE at stream (re)start. */
  def latestTaggedSuffix(table: String, prefix: String): Option[Long] = {
    val v = latestVersion(table)
    if (v < 1) None
    else (1 to v).iterator
      .filter(k => Files.exists(versionsDir(table).resolve(k.toString)))
      .flatMap(k => versionTag(table, k))
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
      .foldLeft(Option.empty[Long])((m, x) => Some(math.max(m.getOrElse(x), x)))
  }

  /** Version numbers of all claim files currently present. */
  private def claimNumbers(table: String): Seq[Int] =
    listDir(versionsDir(table))
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".claim") &&
        n.stripSuffix(".claim").nonEmpty &&
        n.stripSuffix(".claim").forall(_.isDigit))
      .map(_.stripSuffix(".claim").toInt).sorted

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
        walkDir(dataDir).reverse
          .foreach(f => Files.deleteIfExists(f): Unit)
    } catch { case _: Exception => () } // best-effort; vacuum sweeps later
    Files.deleteIfExists(versionsDir(table).resolve(s"$v.claim")): Unit
  }

  /** Every (parquet file, metadata fields) pair a manifest entry
    * resolves to, absolute paths (dir entries enumerate their current
    * listing; immutability of committed dirs makes that deterministic
    * until [[vacuum]]). Dir-grain entries carry no metadata. */
  private def expandEntryAll(entry: String): Seq[(String, Seq[(String, String)])] = {
    val (path, metas) = parseEntryAll(entry)
    val p = Paths.get(path)
    if (Files.isDirectory(p))
      walkDir(p)
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => (f.toAbsolutePath.toString, Seq.empty[(String, String)]))
        .sortBy(_._1)
    else Seq((p.toAbsolutePath.toString, metas))
  }

  private def expandEntry(entry: String): Seq[(String, Option[(String, String)])] =
    expandEntryAll(entry).map { case (f, metas) =>
      (f, metas.find(!_._1.startsWith("s:")))
    }

  private def expandFiles(entry: String): Seq[String] =
    expandEntryAll(entry).map(_._1)

  /** Per-file long-valued min/max stats for `cols` over the given
    * parquet files — ONE scan grouped by input_file_name, metadata-sized
    * result (the Delta write-time stats model as a post-write pass).
    * All-null columns in a file yield no stat (conservatively kept by
    * [[snapshotRange]]). Columns must cast to long (integral keys,
    * dates, z-values). */
  private def fileStats(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): Map[String, Seq[(String, String)]] = {
    if (cols.isEmpty || files.isEmpty) return Map.empty
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__mn_$c"),
      max(col(c).cast("long")).as(s"__mx_$c")))
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val f = fileOfUri(r.getString(0))
        f -> cols.flatMap { c =>
          val mn = r.getAs[Any](s"__mn_$c")
          val mx = r.getAs[Any](s"__mx_$c")
          if (mn == null || mx == null) Nil
          else Seq((s"s:$c", s"$mn..$mx"))
        }
      }.toMap
  }

  /** Manifest lines for a freshly written commit dir: file grain when
    * partition metadata or stats are requested (each line carrying
    * `partCol=value` from its `__pv=` dir segment and `s:col=min..max`
    * ranges), dir grain otherwise. */
  private def commitEntries(spark: SparkSession, dataDir: Path,
      partCol: Option[String], statsCols: Seq[String]): Seq[String] = {
    if (partCol.isEmpty && statsCols.isEmpty) return Seq(dataDir.toString)
    val files = walkDir(dataDir)
      .filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map(_.toAbsolutePath).sortBy(_.toString)
    val stats = fileStats(spark, files.map(_.toString), statsCols)
    files.map { f =>
      val part = partCol.map { c =>
        val seg = f.getParent.getFileName.toString
        require(seg.startsWith(partDirCol + "="),
          s"partitioned commit file $f not under a $partDirCol= dir")
        (c, seg.stripPrefix(partDirCol + "="))
      }
      formatEntryAll(f.toString,
        part.toSeq ++ stats.getOrElse(f.toString, Nil))
    }
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
  /** `statsCols`: record per-file min/max (long-valued) for these columns
    * in the manifest — [[snapshotRange]] then prunes FILES by range
    * predicate from metadata alone (the Delta/Iceberg data-skipping
    * model). Entries switch to file grain when stats are requested. */
  def commit(df: DataFrame, table: String, overwrite: Boolean = false,
             predecessorTimeoutMs: Long = defaultPredecessorTimeoutMs,
             tag: Option[String] = None,
             statsCols: Seq[String] = Nil): Int =
    commitWith(table, overwrite, predecessorTimeoutMs, tag) { dataDir =>
      df.write.parquet(dataDir.toString)
      commitEntries(df.sparkSession, dataDir, None, statsCols)
    }

  /** Append `df` as a new commit whose manifest entries carry PARTITION
    * METADATA: the commit dir is written Hive-partitioned on an internal
    * copy of `partCol` (so every data file RETAINS the original column),
    * and each file's manifest line records its `partCol=value`. Reads
    * via [[snapshotWhere]] then prune FILES from the manifest alone —
    * no directory listing, no Hive-layout coupling — which is what lets
    * the zb=/cell= layouts ([[Layout]], `Similarity`) commit appends and
    * maintenance as snapshot-isolated versions instead of directory
    * swaps. NULL partition values abort the write (a null would vanish
    * into the default partition and silently miss every pruned read —
    * the same guard as the z-layout's). */
  def commitPartitioned(df: DataFrame, table: String, partCol: String,
      overwrite: Boolean = false,
      predecessorTimeoutMs: Long = defaultPredecessorTimeoutMs,
      tag: Option[String] = None,
      statsCols: Seq[String] = Nil): Int =
    commitWith(table, overwrite, predecessorTimeoutMs, tag) { dataDir =>
      df.withColumn(partDirCol,
          when(col(partCol).isNull, raise_error(lit(
            s"NULL $partCol — a null partition value would vanish from " +
              "every pruned snapshot read")))
            .otherwise(col(partCol).cast("string")))
        .write.partitionBy(partDirCol).parquet(dataDir.toString)
      commitEntries(df.sparkSession, dataDir, Some(partCol), statsCols)
    }

  /** The internal Hive-dir column [[commitPartitioned]] writes — a COPY
    * of the caller's partition column, so the original stays IN the data
    * files (manifest-pruned reads never reconstruct columns from paths). */
  private val partDirCol = "__pv"

  /** Shared claim → write → land skeleton of [[commit]] /
    * [[commitPartitioned]]; `write` produces the new manifest entries. */
  private def commitWith(table: String, overwrite: Boolean,
      predecessorTimeoutMs: Long, tag: Option[String])
      (write: Path => Seq[String]): Int = {
    val v = claimVersion(table)
    val dataDir = Paths.get(table, "data", s"c$v")
    try {
      val newEntries = write(dataDir)
      awaitPredecessor(table, v, predecessorTimeoutMs)
      val prev =
        if (overwrite || v == 1) Seq.empty
        else manifestEntries(table, v - 1)
      landManifest(table, v,
        tag.map(t => s"#tag=$t").toSeq ++ prev ++ newEntries)
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
    spark.read.parquet(manifestEntries(table, v).map(parseEntry(_)._1): _*)
  }

  /** Read the snapshot PRUNED to the files whose manifest metadata says
    * `partCol` ∈ `values` — the manifest-as-index read: file selection is
    * metadata-only (no directory listing, no partition discovery), so a
    * z-box read or an IVF probe over a versioned layout touches exactly
    * the files of the requested buckets/cells at any table size. Entries
    * WITHOUT metadata for `partCol` (plain commits mixed into the table)
    * are kept conservatively — correctness never depends on the pruning.
    * `values` are compared against the writer's directory-segment
    * encoding (identical to the raw value for numeric layouts). */
  def snapshotWhere(spark: SparkSession, table: String, partCol: String,
                    values: Set[String],
                    version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(table))
    require(v >= 1, s"no commits in $table")
    val kept = manifestEntries(table, v).flatMap(expandEntry).collect {
      case (f, Some((c, pv))) if c == partCol && values.contains(pv) => f
      case (f, meta) if !meta.exists(_._1 == partCol) => f
    }
    if (kept.isEmpty)
      snapshot(spark, table, v).where(lit(false))
    else spark.read.parquet(kept.distinct: _*)
  }

  /** Read the snapshot PRUNED by FILE STATS: keep only files whose
    * recorded `s:col=min..max` range can intersect [lo, hi] — range
    * data-skipping on a NON-partition column from the manifest alone,
    * the other half of the Delta/Iceberg metadata-pruning model next to
    * [[snapshotWhere]]'s partition pruning. Files without a stat for
    * `column` (dir-grain commits, all-null files) are kept
    * conservatively — correctness never depends on the pruning; the
    * caller applies the exact predicate on top. */
  def snapshotRange(spark: SparkSession, table: String, column: String,
                    lo: Long, hi: Long,
                    version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(table))
    require(v >= 1, s"no commits in $table")
    val key = s"s:$column"
    val kept = manifestEntries(table, v).flatMap(expandEntryAll).collect {
      case (f, metas) =>
        metas.find(_._1 == key) match {
          case Some((_, rng)) =>
            val i = rng.indexOf("..")
            val (mn, mx) = (rng.substring(0, i).toLong,
              rng.substring(i + 2).toLong)
            if (mx >= lo && mn <= hi) Some(f) else None
          case None => Some(f)
        }
    }.flatten
    if (kept.isEmpty)
      snapshot(spark, table, v).where(lit(false))
    else spark.read.parquet(kept.distinct: _*)
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
    val allEntries = manifestEntries(table, v).flatMap(expandEntryAll)
      .distinctBy(_._1)
    val allFiles = allEntries.map(_._1)
    val df = spark.read.parquet(allFiles: _*)
    val matchP = coalesce(pred, lit(false))
    val affected = df.where(matchP)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => fileOfUri(r.getString(0))).toSet
    if (affected.isEmpty) return v
    val aff = spark.read.parquet(affected.toSeq: _*)
    // METADATA PRESERVATION through the rewrite: when every affected file
    // carries partition metadata on one column, the survivors are
    // rewritten partitioned on it; stat columns present on EVERY affected
    // file are recomputed for the rewritten files — a compliance delete
    // on a versioned z-layout/IVF/stats table keeps [[snapshotWhere]] and
    // [[snapshotRange]] pruning intact (untouched files keep their
    // original metadata lines verbatim either way).
    val affectedMetas = allEntries.filter(e => affected.contains(e._1))
    val partMetaCol = affectedMetas
      .map(_._2.collectFirst { case (k, _) if !k.startsWith("s:") => k })
      .distinct match {
      case Seq(Some(c)) => Some(c)
      case _ => None
    }
    val statCols = affectedMetas
      .map(_._2.collect { case (k, _) if k.startsWith("s:") =>
        k.stripPrefix("s:") }.toSet)
      .reduceOption(_ intersect _).getOrElse(Set.empty).toSeq.sorted
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      val survivors =
        Deletes.rewriteSurvivors(aff, !matchP, affected.size, Nil, sortCols)
      val newEntries = partMetaCol match {
        case Some(c) =>
          survivors.withColumn(partDirCol, col(c).cast("string"))
            .write.partitionBy(partDirCol).parquet(newDir.toString)
          commitEntries(spark, newDir, Some(c), statCols)
        case None if statCols.nonEmpty =>
          survivors.write.parquet(newDir.toString)
          commitEntries(spark, newDir, None, statCols)
        case None =>
          survivors.write.parquet(newDir.toString)
          // an all-matching delete leaves survivors empty and the commit
          // dir without data files — listing it in the manifest would make
          // the snapshot unreadable; and a manifest with NO entries at all
          // is not representable (snapshot has no schema to return)
          if (expandFiles(newDir.toString).nonEmpty) Seq(newDir.toString)
          else Nil
      }
      val entries = allEntries.filterNot(e => affected.contains(e._1))
        .map((formatEntryAll _).tupled) ++ newEntries
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
  /** `sortCols`: within-file order restored in the PARTITIONED rewrite
    * path (a z-layout's zv clustering must survive its own OPTIMIZE);
    * the plain coalesce path preserves row order by construction. */
  def compactSmallFiles(spark: SparkSession, table: String,
                        smallBytes: Long,
                        sortCols: Seq[String] = Nil): Int = {
    require(smallBytes > 0, "smallBytes must be positive")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val allEntries = manifestEntries(table, v).flatMap(expandEntryAll)
      .distinctBy(_._1)
    val sized = allEntries.map { case (f, metas) =>
      (f, metas, Files.size(Paths.get(f)))
    }
    val (small, big) = sized.partition(_._3 < smallBytes)
    if (small.size < 2) return v
    val nOut = math.max(1,
      math.ceil(small.map(_._3).sum.toDouble / smallBytes).toInt)
    // as in [[deleteWhere]]: uniform single-column partition metadata on
    // the small files → the compacted replacement is rewritten per
    // partition value (shuffle at small-file grain — each value's rows
    // coalesce into one output); stat columns present on EVERY small
    // file are recomputed for the replacements — manifest pruning
    // survives the OPTIMIZE on both axes. Mixed/absent metadata falls
    // back to the order-preserving coalesce (no shuffle).
    val partMetaCol = small
      .map(_._2.collectFirst { case (k, _) if !k.startsWith("s:") => k })
      .distinct match {
      case Seq(Some(c)) => Some(c)
      case _ => None
    }
    val statCols = small
      .map(_._2.collect { case (k, _) if k.startsWith("s:") =>
        k.stripPrefix("s:") }.toSet)
      .reduceOption(_ intersect _).getOrElse(Set.empty).toSeq.sorted
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      val sm = spark.read.parquet(small.map(_._1): _*)
      val newEntries = partMetaCol match {
        case Some(c) =>
          sm.repartition(math.max(nOut, 1), col(c))
            .sortWithinPartitions((c +: sortCols).map(col): _*)
            .withColumn(partDirCol, col(c).cast("string"))
            .write.partitionBy(partDirCol).parquet(newDir.toString)
          commitEntries(spark, newDir, Some(c), statCols)
        case None if statCols.nonEmpty =>
          sm.coalesce(nOut).write.parquet(newDir.toString)
          commitEntries(spark, newDir, None, statCols)
        case None =>
          sm.coalesce(nOut).write.parquet(newDir.toString)
          Seq(newDir.toString)
      }
      landManifest(table, nv,
        big.map(e => formatEntryAll(e._1, e._2)) ++ newEntries)
    } catch {
      case t: Throwable => abandonClaim(table, nv, newDir); throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    nv
  }

  /** Physically remove data files referenced by NO retained manifest and
    * drop manifests older than the retention window. This is the ONLY
    * destructive operation in the module — everything else strictly adds
    * files; time travel below the retention boundary stops working, by
    * declaration, exactly like Delta's VACUUM. Returns the removed file
    * paths.
    *
    * Retention is the UNION of two windows: the last `retainLast`
    * versions by count, plus (when `olderThanMs >= 0`) every version
    * whose manifest landed within the last `olderThanMs` milliseconds —
    * the "retain 7 days" policy real operators set (versions land in
    * number order, so the time-retained set is always a suffix and the
    * kept range stays contiguous). `olderThanMs < 0` disables the time
    * window (count-only, the original behavior).
    *
    * `dryRun = true` REPORTS the files the sweep would remove and
    * performs NO destructive action of any kind — no file deletes, no
    * manifest drops, no claim/staging cleanup — so an operator can
    * review the plan before the one destructive operation here. */
  def vacuum(table: String, retainLast: Int = 1,
             olderThanMs: Long = -1L, dryRun: Boolean = false): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    // an IN-FLIGHT commit (claim above the latest landed version) has a
    // data dir no manifest references YET — the unreferenced-file sweep
    // below would destroy the data its manifest is about to reference.
    // Refuse loudly; run vacuum after it lands (or clear claims whose
    // writers are confirmed dead). Check-then-act caveat narrowed to
    // closed: the deletion list is fixed by the walk BELOW, a claim filed
    // before the walk is caught by the re-check AFTER it, and a claim
    // filed after the re-check writes its files after the list was fixed
    // — so the sweep itself cannot eat an in-flight commit's data files.
    // The empty-dir prune at the end re-reads claims separately (its
    // hazard window is its own).
    def inflightClaims(): Seq[Int] = claimNumbers(table).filter(_ > v)
    val inflight = inflightClaims()
    require(inflight.isEmpty,
      s"vacuum refused: in-flight commit claim(s) ${inflight.mkString(", ")} " +
        s"on $table — their data dirs are not yet manifest-referenced and " +
        "would be destroyed; vacuum after they land, or clear the claims " +
        "of writers confirmed dead")
    val countHead = math.max(1, v - retainLast + 1)
    val keepHead =
      if (olderThanMs < 0) countHead
      else {
        val cutoff = System.currentTimeMillis() - olderThanMs
        val timeHead = (1 to v).find { k =>
          val m = versionsDir(table).resolve(k.toString)
          Files.exists(m) && Files.getLastModifiedTime(m).toMillis >= cutoff
        }.getOrElse(v)
        math.min(countHead, timeHead)
      }
    val keep = keepHead to v
    val referenced = keep.flatMap(k =>
      manifestEntries(table, k).flatMap(expandFiles)).toSet
    val dataRoot = Paths.get(table, "data")
    val removed = Seq.newBuilder[String]
    if (Files.exists(dataRoot)) {
      val all = walkDir(dataRoot)
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(_.toAbsolutePath)
      val toDelete = all.filterNot(f => referenced.contains(f.toString))
      if (dryRun) return toDelete.map(_.toString)
      // second look after enumerating the deletion list: a commit that
      // claimed while we walked would lose its files to the sweep
      val late = inflightClaims()
      require(late.isEmpty,
        s"vacuum aborted before deleting anything: commit claim(s) " +
          s"${late.mkString(", ")} appeared during the file walk")
      toDelete.foreach { f =>
        if (Files.deleteIfExists(f)) removed += f.toString
      }
      // prune commit dirs emptied of parquet files (crash-orphaned dirs
      // from an unlanded commit clear here too). A dir belonging to a
      // commit claimed AFTER the checks above may exist here with its
      // parquet not yet written — pruning it would break that writer's
      // in-flight job mid-write — so claims are RE-READ at this instant
      // and any dir whose number is claimed or above the landed boundary
      // is left alone (its own commit/abandon path owns it).
      val protected_ = claimNumbers(table).toSet
      listDir(dataRoot).foreach { d: Path =>
        val name = d.getFileName.toString
        val num = if (name.startsWith("c") && name.drop(1).forall(_.isDigit))
          Some(name.drop(1).toInt) else None
        val owned = num.exists(k => k <= v && !protected_.contains(k))
        if (owned && Files.isDirectory(d) && !walkDir(d)
          .exists(f => Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))) {
          walkDir(d).reverse.foreach(Files.deleteIfExists(_): Unit)
        }
      }
    } else if (dryRun) return Nil
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
    listDir(versionsDir(table))
      .filter(_.getFileName.toString.contains(".staging"))
      .foreach(Files.deleteIfExists(_): Unit)
    removed.result()
  }
}
