package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** EXACTLY-ONCE epochs for the DIRECTORY layouts (z-bucket dirs, IVF
  * `cell=` dirs) — the streaming sinks' crash-replay guard where no
  * manifest exists to carry an epoch tag (the versioned sinks get this
  * from [[Versioned]]'s `#tag=epoch:` header; this module is the same
  * contract for plain Hive-dir layouts).
  *
  * Protocol, per epoch E (run inside the serialized foreachBatch, so the
  * appender is the single writer):
  *  1. E ≤ [[lastEpoch]] → SKIP (the epoch landed; Spark replayed it
  *     because the checkpoint's offset write raced a crash).
  *  2. [[purge]]: delete every layout file named `e<E>-*` — leftovers of
  *     a PARTIAL previous attempt at this epoch (crash mid-promote).
  *  3. Stage the batch into the sibling `<layout>_epochs/e<E>` dir
  *     (overwrite mode — idempotent on replay).
  *  4. [[promote]]: MOVE each staged file into its partition dir under
  *     the layout, renamed with the `e<E>-` prefix (per-file atomic
  *     rename; the prefix is what makes a partial attempt identifiable
  *     and purgeable).
  *  5. [[record]]: atomically advance the `_epoch_ledger` file to E.
  *
  * Crash anywhere → the replay of E re-runs 2-5 and the layout ends with
  * EXACTLY one copy of the epoch's rows: before the ledger advances, the
  * purge makes the attempt idempotent; after it advances, step 1 skips.
  * Compaction safety: the maintenance trigger runs AFTER record() in the
  * same serialized epoch, so it only ever rewrites files of LANDED
  * epochs — which purge (unlanded epochs only) never touches.
  *
  * The ledger file starts with `_` (ignored by Spark's file index, like
  * `_SUCCESS`); staging lives OUTSIDE the layout dir (the `_compact_tmp`
  * sibling convention), so readers never see half-staged files. */
object EpochLedger {

  private def ledgerPath(layout: String): Path =
    Paths.get(layout, "_epoch_ledger")

  private def stagingDir(layout: String, epoch: Long): Path =
    Paths.get(s"${layout.stripSuffix("/")}_epochs", s"e$epoch")

  /** File-name prefix identifying epoch E's files inside the layout. */
  def epochPrefix(epoch: Long): String = s"e$epoch-"

  /** Highest epoch the layout has durably landed; -1 when none. */
  def lastEpoch(layout: String): Long = {
    val p = ledgerPath(layout)
    if (!Files.exists(p)) -1L
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .trim.toLongOption.getOrElse(-1L)
  }

  /** Atomically advance the ledger to `epoch` (temp + ATOMIC_MOVE —
    * a reader never sees a torn value) and clear the epoch's staging
    * dir (best-effort; a leftover is overwritten by any later attempt). */
  def record(layout: String, epoch: Long): Unit = {
    Files.createDirectories(Paths.get(layout))
    val tmp = Paths.get(layout,
      s"_epoch_ledger.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, epoch.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ledgerPath(layout), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val st = stagingDir(layout, epoch)
    if (Files.exists(st)) {
      val s = Files.walk(st)
      try s.iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f): Unit)
      finally s.close()
    }
  }

  /** Delete every file of an UNLANDED epoch from the layout — the
    * partial leftovers a crash mid-[[promote]] strands. Returns the
    * deleted paths. Never called for epochs at or below the ledger
    * (those files are live data, possibly already compacted away). */
  def purge(layout: String, epoch: Long): Seq[String] = {
    require(epoch > lastEpoch(layout),
      s"purge of LANDED epoch $epoch (ledger at ${lastEpoch(layout)}) — " +
        "that would delete live data")
    val root = Paths.get(layout)
    if (!Files.exists(root)) return Nil
    val prefix = epochPrefix(epoch)
    val s = Files.walk(root)
    val victims =
      try s.iterator().asScala.toSeq
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.startsWith(prefix))
      finally s.close()
    victims.foreach(f => Files.deleteIfExists(f): Unit)
    victims.map(_.toString)
  }

  /** The sibling staging path for epoch E — callers write the batch here
    * (overwrite mode) between [[purge]] and [[promote]]. */
  def stagingPath(layout: String, epoch: Long): String =
    stagingDir(layout, epoch).toString

  /** Move every staged parquet file into the layout, preserving the
    * partition-directory structure and renaming each file with the
    * `e<E>-` prefix. Per-file rename(2) is atomic; a crash partway
    * leaves only prefix-identifiable files the next attempt purges.
    * Returns the number of files promoted. */
  def promote(layout: String, epoch: Long): Int = {
    val st = stagingDir(layout, epoch)
    require(Files.exists(st), s"no staged data for epoch $epoch at $st")
    val s = Files.walk(st)
    val staged =
      try s.iterator().asScala.toSeq
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    staged.foreach { f =>
      val rel = st.relativize(f)
      val target = Paths.get(layout).resolve(rel).getParent
        .resolve(epochPrefix(epoch) + f.getFileName.toString)
      Files.createDirectories(target.getParent)
      Files.move(f, target, StandardCopyOption.ATOMIC_MOVE): Unit
    }
    staged.size
  }
}
